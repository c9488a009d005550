"""Engine errors (reference SpiderError, spider-util — raised by the seed
URL parse path at src/spider.rs:118-120: `Url::parse(url)?` maps a bad
seed to an error instead of silently dropping it)."""

from __future__ import annotations


class SpiderError(Exception):
    """Invalid input to the crawl engine (bad seed URL, bad config)."""
