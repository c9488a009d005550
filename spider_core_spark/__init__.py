"""spider_core_spark — a PySpark-native distributed URL-frontier + fetch
scheduler with the capabilities of spider-lib/spider-core (Rust reference at
/root/reference, surveyed in SURVEY.md).

Not a port: the crawl is modeled as an epoch-synchronous dataflow over
DataFrames (frontier table, seen-set table, pages table) instead of the
reference's single-process async channel topology (reference
src/crawler/core.rs:111-368). All row-level logic is vectorized
(pyspark.sql.functions or Arrow pandas UDFs); no per-row Python.
"""

from spider_core_spark.errors import SpiderError
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.plans.engine import CrawlEngine
from spider_core_spark.api.spider import Spider

__all__ = ["CrawlConfig", "CrawlEngine", "Spider", "SpiderError"]
__version__ = "0.1.0"
