"""Deterministic synthetic Common-Crawl-style site generator (FIXTURES.md §1).

Produces the `pages` table (url, warc_ts, html, text, lang, status), a seed
list and a robots table. Every page is generated from an independent
``random.Random(f"{seed}:{page_id}")`` stream, so generation is
embarrassingly parallel (mapInPandas over ``spark.range``) and the output is
byte-identical regardless of partitioning or parallelism level — required
for the local[8]-vs-local[32] scaling bench to run the *same* input.

Graph properties (exercising the engine paths): power-law out-degree ≤ 20,
one hot host receiving ~30% of cross-site links (skew/salting path),
~5% dangling links (fetch-failure path), duplicate + self + fragment-variant
links (dedup/normalization paths), /private pages (robots path), and a
disconnected component (seen-set negative cases).

The `text` column is produced by the SAME extractor the parse UDF uses
(functions/textextract.py), so byte-identical text parity is checkable.
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Iterable, Iterator

import pandas as pd

from spider_core_spark import schemas
from spider_core_spark.functions.textextract import extract

_WORDS = (
    "the quick brown fox jumps over lazy dog spark frontier crawl fetch "
    "parse queue host link page index data table epoch shard bloom filter "
    "robots budget depth priority retry batch arrow vector column row "
    "merge join scan text title anchor graph node edge seed wave commit"
).split()
_LANGS = ("en", "de", "fr")


def page_url(site: int, idx: int) -> str:
    return f"https://site{site}.test/p/{idx}"


def _component(site: int, n_sites: int) -> int:
    # last 2 sites form a disconnected component (never linked from comp 0)
    return 1 if n_sites > 3 and site >= n_sites - 2 else 0


def gen_page(
    page_id: int, n_pages: int, n_sites: int, seed: int, density: int = 1,
    redirect_frac: float = 0.0,
) -> dict:
    """Generate one page row, fully determined by (seed, page_id).

    ``density`` scales paragraph count/length (and thus html size and
    extraction cost) without touching the link graph — used by the bench
    to make parse compute-bound while tests keep the default.

    ``redirect_frac``: fraction of pages emitted as 301 redirects (status
    301, absolute ``location``, stub html, empty text). The draw happens
    ONLY when the fraction is > 0, so the rng stream — and therefore every
    existing fixture — is byte-identical at the default. Targets are
    ordinary page URLs within the component, so chains (redirect→redirect)
    and cycles (a target may itself redirect anywhere, including back)
    occur naturally."""
    rng = random.Random(f"{seed}:{page_id}")
    per_site = max(1, n_pages // n_sites)
    site = min(page_id // per_site, n_sites - 1)
    idx = page_id - site * per_site
    comp = _component(site, n_sites)
    comp_sites = (
        [s for s in range(n_sites) if _component(s, n_sites) == comp] or [site]
    )

    if redirect_frac > 0 and rng.random() < redirect_frac:
        if rng.random() < 0.85:
            tgt = page_url(site, rng.randrange(per_site))
        else:
            tgt = page_url(rng.choice(comp_sites), rng.randrange(per_site))
        html = (
            f'<html><head><title>Moved</title></head><body>'
            f'<p>moved to {tgt}</p></body></html>'
        ).encode("utf-8")
        return {
            "url": page_url(site, idx),
            "warc_ts": _dt.datetime(2024, 1, 1) + _dt.timedelta(seconds=page_id),
            "html": html,
            "text": "",
            "lang": None,
            "status": 301,
            "location": tgt,
        }

    is_private = rng.random() < 0.04
    url = (
        f"https://site{site}.test/private/{idx}"
        if is_private
        else page_url(site, idx)
    )

    # power-law-ish out-degree capped at 20; ~10% dead-end pages, others
    # link out at least twice so BFS waves actually expand from any seed
    out_deg = 0 if rng.random() < 0.10 else 2 + min(int(rng.paretovariate(1.3)) - 1, 18)
    links: list[str] = []
    for _ in range(out_deg):
        r = rng.random()
        if r < 0.05:  # dangling
            tgt = f"https://site{rng.choice(comp_sites)}.test/missing/{rng.randrange(10**6)}"
        elif r < 0.08:  # robots-disallowed target
            s = rng.choice(comp_sites)
            tgt = f"https://site{s}.test/private/{rng.randrange(per_site)}"
        elif r < 0.13 and links:  # duplicate of an earlier link
            tgt = links[rng.randrange(len(links))]
        elif r < 0.16:  # self link
            tgt = url
        elif comp == 0 and r < 0.16 + 0.30:  # hot-host skew: ~30% → site 0
            tgt = page_url(0, rng.randrange(per_site))
        elif r < 0.76:  # same-site
            tgt = page_url(site, rng.randrange(per_site))
        else:  # cross-site within component
            tgt = page_url(rng.choice(comp_sites), rng.randrange(per_site))
        if rng.random() < 0.05:  # fragment variant (normalization path)
            tgt = f"{tgt}#sec{rng.randrange(5)}"
        links.append(tgt)

    n_paras = (1 + rng.randrange(3)) * density
    paras = [
        " ".join(rng.choice(_WORDS) for _ in range(8 + rng.randrange(40)))
        for _ in range(n_paras)
    ]
    title = f"Site {site} Page {idx}"
    body = [f"<html><head><title>{title}</title></head><body>", f"<h1>{title}</h1>"]
    body += [f"<p>{p}</p>" for p in paras]
    if links:
        body.append("<ul>")
        body += [f'<li><a href="{h}">link {j}</a></li>' for j, h in enumerate(links)]
        body.append("</ul>")
    body.append("</body></html>")
    html = "\n".join(body).encode("utf-8")

    _, text, _ = extract(html)
    status = 200
    r = rng.random()
    if r < 0.01:
        status = 404
    elif r < 0.02:
        status = 500
    row = {
        "url": url,
        "warc_ts": _dt.datetime(2024, 1, 1) + _dt.timedelta(seconds=page_id),
        "html": html,
        "text": text,
        "lang": rng.choice(_LANGS),
        "status": status,
    }
    if redirect_frac > 0:  # uniform keys across the redirect-enabled table
        row["location"] = None
    return row


def gen_pages_rows(
    page_ids: Iterable[int], n_pages: int, n_sites: int, seed: int,
    density: int = 1, redirect_frac: float = 0.0,
) -> list[dict]:
    return [
        gen_page(pid, n_pages, n_sites, seed, density, redirect_frac)
        for pid in page_ids
    ]


def gen_pages_df(spark, n_pages: int, n_sites: int, seed: int = 42,
                 density: int = 1, redirect_frac: float = 0.0):
    """Distributed generation: mapInPandas over spark.range — scales to any
    page count without driver memory; deterministic per page_id.
    ``redirect_frac > 0`` adds the optional `location` column (and 301
    rows) — see gen_page; the default output is byte-identical to before
    the redirect feature existed."""
    cols = ["url", "warc_ts", "html", "text", "lang", "status"]
    schema = schemas.PAGES
    if redirect_frac > 0:
        cols = cols + ["location"]
        schema = schemas.PAGES_REDIR

    def gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = gen_pages_rows(
                b["id"].tolist(), n_pages, n_sites, seed, density,
                redirect_frac,
            )
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.range(0, n_pages)
        .repartition(max(spark.sparkContext.defaultParallelism, 4))
        .mapInPandas(gen_batches, schema=schema)
    )


def gen_seeds(n_sites: int, n_seeds: int = 3) -> list[dict]:
    comp0 = [s for s in range(n_sites) if _component(s, n_sites) == 0]
    return [
        {"url": page_url(s, 0), "seq": i}
        for i, s in enumerate(comp0[: max(1, n_seeds)])
    ]


def gen_robots(n_sites: int, seed: int = 42) -> list[dict]:
    rng = random.Random(f"{seed}:robots")
    rows = []
    for s in range(n_sites):
        rows.append(
            {
                "host": f"site{s}.test",
                "disallow": ["/private"],
                # longest-match carve-out on some hosts: /private/pub is
                # crawlable even though /private is not
                "allow": ["/private/pub"] if s % 3 == 0 else [],
                "crawl_delay_ms": 100 * (1 + rng.randrange(5)),
                # tight budget on a couple of hosts → politeness deferral path
                "max_per_epoch": 5 if s % 5 == 1 else 100_000,
            }
        )
    return rows


def write_fixture(
    spark, outdir: str, n_pages: int, n_sites: int, seed: int = 42,
    density: int = 1, redirect_frac: float = 0.0,
) -> None:
    gen_pages_df(spark, n_pages, n_sites, seed, density, redirect_frac).write.mode(
        "overwrite"
    ).parquet(f"{outdir}/pages.parquet")
    spark.createDataFrame(gen_seeds(n_sites), schemas.SEEDS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{outdir}/seeds.parquet")
    spark.createDataFrame(gen_robots(n_sites, seed), schemas.ROBOTS).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{outdir}/robots.parquet")
