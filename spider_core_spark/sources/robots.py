"""robots.txt ingestion: raw robots bodies → the ROBOTS rules table.

The reference delegates robots/politeness to spider-middleware
(reference src/builder.rs:25-33 doc example); the north-star architecture
calls for "host-keyed politeness buckets with robots.txt caching". This
module builds that cache FROM the crawl corpus itself: the pages table
rows whose url path is /robots.txt are parsed into (host, disallow,
crawl_delay_ms, max_per_epoch) rules consumed by select_wave.

Fully JVM-side (split → explode → filter → groupBy): parsing ~10^8
robots bodies is a narrow shuffle-once aggregation, no Python in the
loop. Semantics (deliberately minimal, documented):

- only the `User-agent: *` group is honored (directives after a
  `User-agent: *` line up to the next User-agent line);
- `Disallow:` / `Allow:` values collected as prefix rules ('' is
  skipped); enforcement is longest-match precedence with ties to allow
  (operators/frontier.py); `Crawl-delay:` seconds → crawl_delay_ms;
- `max-per-epoch:` is a non-standard extension this engine reads from
  fixtures (same key select_wave uses); absent → NULL (engine default);
- directive keys are case-insensitive; inline `#` comments stripped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spider_core_spark.functions import url as urlfn


def robots_pages(pages: DataFrame) -> DataFrame:
    """Rows of the corpus that are robots.txt documents."""
    return pages.filter(F.col("url").rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+/robots\.txt$"))


def parse_robots(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """robots.txt bodies → ROBOTS-schema rules table (one row per host).

    `text_col` holds the robots body (the CC-style pages table carries
    extracted text; pass 'html' cast to string for raw fixtures)."""
    lines = (
        robots_pages(pages)
        .select(
            urlfn.host_col(F.col("url")).alias("host"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
        )
        # strip inline comments + whitespace, lowercase the key; colon
        # required (the twin's `':' not in line` skip) — a bare keyword
        # line must not parse as a directive with itself as value
        .withColumn("line", F.trim(F.substring_index("line", "#", 1)))
        .filter(F.col("line").contains(":"))
        .withColumn("key", F.lower(F.trim(F.substring_index("line", ":", 1))))
        .withColumn(
            "value",
            F.trim(F.regexp_replace("line", r"^[^:]*:", "")),
        )
    )
    # group membership: a directive belongs to the most recent User-agent
    # line above it; we honor the '*' group (running max of the last
    # user-agent line_no, then check that line's value)
    w = (
        Window.partitionBy("host")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = (
        lines.withColumn(
            "ua_line",
            F.last(
                F.when(F.col("key") == "user-agent", F.col("line_no")),
                ignorenulls=True,
            ).over(w),
        )
        .withColumn(
            "ua_value",
            F.last(
                F.when(F.col("key") == "user-agent", F.col("value")),
                ignorenulls=True,
            ).over(w),
        )
        .filter(F.col("ua_value") == "*")
    )
    rules = tagged.groupBy("host").agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    (F.col("key") == "disallow") & (F.col("value") != ""),
                    F.col("value"),
                )
            )
        ).alias("disallow"),
        F.sort_array(
            F.collect_list(
                F.when(
                    (F.col("key") == "allow") & (F.col("value") != ""),
                    F.col("value"),
                )
            )
        ).alias("allow"),
        (
            F.max(
                F.when(
                    F.col("key") == "crawl-delay", F.col("value").cast("double")
                )
            )
            * 1000
        )
        .cast("int")
        .alias("crawl_delay_ms"),
        F.max(
            F.when(F.col("key") == "max-per-epoch", F.col("value").cast("int"))
        ).alias("max_per_epoch"),
    )
    return rules.select(
        "host", "disallow", "allow", "crawl_delay_ms", "max_per_epoch"
    )


def sitemap_urls(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """robots.txt ``Sitemap:`` directives → (host, sm_seq, sitemap_url).

    Per the robots/sitemaps.org convention the Sitemap field is
    GROUP-INDEPENDENT — honored wherever it appears, regardless of the
    surrounding ``User-agent`` group — so unlike ``parse_robots`` no
    group tagging happens: directives emit in document order per host.
    The per-host ordering window is bounded by a single robots body's
    line count (the 500 KiB robots convention caps it), never
    corpus-sized; extraction itself is a narrow per-body pass."""
    # one body per host BEFORE exploding (r5 ADVICE #2): when a host's
    # robots.txt was fetched under two URLs (http + https — common in
    # CC-style corpora), both bodies used to share one window partition
    # with tied line_no values, making sm_seq nondeterministic; keep the
    # min-url body, matching the one-body-per-host pure-Python twin
    one_body = (
        robots_pages(pages)
        .select(
            urlfn.host_col(F.col("url")).alias("host"),
            F.struct(F.col("url"), F.col(text_col).alias("_body")).alias("_b"),
        )
        .groupBy("host")
        .agg(F.min("_b").alias("_b"))
        .select("host", F.col("_b._body").alias("_body"))
    )
    lines = (
        one_body.select(
            "host",
            F.posexplode(F.split(F.col("_body"), "\n")).alias(
                "line_no", "line"
            ),
        )
        .withColumn("line", F.trim(F.substring_index("line", "#", 1)))
        # colon required (the twin's `':' not in line` skip): a bare
        # keyword line must not parse as a directive with itself as value
        .filter(F.col("line").contains(":"))
        .withColumn("key", F.lower(F.trim(F.substring_index("line", ":", 1))))
        .withColumn(
            "value", F.trim(F.regexp_replace("line", r"^[^:]*:", ""))
        )
        .filter((F.col("key") == "sitemap") & (F.col("value") != ""))
    )
    w = Window.partitionBy("host").orderBy("line_no")
    return lines.select(
        "host",
        (F.row_number().over(w) - 1).cast("long").alias("sm_seq"),
        F.col("value").alias("sitemap_url"),
    )


def sitemap_urls_py(host_bodies: dict[str, str]) -> list[dict]:
    """Pure-Python twin of sitemap_urls (oracle for the parity test)."""
    out = []
    for host, body in host_bodies.items():
        seq = 0
        for raw in body.split("\n"):
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            if key.strip().lower() == "sitemap" and value.strip():
                out.append(
                    {
                        "host": host,
                        "sm_seq": seq,
                        "sitemap_url": value.strip(),
                    }
                )
                seq += 1
    return out


def parse_robots_py(host_bodies: dict[str, str]) -> list[dict]:
    """Pure-Python twin of parse_robots (oracle for the parity test)."""
    out = []
    for host, body in host_bodies.items():
        disallow, allow, delay, mpe = [], [], None, None
        ua = None
        for raw in body.split("\n"):
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            key, value = key.strip().lower(), value.strip()
            if key == "user-agent":
                ua = value
                continue
            if ua != "*":
                continue
            if key == "disallow" and value:
                disallow.append(value)
            elif key == "allow" and value:
                allow.append(value)
            elif key == "crawl-delay":
                d = int(float(value) * 1000)
                delay = d if delay is None else max(delay, d)
            elif key == "max-per-epoch":
                v = int(value)
                mpe = v if mpe is None else max(mpe, v)
        out.append(
            {
                "host": host,
                "disallow": sorted(disallow),
                "allow": sorted(allow),
                "crawl_delay_ms": delay,
                "max_per_epoch": mpe,
            }
        )
    return out
