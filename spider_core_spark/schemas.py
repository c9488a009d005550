"""Fixed schemas, declared once (SURVEY.md §1.3).

The reference fixes its schemas at compile time as Rust structs
(reference src/spider.rs:103-109, src/checkpoint.rs:71-97). We declare
explicit StructTypes so Arrow UDF return types, parquet DDL and the DuckDB
oracles agree byte-for-byte; nothing is ever schema-inferred.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Common-Crawl-style page table (BASELINE.json input_hint).
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("status", T.IntegerType(), True),
    ]
)

# PAGES + the optional 3xx redirect target (absolute URL; the Location
# header of a Common-Crawl capture). A pages table WITHOUT this column
# disables redirect handling entirely (CrawlConfig.follow_redirects docs).
PAGES_REDIR = T.StructType(
    list(PAGES.fields) + [T.StructField("location", T.StringType(), True)]
)

# Seed list (reference Spider::start_urls, src/spider.rs:112-121 —
# order matters, so a seq column carries list position).
SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

# Frontier: the distributed analog of the reference's SegQueue<Request>
# (src/scheduler.rs:68) — a table, not driver memory, so 10^10 rows shard.
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("fingerprint", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_hash", T.LongType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("not_before_epoch", T.IntegerType(), False),
        T.StructField("state", T.StringType(), False),  # pending|salvaged
        T.StructField("epoch_added", T.IntegerType(), False),
        # per-request user metadata (reference Request meta read by
        # middlewares; populated by Spider.start_requests seeds — discovered
        # links carry NULL). Visible to the request middleware chain and
        # carried through fetch to the response chain / retry re-queues.
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# URL-seen set — the distributed analog of the 3-tier Bloom+buffer+LRU
# (src/scheduler.rs:68-137): exact membership is this sharded table; the
# Bloom tier is rebuilt per shard and broadcast per epoch (operators/dedup).
SEEN = T.StructType(
    [
        T.StructField("fingerprint", T.StringType(), False),
        T.StructField("epoch_marked", T.IntegerType(), False),
        T.StructField("shard", T.IntegerType(), False),
    ]
)

# robots.txt politeness rules, cached as a table (north_star: "host-keyed
# politeness buckets with robots.txt caching").
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), True),
        # Allow: prefixes — longest-match precedence vs disallow (Google's
        # documented rule; ties go to allow). Optional: a robots frame
        # without the column behaves as allow=[] everywhere.
        T.StructField("allow", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay_ms", T.IntegerType(), True),
        T.StructField("max_per_epoch", T.IntegerType(), True),
    ]
)

# Scraped items from the flagship text spider (reference ScrapedItem,
# src/crawler/core.rs:24). epoch/partition_id = per-partition lineage.
ITEMS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("n_links", T.IntegerType(), True),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), True),
    ]
)

# Per-epoch / per-partition metrics — mirrors StatCollector's counter set
# (reference src/stats.rs:199-217).
METRICS = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("requests_enqueued", T.LongType(), True),
        T.StructField("requests_sent", T.LongType(), True),
        T.StructField("requests_succeeded", T.LongType(), True),
        T.StructField("requests_failed", T.LongType(), True),
        T.StructField("requests_retried", T.LongType(), True),
        T.StructField("requests_dropped", T.LongType(), True),
        T.StructField("responses_received", T.LongType(), True),
        T.StructField("responses_from_cache", T.LongType(), True),
        T.StructField("bytes_downloaded", T.LongType(), True),
        T.StructField("items_scraped", T.LongType(), True),
        T.StructField("items_processed", T.LongType(), True),
        T.StructField("items_dropped", T.LongType(), True),
        # real per-URL timing stats (reference src/stats.rs:378-463): fetch =
        # measured upstream feed gap per Arrow batch, parse = UDF compute
        # time per batch, both divided across the batch's rows (see
        # operators/parse.py); min/max/avg aggregated per epoch
        T.StructField("fetch_ms_avg", T.DoubleType(), True),
        T.StructField("fetch_ms_min", T.DoubleType(), True),
        T.StructField("fetch_ms_max", T.DoubleType(), True),
        T.StructField("parse_ms_avg", T.DoubleType(), True),
        T.StructField("parse_ms_min", T.DoubleType(), True),
        T.StructField("parse_ms_max", T.DoubleType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)

# Per-epoch HTTP status histogram (reference response_status_counts,
# src/stats.rs:209,349-351) — feeds the A2 report section.
STATUS_COUNTS = T.StructType(
    [
        T.StructField("status", T.IntegerType(), True),
        T.StructField("n", T.LongType(), False),
        T.StructField("epoch", T.IntegerType(), False),
    ]
)

# Parse UDF output (reference ParseOutput<Item>, split by into_parts() at
# src/crawler/response_parser.rs:277): one fetched row → extracted fields
# plus ordered out-links.
PARSED = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        # measured inside the UDF (operators/parse.py): per-row share of the
        # batch's upstream feed gap ("fetch") and UDF compute time ("parse")
        T.StructField("fetch_ms", T.DoubleType(), True),
        T.StructField("parse_ms", T.DoubleType(), True),
    ]
)
