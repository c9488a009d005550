"""SURVEY.md §2 operators demonstrated over the driver's TPC-H-ish test
tables (FIXTURES.md §9 mapping), each with an exactly-matching DuckDB
oracle — this is the driver's CORRECTNESS gate surface.

The crawl engine itself is verified against the pure-Python simulator in
tests/ (crawl order, seen set, text bytes); these demos re-express each
operator's *shape* (window top-k, anti-join dedup, union-distinct,
histogram, EMA window, per-host feedback aggregate …) on relational data
so DuckDB can replay them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # plain read on purpose: these demos are aggregate/join shaped, so
    # their first shuffle already spreads the work — a measured A/B of
    # scan.read_parquet_spread here LOST ~12 s across the 39 demos
    # (repartition cost with no serialized narrow stage to unblock);
    # the fan-out stays on the CPU-bound textops/document readers and is
    # opted into per query where a sha-heavy narrow stage dominates (u4)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- F0/P1/S1-S4: seed injection + URL normalize/fingerprint/host ---------
def f0_seed_injection(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    url = F.concat(
        F.lit("https://"),
        F.lower(F.regexp_replace("n_name", " ", "-")),
        F.lit(".test/p/"),
        F.col("n_nationkey").cast("string"),
        F.lit("#top"),
    )
    norm = F.substring_index(url, "#", 1)
    return n.select(
        F.col("n_nationkey").alias("seq"),
        norm.alias("url"),
        F.sha2(norm, 256).alias("fingerprint"),
        F.regexp_extract(norm, _HOST_RE, 1).alias("host"),
    )


F0_SQL = f"""
SELECT n_nationkey AS seq,
       split_part('https://' || lower(replace(n_name, ' ', '-')) || '.test/p/'
                  || n_nationkey || '#top', '#', 1) AS url,
       sha256(split_part('https://' || lower(replace(n_name, ' ', '-'))
                         || '.test/p/' || n_nationkey || '#top', '#', 1)) AS fingerprint,
       regexp_extract(split_part('https://' || lower(replace(n_name, ' ', '-'))
                      || '.test/p/' || n_nationkey || '#top', '#', 1),
                      '{_HOST_RE}', 1) AS host
FROM nation
"""


# --- F1: globally ordered wave (FIFO analog) -------------------------------
def f1_wave_order(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("wave_rank", F.row_number().over(w) - 1)
        .filter(F.col("wave_rank") < 100)
        .select("wave_rank", "o_orderkey", "o_orderdate")
    )


F1_SQL = """
SELECT row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1 AS wave_rank,
       o_orderkey, o_orderdate
FROM orders QUALIFY wave_rank < 100
"""


# --- F2: per-host politeness top-k -----------------------------------------
def f2_politeness_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= 3)
        .select("o_custkey", "host_rank", "o_orderkey", "o_orderdate")
    )


F2_SQL = """
SELECT o_custkey,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS host_rank,
       o_orderkey, o_orderdate
FROM orders QUALIFY host_rank <= 3
"""


# --- F3: retry gate (not_before_epoch eligibility filter) -------------------
def f3_retry_gate(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("event_type") == "error")
        )
        .select("event_id", "user_id", "ts")
    )


F3_SQL = """
SELECT event_id, user_id, ts FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND event_type = 'error'
"""


# --- J1: fetch join (request × web), inner + left-with-miss-counts ---------
def j1_fetch_join(spark, sf_dir):
    # money math in integer cents: the sum is order-independent and exact,
    # so Spark's and DuckDB's different accumulation orders cannot produce
    # off-by-one-cent rounding flips
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            (F.sum(cents) / 10000.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


J1_SQL = """
SELECT o_orderkey, o_orderstatus,
       sum(round(l_extendedprice * 100)::BIGINT *
           (100 - round(l_discount * 100)::BIGINT)) / 10000.0 AS revenue,
       count(*) AS n_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1, 2
"""


def j1_left_misses(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


J1_LEFT_SQL = """
SELECT c_custkey, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY 1
"""


# --- J2: anti-join dedup (URL-seen) -----------------------------------------
# the "seen set" is orders filtered to URGENT priority so the expected
# output is NON-empty at sf0.01 (~200 rows) — an anti-join against all
# orders matches every customer and verifies nothing (VERDICT r3 #2)
def j2_anti_dedup(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


J2_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT'
                          AND o_custkey IS NOT NULL)
"""


# --- U1: seen-set union (union-distinct) ------------------------------------
def u1_union_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    return a.unionByName(b).distinct()


U1_SQL = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_custkey FROM orders WHERE o_totalprice > 200000
"""


# --- P2: dedup predicate (first-seen-after-cutoff anti join) ----------------
# cutoff on day 2: every user active by mid-month makes later cutoffs
# vacuous (0 expected rows at sf0.01); day 2 leaves ~16 genuinely new
# users, so the anti-join dedup path is actually exercised
P2_CUTOFF = "2024-01-02 00:00:00"


def p2_first_seen(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    cutoff = F.lit(P2_CUTOFF).cast("timestamp")
    before = e.filter(F.col("ts") < cutoff).select("user_id").distinct()
    after = e.filter(F.col("ts") >= cutoff).select("user_id").distinct()
    return after.join(before, "user_id", "left_anti")


P2_SQL = f"""
SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '{P2_CUTOFF}'
AND user_id NOT IN (SELECT user_id FROM events WHERE ts < TIMESTAMP '{P2_CUTOFF}')
"""


# --- P4: middleware Drop on requests (DropUrlPattern shape) ------------------
# reference request_handler.rs:215-222: rows matching the drop predicate
# are filtered before fetch; survivors continue
def p4_request_drop(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.filter(~F.col("props").like('%"k": 1%')).select(
        "event_id", "event_type", "props"
    )


P4_SQL = """
SELECT event_id, event_type, props FROM events
WHERE props NOT LIKE '%"k": 1%'
"""


# --- P5: middleware Drop on responses (MaxBodySize shape) --------------------
# reference request_handler.rs:325-332: oversized bodies dropped post-fetch
def p5_response_drop(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_retailprice") <= 1500.0).select(
        "p_partkey", "p_retailprice"
    )


P5_SQL = """
SELECT p_partkey, p_retailprice FROM part WHERE p_retailprice <= 1500.0
"""


# --- U2: queue ∪ salvage at snapshot ------------------------------------------
# reference checkpoint.rs:74-78 / scheduler.rs:102: restore counts both
# pending tiers; the union keeps the state tag
def u2_queue_salvage(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    pending = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", F.lit("pending").alias("state")
    )
    salvaged = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.lit("salvaged").alias("state")
    )
    return pending.unionByName(salvaged)


U2_SQL = """
SELECT o_orderkey, 'pending' AS state FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_orderkey, 'salvaged' AS state FROM orders WHERE o_orderstatus = 'F'
"""


# --- A4: parse-time min/max/avg (src/stats.rs:429-463 shape) ------------------
def a4_parse_timing(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return e.groupBy("event_type").agg(
        (F.min(cents) / 100.0).alias("min_ms"),
        (F.max(cents) / 100.0).alias("max_ms"),
        (F.round(F.sum(cents) * 100.0 / F.count("*"), 0) / 10000.0).alias(
            "avg_ms"
        ),
        F.count("*").alias("n"),
    )


A4_SQL = """
SELECT event_type,
       min(round(value * 100)::BIGINT) / 100.0 AS min_ms,
       max(round(value * 100)::BIGINT) / 100.0 AS max_ms,
       round(sum(round(value * 100)::BIGINT) * 100.0 / count(*), 0) / 10000.0
         AS avg_ms,
       count(*) AS n
FROM events GROUP BY 1
"""


# --- S2: host extraction with 'unknown' default -------------------------------
# reference request_handler.rs:129 url.host_str() default; every 10th URL
# is scheme-less → unparseable → 'unknown'
def s2_host_extract(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    url = F.when(
        F.col("c_custkey") % 10 == 0, F.col("c_name")
    ).otherwise(
        F.concat(
            F.lit("https://c"),
            F.col("c_custkey").cast("string"),
            F.lit(".Example.COM/acct"),
        )
    )
    h = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    return c.select(
        "c_custkey",
        F.when(h == "", F.lit("unknown")).otherwise(h).alias("host"),
    )


S2_SQL = f"""
SELECT c_custkey,
       CASE WHEN lower(regexp_extract(u, '{_HOST_RE}', 1)) = ''
            THEN 'unknown'
            ELSE lower(regexp_extract(u, '{_HOST_RE}', 1)) END AS host
FROM (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 0 THEN c_name
              ELSE 'https://c' || c_custkey || '.Example.COM/acct' END AS u
  FROM customer
)
"""


# --- S5: byte-size formatting (src/stats.rs:174-188) --------------------------
# KB/MB/GB breakpoints with {:.2}; the value is pre-rounded to 2 dp in BOTH
# engines before formatting (dyadic b/1024 quotients would otherwise hit
# exact .xx5 midpoints where Java's HALF_UP and C's half-even disagree)
def s5_byte_format(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    b = (
        F.round(F.col("l_extendedprice") * F.col("l_quantity")).cast("long")
        * 1024
    )
    kb, mb, gb = 1024, 1024**2, 1024**3
    fmt = (
        F.when(b >= gb, F.format_string("%.2f GB", F.round(b / gb, 2)))
        .when(b >= mb, F.format_string("%.2f MB", F.round(b / mb, 2)))
        .when(b >= kb, F.format_string("%.2f KB", F.round(b / kb, 2)))
        .otherwise(F.format_string("%d B", b))
    )
    return li.select(
        "l_orderkey", "l_linenumber", b.alias("bytes"), fmt.alias("formatted")
    )


S5_SQL = """
SELECT l_orderkey, l_linenumber, b AS bytes,
       CASE WHEN b >= 1073741824 THEN printf('%.2f GB', round(b / 1073741824.0, 2))
            WHEN b >= 1048576    THEN printf('%.2f MB', round(b / 1048576.0, 2))
            WHEN b >= 1024       THEN printf('%.2f KB', round(b / 1024.0, 2))
            ELSE printf('%d B', b) END AS formatted
FROM (
  SELECT l_orderkey, l_linenumber,
         round(l_extendedprice * l_quantity)::BIGINT * 1024 AS b
  FROM lineitem
)
"""


# --- S8: full URL canonicalization (opt-in normalizer, driver-checked) -------
# the Spark side RUNS canonicalize_url_col on synthesized messy URLs; the
# oracle states the expected canonical form analytically
def s8_url_canonicalize(spark, sf_dir):
    from spider_core_spark.functions.url import canonicalize_url_col

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("string")
    raw = (
        F.when(
            F.col("c_custkey") % 4 == 0,
            F.concat(F.lit("HTTP://WWW.Site"), k, F.lit(".test:80/a/b#frag")),
        )
        .when(
            F.col("c_custkey") % 4 == 1,
            F.concat(F.lit("https://Site"), k, F.lit(".test:443/")),
        )
        .when(
            F.col("c_custkey") % 4 == 2,
            F.concat(F.lit("https://site"), k, F.lit(".test:8443/x?q=1")),
        )
        .otherwise(F.concat(F.lit("http://site"), k, F.lit(".test/path/")))
    )
    return c.select(
        "c_custkey",
        raw.alias("raw_url"),
        canonicalize_url_col(raw).alias("canon_url"),
    )


S8_SQL = """
SELECT c_custkey,
       CASE c_custkey % 4
         WHEN 0 THEN 'HTTP://WWW.Site' || c_custkey || '.test:80/a/b#frag'
         WHEN 1 THEN 'https://Site' || c_custkey || '.test:443/'
         WHEN 2 THEN 'https://site' || c_custkey || '.test:8443/x?q=1'
         ELSE 'http://site' || c_custkey || '.test/path/' END AS raw_url,
       CASE c_custkey % 4
         WHEN 0 THEN 'http://www.site' || c_custkey || '.test/a/b'
         WHEN 1 THEN 'https://site' || c_custkey || '.test'
         WHEN 2 THEN 'https://site' || c_custkey || '.test:8443/x?q=1'
         ELSE 'http://site' || c_custkey || '.test/path/' END AS canon_url
FROM customer
"""


# --- S7: robots.txt parsing (sources/robots.py through the driver gate) ------
# the Spark side RUNS the real parser on bodies generated from nation
# rows; the oracle derives the expected rules analytically from the same
# keys — an independent derivation, not a second parser implementation
def s7_robots_parse(spark, sf_dir):
    from spider_core_spark.sources.robots import parse_robots

    n = _t(spark, sf_dir, "nation")
    key = F.col("n_nationkey")
    host = F.concat(
        F.lower(F.regexp_replace("n_name", " ", "-")), F.lit(".test")
    )
    body = F.concat(
        F.lit("User-agent: googlebot\nDisallow: /secret\n"),
        F.lit("User-agent: *\n"),
        F.lit("Disallow: /p/"), key.cast("string"), F.lit("\n"),
        F.lit("Allow: /p/"), key.cast("string"), F.lit("/pub   # carve-out\n"),
        F.lit("Disallow: /tmp/   # scratch\n"),
        F.when(
            key % 2 == 0,
            F.concat(
                F.lit("Crawl-delay: "),
                (key % 5 + 1).cast("string"),
                F.lit("\n"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            key % 3 == 0,
            F.concat(
                F.lit("max-per-epoch: "), (key + 1).cast("string"), F.lit("\n")
            ),
        ).otherwise(F.lit("")),
    )
    robots_docs = n.select(
        F.concat(F.lit("https://"), host, F.lit("/robots.txt")).alias("url"),
        body.alias("text"),
    )
    rules = parse_robots(robots_docs)
    # hosts without a directive get -1 sentinels (NULL-mixed columns break
    # order-insensitive canonicalization)
    return rules.select(
        "host",
        F.concat_ws("|", "disallow").alias("disallow_str"),
        F.concat_ws("|", "allow").alias("allow_str"),
        F.coalesce("crawl_delay_ms", F.lit(-1)).cast("int").alias(
            "crawl_delay_ms"
        ),
        F.coalesce("max_per_epoch", F.lit(-1)).cast("int").alias(
            "max_per_epoch"
        ),
    )


S7_SQL = """
SELECT lower(replace(n_name, ' ', '-')) || '.test' AS host,
       '/p/' || n_nationkey || '|/tmp/' AS disallow_str,
       '/p/' || n_nationkey || '/pub' AS allow_str,
       (CASE WHEN n_nationkey % 2 = 0
             THEN (n_nationkey % 5 + 1) * 1000 ELSE -1 END)::INT
         AS crawl_delay_ms,
       (CASE WHEN n_nationkey % 3 = 0
             THEN n_nationkey + 1 ELSE -1 END)::INT AS max_per_epoch
FROM nation
"""


# --- A1: counter aggregates --------------------------------------------------
def a1_counters(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    c = lambda col: F.round(F.col(col) * 100).cast("long")  # noqa: E731
    return li.agg(
        F.count("*").alias("n_rows"),
        (F.sum(c("l_quantity")) / 100.0).alias("sum_qty"),
        (F.sum(c("l_extendedprice")) / 100.0).alias("sum_price"),
        (F.round(F.sum(c("l_discount")) * 10000.0 / F.count("*"), 0) / 1000000.0)
        .alias("avg_discount"),
    )


A1_SQL = """
SELECT count(*) AS n_rows,
       sum(round(l_quantity * 100)::BIGINT) / 100.0 AS sum_qty,
       sum(round(l_extendedprice * 100)::BIGINT) / 100.0 AS sum_price,
       round(sum(round(l_discount * 100)::BIGINT) * 10000.0 / count(*), 0)
         / 1000000.0 AS avg_discount
FROM lineitem
"""


# --- A2: status-code histogram ----------------------------------------------
def a2_status_histogram(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(F.count("*").alias("n"))


A2_SQL = "SELECT event_type, count(*) AS n FROM events GROUP BY 1"


# --- A3: min/max/avg timing --------------------------------------------------
def a3_timing_stats(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return li.groupBy(F.date_trunc("month", "l_shipdate").alias("month")).agg(
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        (F.round(F.sum(cents) * 100.0 / F.count("*"), 0) / 10000.0).alias(
            "avg_price"
        ),
        F.count("*").alias("n"),
    )


A3_SQL = """
SELECT date_trunc('month', l_shipdate)::TIMESTAMP AS month,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price,
       round(sum(round(l_extendedprice * 100)::BIGINT) * 100.0 / count(*), 0)
         / 10000.0 AS avg_price,
       count(*) AS n
FROM lineitem GROUP BY 1
"""


# --- A6: EMA/windowed recent rate --------------------------------------------
def a6_sliding_rate(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(-9, 0)
    cents = F.round(F.col("value") * 100).cast("long")
    return e.select(
        "event_id",
        (
            F.round(F.sum(cents).over(w) * 100.0 / F.count("*").over(w), 0)
            / 10000.0
        ).alias("sliding_avg"),
    )


A6_SQL = """
SELECT event_id,
       round(sum(round(value * 100)::BIGINT)
               OVER (ORDER BY event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
             * 100.0
             / count(*) OVER (ORDER BY event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
             0) / 10000.0 AS sliding_avg
FROM events
"""


# --- A6b: true EMA recent rate (reference src/stats.rs:54-95, α=0.2) ---------
# ema_0 = x_0; ema_t = α·x_t + (1-α)·ema_{t-1}. With α = 1/5 the closed form
# is exactly E_t / 5^t where E_t = 4^t·x_0 + Σ_{k=1..t} 4^(t-k)·5^(k-1)·x_k —
# an INTEGER when x is in integer cents. Both engines accumulate E_t as
# exact int64 (series capped at 15 days so 5^14·Σx stays < 2^63 and every
# power is < 2^53, i.e. exact in double), then do the identical double
# division, so the value hash matches bit-for-bit.
EMA_DAYS_CUTOFF = "2024-01-16 00:00:00"


def a6_ema(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit(EMA_DAYS_CUTOFF).cast("timestamp")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(cents).alias("x")
    )
    # ≤15 rows: a single-partition window is the right plan here
    daily = daily.withColumn(
        "t", (F.row_number().over(Window.orderBy("day")) - 1).cast("int")
    )
    l = daily.select("t", "day")
    r = daily.select(F.col("t").alias("k"), "x")
    weight = F.when(F.col("k") == 0, F.pow(F.lit(4.0), F.col("t"))).otherwise(
        F.pow(F.lit(4.0), F.col("t") - F.col("k"))
        * F.pow(F.lit(5.0), F.col("k") - 1)
    )
    pairs = l.join(r, F.col("k") <= F.col("t"))
    out = pairs.groupBy("t", "day").agg(
        F.sum(weight.cast("long") * F.col("x")).alias("E")
    )
    ema = F.round(
        F.col("E") / F.pow(F.lit(5.0), F.col("t")) / F.lit(100.0), 6
    )
    return out.select("t", "day", ema.alias("ema_value"))


A6_EMA_SQL = f"""
WITH daily AS (
  SELECT date_trunc('day', ts)::TIMESTAMP AS day,
         sum(round(value * 100)::BIGINT) AS x
  FROM events WHERE ts < TIMESTAMP '{EMA_DAYS_CUTOFF}' GROUP BY 1
), idx AS (
  SELECT day, x, (row_number() OVER (ORDER BY day) - 1)::INT AS t FROM daily
), terms AS (
  SELECT l.t, l.day,
         CASE WHEN r.t = 0 THEN power(4, l.t)::BIGINT
              ELSE (power(4, l.t - r.t) * power(5, r.t - 1))::BIGINT
         END * r.x AS term
  FROM idx l JOIN idx r ON r.t <= l.t
)
SELECT t, day, round(sum(term) / power(5, t) / 100.0, 6) AS ema_value
FROM terms GROUP BY t, day
"""


# --- A7: per-pipeline timing/count aggregate ---------------------------------
# shape of item_processor.rs:32,80-124's per-pipeline (total_time, count)
# map: one group per pipeline name (event_type here), exact integer-cent sum
def a7_pipeline_timing(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return e.groupBy(F.col("event_type").alias("pipeline")).agg(
        (F.sum(cents) / 100.0).alias("total_ms"),
        F.count("*").alias("n_items"),
    )


A7_SQL = """
SELECT event_type AS pipeline,
       sum(round(value * 100)::BIGINT) / 100.0 AS total_ms,
       count(*) AS n_items
FROM events GROUP BY 1
"""


# --- A8: per-host adaptive feedback aggregate --------------------------------
def a8_perhost_feedback(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return e.groupBy("user_id").agg(
        (F.round(F.sum(cents) * 100.0 / F.count("*"), 0) / 10000.0).alias(
            "avg_value"
        ),
        F.round(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            / F.count("*"),
            4,
        ).alias("error_rate"),
        F.count("*").alias("n"),
    )


A8_SQL = """
SELECT user_id,
       round(sum(round(value * 100)::BIGINT) * 100.0 / count(*), 0) / 10000.0
         AS avg_value,
       round(sum(case when event_type = 'error' then 1 else 0 end)::DOUBLE
             / count(*), 4) AS error_rate,
       count(*) AS n
FROM events GROUP BY 1
"""


# --- F5: recrawl / freshness scheduler ---------------------------------------
# Revisit-policy operator (Cho & Garcia-Molina 2003, "Effective page
# refresh policies for web crawlers" — public): per page, estimate the
# change rate from fetch history and derive the next revisit interval.
# The reference crawler has no freshness layer (it crawls each URL once,
# src/scheduler.rs dedup-forever semantics); this is engine-added crawl
# surface for CONTINUOUS crawling, where the frontier is re-seeded from
# the schedule table each epoch.
#
# Fixture mapping: events = fetch observations (user_id = page, ts =
# fetch time); a "change" = event_type differs from the previous fetch's
# event_type. Interval = observed span / (changes + 1), clamped to
# [1 h, 7 d] — ALL integer arithmetic (floored epochs, integer div), so
# Spark and DuckDB agree bit-for-bit with no FP in the decision path.
#
# Scale: one window + one groupBy, both keyed by page id (the natural
# partition key of a 10^10-row fetch-history table); aggregations are
# map-side combinable and the window never sees more than one page's
# history per partition slice.
RECRAWL_MIN_S = 3600
RECRAWL_MAX_S = 7 * 86400


def f5_recrawl_schedule(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("page_id"),
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("ep"),
    )
    w = Window.partitionBy("page_id").orderBy("event_id")
    marked = e.withColumn(
        "changed",
        (F.col("event_type") != F.lag("event_type").over(w)).cast("int"),
    )
    agg = marked.groupBy("page_id").agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.sum(F.coalesce(F.col("changed"), F.lit(0))).cast("long").alias(
            "n_changes"
        ),
        (F.max("ep") - F.min("ep")).cast("long").alias("span_s"),
        F.max("ep").cast("long").alias("last_epoch"),
    )
    interval = F.greatest(
        F.lit(RECRAWL_MIN_S),
        F.least(
            F.lit(RECRAWL_MAX_S),
            F.expr("span_s div (n_changes + 1)"),
        ),
    ).cast("long")
    return agg.select(
        "page_id",
        "n_fetches",
        "n_changes",
        "span_s",
        interval.alias("next_interval_s"),
        (F.col("last_epoch") + interval).cast("long").alias("next_fetch_epoch"),
    )


F5_SQL = f"""
WITH obs AS (
  SELECT user_id AS page_id, event_id, event_type,
         floor(epoch(ts))::BIGINT AS ep
  FROM events
), marked AS (
  SELECT page_id, ep,
         CASE WHEN event_type <> lag(event_type)
                   OVER (PARTITION BY page_id ORDER BY event_id)
              THEN 1 ELSE 0 END AS changed
  FROM obs
), agg AS (
  SELECT page_id,
         count(*)::BIGINT AS n_fetches,
         sum(coalesce(changed, 0))::BIGINT AS n_changes,
         (max(ep) - min(ep))::BIGINT AS span_s,
         max(ep)::BIGINT AS last_epoch
  FROM marked GROUP BY 1
)
SELECT page_id, n_fetches, n_changes, span_s,
       greatest({RECRAWL_MIN_S},
                least({RECRAWL_MAX_S}, span_s // (n_changes + 1)))::BIGINT
         AS next_interval_s,
       (last_epoch
        + greatest({RECRAWL_MIN_S},
                   least({RECRAWL_MAX_S}, span_s // (n_changes + 1))))::BIGINT
         AS next_fetch_epoch
FROM agg
"""


# --- F6: link-graph PageRank frontier priority --------------------------------
# Distributed link-analysis prioritization for the frontier (Cho,
# Garcia-Molina & Page 1998, "Efficient crawling through URL ordering" —
# public): crawl important pages first, importance = PageRank over the
# link graph observed so far. The reference orders its frontier by a
# static per-request priority (src/scheduler.rs BinaryHeap); this adds
# the graph-derived priority a large-scale crawler feeds back into that
# field each epoch.
#
# Fixture mapping: pages = user_id space; each event contributes one
# directed edge page(user_id) -> page(h64(event_id) % U), U = max page
# id + 1 (a deterministic synthetic link observed at that event).
# Multi-edges keep their multiplicity (a page linking twice votes
# twice), self-loops are dropped.
#
# ALL-INTEGER PageRank (3 unrolled iterations, damping 85/100, scale
# 10^6): contribution = rank div out_degree, new rank = 15% of scale +
# 85% of summed contributions, every step int64 `div` — bit-identical
# across Spark and DuckDB with zero FP summation-order hazard. Mass
# leaked by dangling pages and by integer-div remainders is NOT
# redistributed (documented lost-mass variant); ranks are a priority
# SIGNAL, not a probability distribution.
#
# Scale (10^10-edge graph): the per-iteration cost is one shuffle join
# of ranks (node-keyed, |V| rows) against edges on src plus one
# map-side-combinable groupBy(dst); out-degrees are computed once. With
# a fixed iteration count the plan is fully unrolled and declarative —
# Catalyst sees one tree, AQE sizes every exchange. The node frame is
# spark.range(U) (no driver materialization); the only driver scalar is
# U itself (one agg job, the rank.py offsets pattern).
PR_SEED = 53
PR_SCALE = 1_000_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_ITERS = 3


PR_CKPT_EVERY = 4  # lineage break cadence for realistic iteration counts


def f6_pagerank_priority(spark, sf_dir, iters: int = PR_ITERS):
    from spider_core_spark.operators.prefix import (
        _jrdd_handles,
        _persistent_ids,
    )
    from spider_core_spark.textops.dedup import _h64_spark, stage_handle

    ev = _t(spark, sf_dir, "events")
    u_max = ev.agg(F.max("user_id")).collect()[0][0]  # driver scalar
    n_nodes = int(u_max) + 1
    edges = ev.select(
        F.col("user_id").cast("long").alias("src"),
        (
            F.expr(_h64_spark("cast(event_id as string)", PR_SEED))
            % n_nodes
        ).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    nodes = spark.range(n_nodes).select(F.col("id").cast("long").alias("page_id"))
    ranks = nodes.select("page_id", F.lit(PR_SCALE).cast("long").alias("rank"))
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    prev_ckpt: list = []
    for i in range(iters):
        contrib = (
            edges.join(deg, "src")
            .join(ranks, edges.src == ranks.page_id)
            .select(
                F.col("dst").alias("page_id"),
                F.expr("rank div deg").cast("long").alias("c"),
            )
            .groupBy("page_id")
            .agg(F.sum("c").cast("long").alias("csum"))
        )
        ranks = (
            nodes.join(contrib, "page_id", "left")
            .select(
                "page_id",
                (
                    F.lit(base)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(csum, 0)) div {PR_DAMP_DEN}"
                    )
                ).cast("long").alias("rank"),
            )
        )
        # realistic iteration counts (20+) need a periodic lineage break
        # or the stacked joins grow the plan superlinearly (r4 verdict
        # #7); at the registered PR_ITERS=3 this never fires, so the
        # oracle-gated plan is untouched
        if (i + 1) % PR_CKPT_EVERY == 0 and i + 1 < iters:
            ids_before = _persistent_ids(spark)
            ranks = ranks.localCheckpoint(eager=True)
            for h in prev_ckpt:
                h.unpersist()
            prev_ckpt = _jrdd_handles(spark, _persistent_ids(spark) - ids_before)
    # the final frame may read the last checkpoint — release with the
    # staged-cache registry after the caller's terminal action
    for h in prev_ckpt:
        stage_handle(h)
    # rank -> crawl order via the TWO-PHASE global rank (operators/rank.py):
    # |V| is 10^10 at web scale, so a bare row_number() window (single
    # partition) would be the bottleneck; the helper range-partitions on
    # (-rank, page_id) and offsets intra-partition row numbers. Its
    # persisted output is registered with the textops staged-cache
    # registry — callers (bench.py does) release via
    # textops.dedup.release_staged_caches().
    from spider_core_spark.operators.rank import with_global_rank
    from spider_core_spark.textops.dedup import _STAGED

    ranked, _ = with_global_rank(
        ranks.withColumn("_neg", (-F.col("rank")).cast("long")),
        ["_neg", "page_id"],
        "_ord",
    )
    _STAGED.append(ranked)
    return ranked.select(
        "page_id", "rank", (F.col("_ord") + 1).cast("long").alias("fetch_order")
    )


def _f6_sql() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    h = h64_duckdb("cast(event_id as varchar)", seed=PR_SEED)
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    it = """
, r{i} AS (
  SELECT n.page_id,
         ({base} + ({dn} * COALESCE(c.csum, 0)) // {dd})::BIGINT AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS page_id, sum(r.rank // d.deg)::BIGINT AS csum
    FROM edges e JOIN deg d USING (src) JOIN r{p} r ON r.page_id = e.src
    GROUP BY 1
  ) c USING (page_id)
)"""
    iters = "".join(
        it.format(i=i, p=i - 1, base=base, dn=PR_DAMP_NUM, dd=PR_DAMP_DEN)
        for i in range(1, PR_ITERS + 1)
    )
    return f"""
WITH u AS (
  SELECT (max(user_id) + 1)::BIGINT AS n FROM events
), edges AS (
  SELECT user_id::BIGINT AS src,
         ({h} % (SELECT n FROM u))::BIGINT AS dst
  FROM events
  WHERE user_id::BIGINT <> ({h} % (SELECT n FROM u))::BIGINT
), deg AS (
  SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1
), nodes AS (
  SELECT unnest(generate_series(0, (SELECT n FROM u) - 1))::BIGINT AS page_id
), r0 AS (
  SELECT page_id, {PR_SCALE}::BIGINT AS rank FROM nodes
){iters}
SELECT page_id, rank,
       row_number() OVER (ORDER BY rank DESC, page_id ASC)::BIGINT
         AS fetch_order
FROM r{PR_ITERS}
"""


F6_SQL = _f6_sql()


# --- P7: URL blocklist filter (UT1-style domain-suffix blocking) ----------
# A crawl frontier (and a CCNet-style curation pipeline) drops URLs whose
# host matches a BLOCKLIST DOMAIN OR any of its subdomains ("s3.test"
# blocks "h9.s3.test"). The scalable shape is NOT a per-row scan of the
# blocklist: each host explodes into its label-boundary suffix chain
# ("a.b.c" -> [a.b.c, b.c, c] — at most ~6 rows/URL) and one broadcast
# equi-join against the domain table decides membership. At a UT1-sized
# blocklist (a few M domains, tens of MB) the dim side still broadcasts;
# past that it's an ordinary shuffle equi-join on the suffix key.
BLOCKLIST_DOMAINS = ["s3.test", "h7.s1.test", "h21.s5.test"]


def p7_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL blocked verdict against the domain blocklist (suffix
    semantics). Hosts synthesized from orders: h{custkey%50}.s{okey%7}.test
    — 350 distinct hosts; 's3.test' blocks a whole 50-host subtree, the
    other two entries block single hosts, so both verdicts are non-vacuous
    at sf0.01."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.concat(
            F.lit("h"),
            (F.col("o_custkey") % 50).cast("string"),
            F.lit(".s"),
            (F.col("o_orderkey") % 7).cast("string"),
            F.lit(".test"),
        ).alias("host"),
    )
    bl = spark.createDataFrame(
        [(d,) for d in BLOCKLIST_DOMAINS], "domain string"
    )
    sfx = base.select(
        "o_orderkey", F.split("host", "[.]").alias("labels")
    ).select(
        "o_orderkey",
        F.explode(
            F.expr(
                "transform(sequence(0, size(labels) - 1), "
                "i -> concat_ws('.', slice(labels, i + 1, size(labels) - i)))"
            )
        ).alias("sfx"),
    )
    hits = (
        sfx.join(F.broadcast(bl), sfx["sfx"] == bl["domain"])
        .select("o_orderkey")
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    return base.join(hits, "o_orderkey", "left").select(
        "o_orderkey",
        "host",
        F.coalesce("blocked", F.lit(False)).alias("blocked"),
    )


_BL_VALUES = ", ".join(f"('{d}')" for d in BLOCKLIST_DOMAINS)
P7_SQL = f"""
WITH base AS (
  SELECT o_orderkey,
         'h' || (o_custkey % 50) || '.s' || (o_orderkey % 7) || '.test'
           AS host
  FROM orders
), bl(domain) AS (VALUES {_BL_VALUES}),
lab AS (SELECT o_orderkey, string_split(host, '.') AS labels FROM base),
sfx AS (
  SELECT o_orderkey,
         unnest([array_to_string(labels[i:], '.')
                 for i in range(1, len(labels) + 1)]) AS s
  FROM lab
), hits AS (
  SELECT DISTINCT o_orderkey FROM sfx JOIN bl ON sfx.s = bl.domain
)
SELECT base.o_orderkey, base.host,
       (hits.o_orderkey IS NOT NULL) AS blocked
FROM base LEFT JOIN hits USING (o_orderkey)
"""


# --- U3: HyperLogLog URL-cardinality sketch -----------------------------------
# The reference keeps an exact in-memory seen-set and counts urls_seen as
# a plain counter (src/scheduler.rs seen-set + src/stats.rs counters). At
# a 10^10-URL frontier a DISTINCT count is a full shuffle of every URL;
# the scalable analog is a HyperLogLog sketch (Flajolet et al. 2007,
# public): one combinable groupBy producing m=256 integer registers that
# merge across shards/epochs with max() — the same merge the Bloom
# seen-set shards use. The registered query returns the REGISTERS (exact
# int64s, oracle-checkable bit-for-bit); the float estimate is derived
# from them by ``hll_estimate`` (driver-side, 256 rows) and
# accuracy-tested in pytest against the true distinct count.
#
# Hash layout (all integers, engine-portable): h = h64(url) is 60 bits;
# bucket = h % 256; w = h div 256 (52 bits); rho = 53 - bitlength(w)
# (position of the leftmost 1-bit from the top, standard HLL rank), with
# rho = 53 when w = 0. bitlength is computed as
# length(ltrim('0', bin(w))) — `bin` is minimal-width in both engines.
HLL_M = 256  # registers (p = 8); relative error ~ 1.04/sqrt(m) = 6.5%
_HLL_WBITS = 60 - 8  # bits left in h64 after the bucket index


def u3_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL registers over the synthetic URL stream
    'http://h{l_suppkey%100}.test/o{l_orderkey}' (duplicates by
    construction: one URL per lineitem, repeated across line numbers).
    Plan at 100 TB: ONE pruned scan + ONE map-side-combinable
    groupBy(bucket).max(rho) with 256 output rows — no distinct shuffle,
    no driver state; shard sketches union by max like Bloom shards."""
    from spider_core_spark.functions.hashing import h64_col

    li = _t(spark, sf_dir, "lineitem")
    url = F.concat(
        F.lit("http://h"),
        (F.col("l_suppkey") % 100).cast("string"),
        F.lit(".test/o"),
        F.col("l_orderkey").cast("string"),
    )
    rho_max = _HLL_WBITS + 1
    hashed = (
        li.select(h64_col(url).alias("_h"))  # stage: hash computed once
        .select(
            (F.col("_h") % HLL_M).cast("long").alias("bucket"),
            F.expr(f"_h div {HLL_M}").alias("_w"),
        )
        .select(
            "bucket",
            F.expr(
                f"CASE WHEN _w = 0 THEN {rho_max} "
                f"ELSE {rho_max} - length(ltrim('0', bin(_w))) END"
            ).alias("rho"),
        )
    )
    regs = hashed.groupBy("bucket").agg(F.max("rho").cast("long").alias("register"))
    buckets = spark.range(HLL_M).select(F.col("id").cast("long").alias("bucket"))
    return (
        buckets.join(regs, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("register", F.lit(0)).cast("long").alias("register"),
        )
    )


def _u3_sql() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    h = h64_duckdb(
        "'http://h' || (l_suppkey % 100) || '.test/o' || l_orderkey"
    )
    rho_max = _HLL_WBITS + 1
    return f"""
WITH h AS (
  SELECT ({h}) AS _h FROM lineitem
), hashed AS (
  SELECT _h % {HLL_M} AS bucket, _h // {HLL_M} AS _w FROM h
), regs AS (
  SELECT bucket,
         max(CASE WHEN _w = 0 THEN {rho_max}
                  ELSE {rho_max} - length(ltrim(bin(_w), '0')) END)
           AS register
  FROM hashed GROUP BY 1
)
SELECT b.bucket::BIGINT AS bucket,
       coalesce(r.register, 0)::BIGINT AS register
FROM (SELECT unnest(generate_series(0, {HLL_M - 1}))::BIGINT AS bucket) b
LEFT JOIN regs r USING (bucket)
"""


U3_SQL = _u3_sql()


def hll_estimate(registers: list[int]) -> float:
    """Standard HLL estimator with small-range correction (Flajolet et
    al. 2007 §4): driver-side over the m=256 collected registers."""
    import math

    m = len(registers)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / sum(2.0 ** -r for r in registers)
    zeros = registers.count(0)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)  # linear counting
    return raw


# --- F7: quality-feedback frontier priority -----------------------------------
# Focused crawling (Chakrabarti, van den Berg & Dom 1999, public): boost
# the frontier priority of hosts whose ALREADY-FETCHED pages scored high
# on the content-quality gate, so the next wave spends its politeness
# budget where the corpus is proving valuable. The reference's frontier
# orders by a static per-request priority (src/scheduler.rs BinaryHeap);
# this is the feedback loop a corpus-building crawl runs on top: fetched
# docs -> per-host quality -> next-wave priority.
#
# ALL-INTEGER (f6 pattern, zero FP hazards): per-doc quality =
# (1000 * en-stopword hits) div n_tokens; per-host quality = integer mean
# (sum div count); effective priority = (6 - order_priority) * 10^6 +
# host_quality_milli, ranked descending with o_orderkey tiebreak.
#
# Fixture mapping: fetched docs = documents with host 'h{doc_id%50}.test';
# frontier = orders with host 'h{o_custkey%50}.test' (the p7 host space)
# and base priority = the leading digit of o_orderpriority (1=URGENT).
#
# Scale (10^10-row frontier): host-quality agg is ONE map-side-combinable
# groupBy over the fetched-docs table (narrow: two int columns); the host
# dimension (|hosts| << |urls|) broadcasts into the frontier join; the
# top-K wave is a TakeOrdered (no single-partition window). Priority is
# recomputed per epoch from the growing docs table — the same shape at
# every epoch.
F7_TOPK = 200


def f7_quality_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    from spider_core_spark.textops.analysis import _stop_hits_spark

    host_q = (
        docs.select(
            F.concat(
                F.lit("h"), (F.col("doc_id") % 50).cast("string"), F.lit(".test")
            ).alias("host"),
            F.expr(
                f"(1000 * ({_stop_hits_spark('en')})) "
                "div size(split(lower(text), ' '))"
            ).alias("q_milli"),
        )
        .groupBy("host")
        .agg(F.expr("sum(q_milli) div count(*)").cast("long").alias("host_q_milli"))
    )
    frontier = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.concat(
            F.lit("h"), (F.col("o_custkey") % 50).cast("string"), F.lit(".test")
        ).alias("host"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("base_pri"),
    )
    return (
        frontier.join(F.broadcast(host_q), "host", "left")
        .select(
            "o_orderkey",
            "host",
            "base_pri",
            F.coalesce("host_q_milli", F.lit(0)).cast("long").alias("host_q_milli"),
            (
                (F.lit(6) - F.col("base_pri")) * 1_000_000
                + F.coalesce("host_q_milli", F.lit(0))
            ).cast("long").alias("eff_pri"),
        )
        .orderBy(F.desc("eff_pri"), F.asc("o_orderkey"))
        .limit(F7_TOPK)
    )


def _f7_sql() -> str:
    from spider_core_spark.textops.analysis import _stop_hits_duck

    return f"""
WITH hq AS (
  SELECT 'h' || (doc_id % 50) || '.test' AS host,
         sum((1000 * ({_stop_hits_duck('en')}))
             // len(string_split(lower(text), ' ')))
           // count(*) AS host_q_milli
  FROM documents GROUP BY 1
), frontier AS (
  SELECT o_orderkey,
         'h' || (o_custkey % 50) || '.test' AS host,
         substring(o_orderpriority, 1, 1)::BIGINT AS base_pri
  FROM orders
)
SELECT o_orderkey, f.host, base_pri,
       coalesce(host_q_milli, 0)::BIGINT AS host_q_milli,
       ((6 - base_pri) * 1000000 + coalesce(host_q_milli, 0))::BIGINT
         AS eff_pri
FROM frontier f LEFT JOIN hq USING (host)
ORDER BY eff_pri DESC, o_orderkey ASC
LIMIT {F7_TOPK}
"""


F7_SQL = _f7_sql()


# --- F8: crawler-trap detection -----------------------------------------------
# Infinite URL spaces (calendar pages, session-id paths, self-linking
# directory loops) are the classic crawler trap (Heydon & Najork 1999,
# "Mercator: a scalable, extensible web crawler" — public). A frontier at
# 10^10 URLs must demote trap hosts BEFORE fetching; the standard signals
# are structural, computable from the URL alone: path depth and repeated
# path segments. The reference has no trap guard (its politeness cap is
# the only per-host brake, src/scheduler.rs) — this is the scale-path
# operator a web-wide crawl adds on top.
#
# ALL-INTEGER per-host aggregates (f6/f7 pattern):
#   depth        = number of path segments,
#   redundancy   = depth - |distinct segments| (>= 2 -> a loop-shaped URL),
#   loopy_milli  = 1000 * n_loopy div n_urls,
#   depth_milli  = 1000 * sum(depth) div n_urls,
#   is_trap      = loopy_milli >= 300 OR depth_milli >= 5000.
#
# Fixture mapping: host 'h{l_suppkey%24}.test' with a per-host depth cap
# 2 + (l_suppkey%24) % 7 and cyclic segments 's{(l_orderkey+i)%4}' — deep
# hosts (cap >= 6) emit pigeonholed repeated segments, so ~1/3 of the 24
# hosts trip the trap verdict and the rest stay clean (non-vacuous both
# ways).
#
# Scale: per-URL columns are narrow array expressions inside the scan
# (whole-stage codegen, segment arrays never shuffled); the ONLY shuffle
# is the map-side-combinable groupBy(host) with |hosts| output rows. Hot
# hosts skew the key but partial aggregation collapses them map-side.
TRAP_LOOPY_MILLI = 300
TRAP_DEPTH_MILLI = 5000


def f8_trap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_url = li.select(
        F.concat(
            F.lit("h"), (F.col("l_suppkey") % 24).cast("string"), F.lit(".test")
        ).alias("host"),
        F.expr(
            "transform(sequence(1, 1 + l_orderkey % (2 + (l_suppkey % 24) % 7)), "
            "i -> concat('s', cast((l_orderkey + i) % 4 as string)))"
        ).alias("segs"),
    ).select(
        "host",
        F.size("segs").cast("long").alias("depth"),
        (F.size("segs") - F.size(F.array_distinct("segs"))).cast("long").alias(
            "redundancy"
        ),
    )
    agg = per_url.groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum("depth").cast("long").alias("_sd"),
        F.sum((F.col("redundancy") >= 2).cast("long")).cast("long").alias(
            "_nl"
        ),
    )
    return agg.select(
        "host",
        "n_urls",
        F.expr("(1000 * _sd) div n_urls").cast("long").alias("depth_milli"),
        F.expr("(1000 * _nl) div n_urls").cast("long").alias("loopy_milli"),
        (
            (F.expr("(1000 * _nl) div n_urls") >= TRAP_LOOPY_MILLI)
            | (F.expr("(1000 * _sd) div n_urls") >= TRAP_DEPTH_MILLI)
        ).alias("is_trap"),
    )


# --- S9: sitemap parse (URL discovery) ----------------------------------------
# Sitemap-driven discovery (sitemaps.org protocol, public): a crawler
# fetches /sitemap.xml per host and seeds the frontier from its <loc>
# entries — the push-channel complement to link extraction (the
# reference only discovers via parsed links). The fixture synthesizes a
# deterministic sitemap blob per host from orders (sorted string_agg —
# identical bytes in both engines), then the OPERATOR half parses it
# back: regexp-extract every <loc>, emit (host, seq, url) frontier rows
# in document order. Mirrors the multimodal pattern: synthetic input,
# real parse plumbing.
#
# Scale: blob build is one combinable-ish groupBy(host) (collect_list +
# array_sort — bounded by per-host sitemap size, 50k-URL sitemap caps in
# the protocol); parsing is a narrow per-blob regexp + posexplode, fully
# partition-parallel across hosts.


def s9_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    entries = o.select(
        F.concat(
            F.lit("h"), (F.col("o_custkey") % 20).cast("string"), F.lit(".test")
        ).alias("host"),
        F.concat(
            F.lit("<url><loc>http://h"),
            (F.col("o_custkey") % 20).cast("string"),
            F.lit(".test/o"),
            F.col("o_orderkey").cast("string"),
            F.lit("</loc></url>"),
        ).alias("entry"),
    )
    blobs = entries.groupBy("host").agg(
        F.concat(
            F.lit("<urlset>"),
            F.concat_ws("", F.array_sort(F.collect_list("entry"))),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    from spider_core_spark.plans.discovery import parse_sitemaps

    return parse_sitemaps(blobs)


S9_SQL = """
WITH entries AS (
  SELECT 'h' || (o_custkey % 20) || '.test' AS host,
         '<url><loc>http://h' || (o_custkey % 20) || '.test/o'
           || o_orderkey || '</loc></url>' AS entry
  FROM orders WHERE o_orderkey % 10 = 0
), blobs AS (
  SELECT host,
         '<urlset>' || string_agg(entry, '' ORDER BY entry) || '</urlset>'
           AS xml
  FROM entries GROUP BY 1
), locs AS (
  SELECT host, regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1) AS ls
  FROM blobs
)
SELECT host, (generate_subscripts(ls, 1) - 1)::BIGINT AS seq,
       unnest(ls) AS url
FROM locs
"""


# --- S10: robots.txt Sitemap directives → frontier seeds ----------------------
# The full push-discovery chain (robots.org + sitemaps.org, public):
# robots.txt advertises sitemaps via group-independent `Sitemap:` lines;
# the crawler resolves each advertised URL against its own fetched copy
# of that sitemap and seeds the frontier from the <loc> entries. S9
# certifies the sitemap PARSE; this certifies the whole chain — robots
# body line parse (comment strip, case-insensitive key, colon guard),
# directive ordering per host, the inner blob-resolution join
# (advertised-but-unfetched sitemaps drop, like links to unfetched
# pages), then the S9 parse with the directive rank carried through.
# Fixture: hosts from orders (o_custkey % 20); each host's robots body
# advertises sitemap_a.xml and sitemap_b.xml (mixed-case key + trailing
# comment on the second), blobs split orders by o_orderkey % 20 — hosts
# with no 'a' orders exercise the unfetched-sitemap drop branch.
#
# Scale: directive extraction touches robots rows only (a per-host
# window over one body's lines); blob resolution is one equi-join whose
# directive side broadcasts; parsing is partition-parallel per blob.


def s10_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    host = F.concat(
        F.lit("h"), (F.col("o_custkey") % 20).cast("string"), F.lit(".test")
    )
    entries = o.select(
        host.alias("host"),
        F.when(F.col("o_orderkey") % 20 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("part"),
        F.concat(
            F.lit("<url><loc>http://"),
            host,
            F.lit("/o"),
            F.col("o_orderkey").cast("string"),
            F.lit("</loc></url>"),
        ).alias("entry"),
    )
    blobs = entries.groupBy("host", "part").agg(
        F.concat(
            F.lit("<urlset>"),
            F.concat_ws("", F.array_sort(F.collect_list("entry"))),
            F.lit("</urlset>"),
        ).alias("text")
    )
    sm_pages = blobs.select(
        F.concat(
            F.lit("http://"),
            F.col("host"),
            F.lit("/sitemap_"),
            F.col("part"),
            F.lit(".xml"),
        ).alias("url"),
        "text",
    )
    rb_pages = (
        blobs.select("host")
        .distinct()
        .select(
            F.concat(F.lit("http://"), F.col("host"), F.lit("/robots.txt")).alias(
                "url"
            ),
            F.concat(
                F.lit("User-agent: *\nDisallow: /private\nSitemap: http://"),
                F.col("host"),
                F.lit("/sitemap_a.xml\nsitemap: http://"),
                F.col("host"),
                F.lit("/sitemap_b.xml # primary mirror"),
            ).alias("text"),
        )
    )
    from spider_core_spark.plans.discovery import sitemaps_from_robots

    return sitemaps_from_robots(rb_pages.unionByName(sm_pages))


S10_SQL = """
WITH entries AS (
  SELECT 'h' || (o_custkey % 20) || '.test' AS host,
         CASE WHEN o_orderkey % 20 = 0 THEN 'a' ELSE 'b' END AS part,
         '<url><loc>http://h' || (o_custkey % 20) || '.test/o'
           || o_orderkey || '</loc></url>' AS entry
  FROM orders WHERE o_orderkey % 10 = 0
), blobs AS (
  SELECT host, part,
         '<urlset>' || string_agg(entry, '' ORDER BY entry) || '</urlset>'
           AS xml
  FROM entries GROUP BY 1, 2
), bodies AS (
  SELECT host,
         'User-agent: *' || chr(10) || 'Disallow: /private' || chr(10)
           || 'Sitemap: http://' || host || '/sitemap_a.xml' || chr(10)
           || 'sitemap: http://' || host
           || '/sitemap_b.xml # primary mirror' AS body
  FROM (SELECT DISTINCT host FROM blobs)
), rawlines AS (
  SELECT host, generate_subscripts(ls, 1) AS line_no, unnest(ls) AS raw
  FROM (SELECT host, string_split(body, chr(10)) AS ls FROM bodies)
), kv AS (
  SELECT host, line_no,
         lower(trim(split_part(line, ':', 1))) AS key,
         trim(regexp_replace(line, '^[^:]*:', '')) AS value
  FROM (SELECT host, line_no, trim(split_part(raw, '#', 1)) AS line
        FROM rawlines)
  WHERE line LIKE '%:%'
), su AS (
  SELECT host,
         (row_number() OVER (PARTITION BY host ORDER BY line_no) - 1)::BIGINT
           AS sm_seq,
         value AS sitemap_url
  FROM kv WHERE key = 'sitemap' AND value <> ''
), sm_pages AS (
  SELECT 'http://' || host || '/sitemap_' || part || '.xml' AS sitemap_url,
         xml
  FROM blobs
), locs AS (
  SELECT su.host, su.sm_seq,
         regexp_extract_all(p.xml, '<loc>([^<]+)</loc>', 1) AS ls
  FROM su JOIN sm_pages p ON su.sitemap_url = p.sitemap_url
)
SELECT host, sm_seq, (generate_subscripts(ls, 1) - 1)::BIGINT AS seq,
       unnest(ls) AS url
FROM locs
"""


# --- G1: link-graph degree histogram ------------------------------------------
# The first report every web-graph pipeline runs (Broder et al. 2000,
# "Graph structure in the web"): in/out-degree distributions in log2
# buckets (web degrees are power-law — linear buckets are useless).
# Same deterministic edge fixture as f6 (src = user_id, dst =
# h64(event_id) % U, self-loops dropped). Bucket = bit-length of the
# degree (the HLL ltrim-bin primitive doing integer log2), so the whole
# op is integer-exact.
#
# Scale: two combinable groupBys (degree per node, then nodes per
# bucket) per direction; the second agg's input is |V| rows and its
# output ≤ 64 buckets. No windows, no joins against the edge set beyond
# the degree count itself.


def g1_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spider_core_spark.textops.dedup import _h64_spark

    ev = _t(spark, sf_dir, "events")
    u_max = ev.agg(F.max("user_id")).collect()[0][0]  # driver scalar (f6)
    n_nodes = int(u_max) + 1
    edges = ev.select(
        F.col("user_id").cast("long").alias("src"),
        (
            F.expr(_h64_spark("cast(event_id as string)", PR_SEED)) % n_nodes
        ).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))

    def hist(col: str, direction: str) -> DataFrame:
        deg = edges.groupBy(col).agg(F.count("*").cast("long").alias("deg"))
        return (
            deg.select(
                F.expr("length(ltrim('0', bin(deg)))").cast("long").alias(
                    "bucket"
                )
            )
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_nodes"))
            .select(F.lit(direction).alias("direction"), "bucket", "n_nodes")
        )

    return hist("src", "out").unionAll(hist("dst", "in"))


def _g1_sql() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    h = h64_duckdb("cast(event_id as varchar)", seed=PR_SEED)
    part = """
SELECT '{d}' AS direction, length(ltrim(bin(deg), '0'))::BIGINT AS bucket,
       count(*)::BIGINT AS n_nodes
FROM (SELECT {col}, count(*)::BIGINT AS deg FROM edges GROUP BY 1)
GROUP BY 2"""
    return f"""
WITH u AS (
  SELECT (max(user_id) + 1)::BIGINT AS n FROM events
), edges AS (
  SELECT user_id::BIGINT AS src,
         ({h} % (SELECT n FROM u))::BIGINT AS dst
  FROM events
  WHERE user_id::BIGINT <> ({h} % (SELECT n FROM u))::BIGINT
)
{part.format(d='out', col='src')}
UNION ALL
{part.format(d='in', col='dst')}
"""


G1_SQL = _g1_sql()


# --- J5: anchor-text aggregation ----------------------------------------------
# The classic inlink signal (Brin & Page 1998: anchor text describes the
# TARGET page better than the target's own text): aggregate the link
# text of every inlink per target URL and keep the top-k terms. The
# reference extracts links from fetched pages (linkify/scraper,
# Cargo.lock:1742-1771); a search-grade crawl pipeline aggregates their
# anchor text across the whole graph — inherently a distributed op the
# single-process reference never does.
#
# Fixture mapping: each lineitem is a link to target page
# 'http://p{l_partkey}.test' with anchor text p_name (broadcast dim
# join); multiple inlinks per part give real term frequencies.
#
# Scale: anchor explode + groupBy(target, term) is map-side combinable;
# the top-k window partitions by TARGET over its own aggregated term
# list (bounded by distinct anchor vocabulary per page, never by inlink
# count — the heavy dimension collapses in the combinable agg first).
ANCHOR_TOPK = 3


def j5_anchor_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    links = li.select(F.col("l_partkey").alias("p_partkey")).join(
        F.broadcast(part), "p_partkey"
    )
    terms = links.select(
        F.concat(
            F.lit("http://p"), F.col("p_partkey").cast("string"), F.lit(".test")
        ).alias("target"),
        F.explode(F.split("p_name", " ")).alias("term"),
    )
    agg = terms.groupBy("target", "term").agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.partitionBy("target").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= ANCHOR_TOPK)
        .select("target", "term", "cnt", "rank")
    )


J5_SQL = f"""
WITH terms AS (
  SELECT 'http://p' || l.l_partkey || '.test' AS target,
         unnest(string_split(p.p_name, ' ')) AS term
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), agg AS (
  SELECT target, term, count(*)::BIGINT AS cnt FROM terms GROUP BY 1, 2
)
SELECT target, term, cnt, rank FROM (
  SELECT target, term, cnt,
         row_number() OVER (
           PARTITION BY target ORDER BY cnt DESC, term ASC
         )::BIGINT AS rank
  FROM agg
)
WHERE rank <= {ANCHOR_TOPK}
"""


# --- U4: Bloom seen-set membership (bit-arithmetic certification) -------------
# The Bloom/sharded URL-seen prefilter is the north-rule primitive
# (operators/dedup.py: position_i = int(fp_hex[8i:8i+8], 16) % n_bits,
# shard = pmod(h64(fp), n_shards), src/scheduler.rs:137 k=5 parity). The
# engine packs set bits into numpy bitsets broadcast per shard; this
# query expresses the SAME membership decision relationally — inserted
# (shard, pos) pairs as a distinct table, candidate probes as a 5-row
# explode, hit iff all 5 probes land on set bits — calling the very
# shard_col/bloom_positions_col the engine uses, so the driver gate
# certifies the bit arithmetic bit-for-bit against DuckDB.
#
# Sized for non-vacuous verdicts at sf0.01: 2,500 seen keys × 5 hashes
# in 16,384 bits ⇒ ~53% fill ⇒ fpr ≈ 0.53^5 ≈ 4% — both hits and false
# positives appear, and no-false-negative is part of the oracle match.
BLOOM_Q_BITS = 16_384
BLOOM_Q_HASHES = 5
BLOOM_Q_SHARDS = 4


def u4_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spider_core_spark.operators.dedup import (
        bloom_positions_col,
        shard_col,
    )
    from spider_core_spark.sources.scan import read_parquet_spread

    # fan-out opt-in: the sha256-per-probe pass below is the rare demo
    # whose cost is a CPU-bound narrow stage on the scan itself
    # (measured 2.65 s -> 1.74 s with the spread; see _t for why the
    # other demos stay on plain reads)
    o = read_parquet_spread(spark, f"{sf_dir}/orders.parquet")
    base = o.select(
        "o_orderkey",
        F.sha2(
            F.concat(
                F.lit("http://h"),
                (F.col("o_custkey") % 50).cast("string"),
                F.lit(".test/o"),
                F.col("o_orderkey").cast("string"),
            ),
            256,
        ).alias("fp"),
        (F.col("o_orderkey") % 2 == 0).alias("actually_seen"),
    )
    probes = base.select(
        "o_orderkey",
        "actually_seen",
        shard_col(F.col("fp"), BLOOM_Q_SHARDS).cast("long").alias("shard"),
        F.explode(
            bloom_positions_col(F.col("fp"), BLOOM_Q_BITS, BLOOM_Q_HASHES)
        ).alias("pos"),
    )
    inserted = (
        probes.filter("actually_seen")
        .select("shard", "pos")
        .distinct()
        .withColumn("_set", F.lit(1).cast("long"))
    )
    return (
        probes.join(inserted, ["shard", "pos"], "left")
        .groupBy("o_orderkey", "actually_seen")
        .agg(F.sum(F.coalesce("_set", F.lit(0))).cast("long").alias("_m"))
        .select(
            "o_orderkey",
            "actually_seen",
            (F.col("_m") == BLOOM_Q_HASHES).alias("bloom_hit"),
            (
                (F.col("_m") == BLOOM_Q_HASHES) & ~F.col("actually_seen")
            ).alias("false_positive"),
        )
    )


def _u4_sql() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    hfp = h64_duckdb("fp")
    pos_list = ", ".join(
        f"('0x' || substring(fp, {1 + 8 * i}, 8))::BIGINT % {BLOOM_Q_BITS}"
        for i in range(BLOOM_Q_HASHES)
    )
    return f"""
WITH base AS (
  SELECT o_orderkey,
         sha256('http://h' || (o_custkey % 50) || '.test/o' || o_orderkey)
           AS fp,
         (o_orderkey % 2 = 0) AS actually_seen
  FROM orders
), probes AS (
  SELECT o_orderkey, actually_seen,
         ({hfp}) % {BLOOM_Q_SHARDS} AS shard,
         unnest([{pos_list}]) AS pos
  FROM base
), ins AS (
  SELECT DISTINCT shard, pos FROM probes WHERE actually_seen
)
SELECT p.o_orderkey, p.actually_seen,
       (count(i.pos) = {BLOOM_Q_HASHES}) AS bloom_hit,
       (count(i.pos) = {BLOOM_Q_HASHES} AND NOT p.actually_seen)
         AS false_positive
FROM probes p
LEFT JOIN ins i ON i.shard = p.shard AND i.pos = p.pos
GROUP BY 1, 2
"""


U4_SQL = _u4_sql()


# --- A9: per-host latency percentiles -----------------------------------------
# The reference reports min/max/avg fetch time (src/stats.rs timing
# block — the A3 operator); an operator at 1000-executor scale reports
# tail latency per host (p50/p95/p99), the number politeness budgets and
# timeout tuning actually act on. EXACT type-1 percentiles, same
# machinery as text_length_quantiles: the corpus pass is one combinable
# groupBy(host, ms) histogram, so the cumulative window runs over the
# bounded (host × distinct-ms) aggregate, never the observation stream.
# Latency fixture: ms = floor(value · 100) from events (floor, not cast:
# Spark's double→long cast truncates while DuckDB's rounds — floor is
# identical in both).
A9_PCTS = [50, 95, 99]


def a9_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        F.concat(
            F.lit("h"), (F.col("user_id") % 20).cast("string"), F.lit(".test")
        ).alias("host"),
        F.floor(F.col("value") * 100).cast("long").alias("ms"),
    )
    hist = e.groupBy("host", "ms").agg(F.count("*").cast("long").alias("c"))
    w = Window.partitionBy("host").orderBy("ms")
    cum = hist.select(
        "host",
        "ms",
        F.sum("c").over(w).cast("long").alias("cum"),
        F.sum("c").over(
            Window.partitionBy("host").rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("n_obs"),
    )
    pcts = spark.createDataFrame([(p,) for p in A9_PCTS], "pct long")
    return (
        cum.crossJoin(F.broadcast(pcts))
        .filter(F.col("cum") * 100 >= F.col("pct") * F.col("n_obs"))
        .groupBy("host", "pct")
        .agg(
            F.min("ms").cast("long").alias("q_ms"),
            F.max("n_obs").cast("long").alias("n_obs"),
        )
        .select("host", "pct", "n_obs", "q_ms")
    )


_A9_PCT_VALUES = ", ".join(f"({p})" for p in A9_PCTS)
A9_SQL = f"""
WITH e AS (
  SELECT 'h' || (user_id % 20) || '.test' AS host,
         floor(value * 100)::BIGINT AS ms
  FROM events
), hist AS (
  SELECT host, ms, count(*)::BIGINT AS c FROM e GROUP BY 1, 2
), cum AS (
  SELECT host, ms,
         sum(c) OVER (PARTITION BY host ORDER BY ms)::BIGINT AS cum,
         sum(c) OVER (PARTITION BY host)::BIGINT AS n_obs
  FROM hist
), pcts(pct) AS (VALUES {_A9_PCT_VALUES})
SELECT host, pct::BIGINT AS pct, max(n_obs)::BIGINT AS n_obs,
       min(ms)::BIGINT AS q_ms
FROM cum CROSS JOIN pcts
WHERE cum * 100 >= pct * n_obs
GROUP BY 1, 2
"""


F8_SQL = f"""
WITH per_url AS (
  SELECT 'h' || (l_suppkey % 24) || '.test' AS host,
         len(segs)::BIGINT AS depth,
         (len(segs) - len(list_distinct(segs)))::BIGINT AS redundancy
  FROM (
    SELECT l_suppkey,
           [('s' || ((l_orderkey + i) % 4))
            for i in range(1, 2 + l_orderkey % (2 + (l_suppkey % 24) % 7))]
             AS segs
    FROM lineitem
  )
), agg AS (
  SELECT host, count(*)::BIGINT AS n_urls,
         sum(depth)::BIGINT AS _sd,
         sum(CASE WHEN redundancy >= 2 THEN 1 ELSE 0 END)::BIGINT AS _nl
  FROM per_url GROUP BY 1
)
SELECT host, n_urls,
       ((1000 * _sd) // n_urls)::BIGINT AS depth_milli,
       ((1000 * _nl) // n_urls)::BIGINT AS loopy_milli,
       ((1000 * _nl) // n_urls >= {TRAP_LOOPY_MILLI}
        OR (1000 * _sd) // n_urls >= {TRAP_DEPTH_MILLI}) AS is_trap
FROM agg
"""


# --- U5: cuckoo-filter membership under deletion -------------------------------
# Relational certification of the cuckoo seen-tier (operators/cuckoo.py;
# Fan et al. 2014): by placement independence (module docstring there),
# probe(x) hits iff an ALIVE entry shares x's (canonical bucket pair,
# tag), where alive = multiset inserts − deletes. That is a groupBy +
# equi-join in both engines — the relational twin of the numpy filter,
# exactly the u4 pattern for the Bloom tier. Deletion is the point: the
# fixture deletes a subset of inserted URLs (recrawl eviction) and the
# output certifies (a) deleted keys no longer hit, (b) alive keys are
# NEVER missed (no false negatives — `missed` must be all-false), and
# (c) the residual false-positive set is exactly the tag+pair collision
# set, which the oracle reproduces bit-for-bit.
# power of 2 (XOR alt-bucket stays in range). Deliberately SMALL for the
# registered fixture so the tag+pair collision branch (false_positive)
# carries real rows at the driver's sf0.01 (~13 expected FPs at 64
# buckets) instead of hash-matching vacuously — the r3 lesson. The
# relational form has no capacity limit; production sizing lives in
# operators/cuckoo.buckets_for.
CUCKOO_Q_BUCKETS = 64


def u5_cuckoo_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spider_core_spark.operators.cuckoo import (
        cuckoo_alt_col,
        cuckoo_bucket_col,
        cuckoo_tag_col,
    )

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.sha2(
            F.concat(
                F.lit("http://h"),
                (F.col("o_custkey") % 50).cast("string"),
                F.lit(".test/o"),
                F.col("o_orderkey").cast("string"),
            ),
            256,
        ).alias("fp"),
        (F.col("o_orderkey") % 3 != 2).alias("inserted"),
        (F.col("o_orderkey") % 6 == 0).alias("deleted"),  # ⊂ inserted
    )
    i1 = cuckoo_bucket_col(F.col("fp"), CUCKOO_Q_BUCKETS)
    tag = cuckoo_tag_col(F.col("fp"))
    i2 = cuckoo_alt_col(i1, tag, CUCKOO_Q_BUCKETS)
    keyed = base.select(
        "o_orderkey",
        "inserted",
        "deleted",
        F.least(i1, i2).alias("pmin"),
        tag.alias("tag"),
    )
    alive = (
        keyed.filter("inserted")
        .groupBy("pmin", "tag")
        .agg(
            (
                F.count("*") - F.sum(F.col("deleted").cast("long"))
            ).alias("_alive")
        )
        .filter(F.col("_alive") > 0)
        .select("pmin", "tag", F.lit(True).alias("_hit"))
    )
    return (
        keyed.join(alive, ["pmin", "tag"], "left")
        .select(
            "o_orderkey",
            "inserted",
            "deleted",
            F.coalesce("_hit", F.lit(False)).alias("cuckoo_hit"),
            (
                F.coalesce("_hit", F.lit(False))
                & ~(F.col("inserted") & ~F.col("deleted"))
            ).alias("false_positive"),
            (
                ~F.coalesce("_hit", F.lit(False))
                & (F.col("inserted") & ~F.col("deleted"))
            ).alias("missed"),
        )
    )


def _u5_sql() -> str:
    from spider_core_spark.operators.cuckoo import (
        cuckoo_alt_duckdb,
        cuckoo_bucket_duckdb,
        cuckoo_tag_duckdb,
    )

    i1 = cuckoo_bucket_duckdb("fp", CUCKOO_Q_BUCKETS)
    tag = cuckoo_tag_duckdb("fp")
    i2 = cuckoo_alt_duckdb("i1", "tag", CUCKOO_Q_BUCKETS)
    return f"""
WITH base AS (
  SELECT o_orderkey,
         sha256('http://h' || (o_custkey % 50) || '.test/o' || o_orderkey)
           AS fp,
         (o_orderkey % 3 <> 2) AS inserted,
         (o_orderkey % 6 = 0) AS deleted
  FROM orders
), keyed AS (
  SELECT o_orderkey, inserted, deleted,
         least(i1, {i2}) AS pmin, tag
  FROM (
    SELECT o_orderkey, inserted, deleted,
           {i1} AS i1, {tag} AS tag
    FROM base
  )
), alive AS (
  SELECT pmin, tag
  FROM keyed
  WHERE inserted
  GROUP BY pmin, tag
  HAVING count(*) - sum(CASE WHEN deleted THEN 1 ELSE 0 END) > 0
)
SELECT k.o_orderkey, k.inserted, k.deleted,
       (a.pmin IS NOT NULL) AS cuckoo_hit,
       ((a.pmin IS NOT NULL) AND NOT (k.inserted AND NOT k.deleted))
         AS false_positive,
       ((a.pmin IS NULL) AND (k.inserted AND NOT k.deleted)) AS missed
FROM keyed k
LEFT JOIN alive a ON a.pmin = k.pmin AND a.tag = k.tag
"""


U5_SQL = _u5_sql()


# --- J6: redirect-chain resolution (pointer doubling) ----------------------
# The reference crawler has no redirect support (no 3xx handling anywhere
# in /root/reference/src — request_handler.rs treats every response as
# final), so this is a beyond-reference crawl operator: resolve each
# redirect source to its final destination, following chains up to
# REDIR_MAX_HOPS and refusing cycles / over-long chains (a browser-style
# "too many redirects" failure).
#
# Scale shape: the naive walk is REDIR_MAX_HOPS sequential joins; this
# uses POINTER DOUBLING instead — each round composes the partial
# resolution with itself (f -> f∘f), so cur advances 1,2,4,8,... hops and
# ceil(log2(MAX_HOPS+1))+1 rounds of ordinary shuffle equi-joins on `cur`
# suffice for any input (3 rounds at MAX_HOPS=6; 5 at the browser-ish 20).
# At a 10^10-edge redirect table every round is one standard key-partition
# shuffle — no driver state, no per-row iteration, and skew on a hot
# redirect TARGET stays join-skew that AQE splits. A node stops moving
# the round after it lands on a terminal (terminals have no row in the
# mapping side), so late rounds shrink to the unresolved remainder.
#
# Fixture: a deterministic functional graph on range(REDIR_N) (same
# no-external-data contract as the mm_* oracles) — node k redirects to
# k-1 unless k % 10 == 0 (terminals), giving chains of length k % 10 (up
# to 9 > MAX_HOPS, so over-long chains are exercised), with 2-cycles
# spliced in at k % 1000 in {1,2} for k >= 1000 (cycle refusal
# exercised). Sentinels, not NULLs: final_url='' and hops=-1 on failure.
REDIR_N = 5000
REDIR_MAX_HOPS = 6
REDIR_HOSTS = 40


def _redir_url(col):
    return F.concat(
        F.lit("http://h"),
        (col % REDIR_HOSTS).cast("string"),
        F.lit(".test/r/"),
        col.cast("string"),
    )


def _redirect_edges(spark) -> DataFrame:
    k = F.col("id").cast("long")
    dst = (
        F.when((k % 1000 == 1) & (k >= 1000), k + 1)
        .when((k % 1000 == 2) & (k >= 1000), k - 1)
        .when(k % 10 != 0, k - 1)
    )
    return (
        spark.range(REDIR_N)
        .select(k.alias("src"), dst.alias("dst"))
        .filter(F.col("dst").isNotNull())
    )


def j6_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _redirect_edges(spark)
    # p: src has advanced to cur in hops steps (f^(2^i) after round i)
    p = edges.select(
        "src", F.col("dst").alias("cur"), F.lit(1).cast("long").alias("hops")
    )
    rounds = max(1, (REDIR_MAX_HOPS + 1).bit_length())  # 2^rounds > MAX_HOPS
    for _ in range(rounds):
        q = p.select(
            F.col("src").alias("q_src"),
            F.col("cur").alias("q_cur"),
            F.col("hops").alias("q_hops"),
        )
        p = (
            p.join(q, p.cur == q.q_src, "left")
            .select(
                "src",
                F.coalesce("q_cur", "cur").alias("cur"),
                (
                    F.col("hops")
                    + F.coalesce(F.col("q_hops"), F.lit(0))
                ).alias("hops"),
            )
        )
    srcs = edges.select(F.col("src").alias("cur")).distinct()
    out = (
        p.join(srcs, "cur", "left_anti")  # terminal: cur has no out-edge
        .filter(F.col("hops") <= REDIR_MAX_HOPS)
        .select(
            "src",
            _redir_url(F.col("cur")).alias("final_url"),
            F.col("hops").cast("int").alias("hops"),
        )
    )
    return (
        _redirect_edges(spark)
        .select("src")
        .join(out, "src", "left")
        .select(
            _redir_url(F.col("src")).alias("src_url"),
            F.coalesce("final_url", F.lit("")).alias("final_url"),
            F.coalesce("hops", F.lit(-1)).cast("int").alias("hops"),
            (F.col("final_url").isNotNull()).alias("resolved"),
        )
    )


def _j6_sql() -> str:
    url = (
        f"'http://h' || (%s %% {REDIR_HOSTS})::VARCHAR || '.test/r/' "
        "|| (%s)::VARCHAR"
    )
    return f"""
WITH RECURSIVE edges AS (
  SELECT k AS src,
         CASE WHEN k % 1000 = 1 AND k >= 1000 THEN k + 1
              WHEN k % 1000 = 2 AND k >= 1000 THEN k - 1
              WHEN k % 10 <> 0 THEN k - 1 END AS dst
  FROM (SELECT range AS k FROM range({REDIR_N}))
  WHERE (k % 1000 = 1 AND k >= 1000) OR (k % 1000 = 2 AND k >= 1000)
        OR k % 10 <> 0
), walk(src, cur, hops) AS (
  SELECT src, dst, 1 FROM edges
  UNION ALL
  SELECT w.src, e.dst, w.hops + 1
  FROM walk w JOIN edges e ON e.src = w.cur
  WHERE w.hops <= {REDIR_MAX_HOPS}
), resolved AS (
  SELECT src, cur, hops FROM walk
  WHERE hops <= {REDIR_MAX_HOPS}
    AND cur NOT IN (SELECT src FROM edges)
)
SELECT {url % ('e.src', 'e.src')} AS src_url,
       coalesce({url % ('r.cur', 'r.cur')}, '') AS final_url,
       coalesce(r.hops, -1)::INT AS hops,
       (r.cur IS NOT NULL) AS resolved
FROM edges e LEFT JOIN resolved r ON r.src = e.src
"""


J6_SQL = _j6_sql()


# --- J7: content-mirror detection (canonical URL election) -----------------
# A crawl of the same corpus through different URL spellings (www vs
# apex, tracking/session query params, http vs https mirrors) yields
# byte-identical bodies under distinct URLs. The frontier dedups by URL
# fingerprint, so these all fetch; the CONTENT layer must then elect one
# canonical URL per body and alias the rest — both to stop re-enqueueing
# known mirrors (feed the alias map to the canonicalizer) and to keep
# one copy in the corpus. Shape: one sha256 per body (map-side, no
# shuffle), one groupBy(content fp) min() for the canonical election,
# one broadcast-or-shuffle self-join to emit alias rows — all combinable
# aggregates, no windows, so it holds at 10^10 pages.
#
# Fixture: the documents table with URL variants exploded
# deterministically per doc (every doc gets its base URL; doc_id % 5 == 0
# adds a ?session= variant, doc_id % 7 == 0 adds a www. mirror), plus
# the corpus's own exact-dup texts (different doc_id, same body) which
# also collapse — exactly like real mirrored pages.
def _j7_variants(docs: DataFrame) -> DataFrame:
    base = F.concat(
        F.lit("http://d"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".test/doc/"),
        F.col("doc_id").cast("string"),
    )
    session = F.concat(
        base, F.lit("?session="), (F.col("doc_id") * 2654435761).cast("string")
    )
    www = F.concat(
        F.lit("http://www.d"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".test/doc/"),
        F.col("doc_id").cast("string"),
    )
    urls = F.array_compact(
        F.array(
            base,
            F.when(F.col("doc_id") % 5 == 0, session),
            F.when(F.col("doc_id") % 7 == 0, www),
        )
    )
    return docs.select(
        F.explode(urls).alias("url"),
        F.sha2(F.col("text"), 256).alias("content_fp"),
    )


def j7_mirror_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = _j7_variants(_t(spark, sf_dir, "documents"))
    canon = pages.groupBy("content_fp").agg(
        F.min("url").alias("canonical_url"),
        F.count("*").cast("long").alias("n_mirrors"),
    )
    return (
        pages.join(canon, "content_fp")
        .filter(F.col("url") != F.col("canonical_url"))
        .select(
            F.col("url").alias("alias_url"),
            "canonical_url",
            "content_fp",
            "n_mirrors",
        )
    )


J7_SQL = """
WITH pages AS (
  SELECT unnest(list_filter([
           'http://d' || (doc_id % 50)::VARCHAR || '.test/doc/'
             || doc_id::VARCHAR,
           CASE WHEN doc_id % 5 = 0 THEN
             'http://d' || (doc_id % 50)::VARCHAR || '.test/doc/'
               || doc_id::VARCHAR || '?session='
               || (doc_id * 2654435761)::VARCHAR END,
           CASE WHEN doc_id % 7 = 0 THEN
             'http://www.d' || (doc_id % 50)::VARCHAR || '.test/doc/'
               || doc_id::VARCHAR END
         ], x -> x IS NOT NULL)) AS url,
         sha256(text) AS content_fp
  FROM documents
), canon AS (
  SELECT content_fp, min(url) AS canonical_url,
         count(*)::BIGINT AS n_mirrors
  FROM pages GROUP BY content_fp
)
SELECT p.url AS alias_url, c.canonical_url, p.content_fp, c.n_mirrors
FROM pages p JOIN canon c USING (content_fp)
WHERE p.url <> c.canonical_url
"""
