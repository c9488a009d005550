"""Cache discipline: a long pipelined crawl must not accumulate persisted
DataFrames (VERDICT r2 "What's wrong #3" — run_pipelines persisted items
and every per-pipeline output each epoch and never released them)."""

from spider_core_spark import schemas
from spider_core_spark.api.pipeline import (
    DedupeItemsPipeline,
    FieldFilterPipeline,
)
from spider_core_spark.api.spider import Spider
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.plans.engine import CrawlEngine
from spider_core_spark.sources import sitegen


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_no_cache_growth_over_pipelined_crawl(spark, tmp_path):
    rows = sitegen.gen_pages_rows(range(300), 300, 4, 7)
    pages_df = spark.createDataFrame(rows, schemas.PAGES)
    seeds = [s["url"] for s in sitegen.gen_seeds(4)]

    before = _n_cached(spark)
    cfg = CrawlConfig(
        workdir=str(tmp_path / "run"),
        max_epochs=10,
        max_wave_size=30,  # stretch the crawl across many epochs
        use_robots=False,
        use_bloom=False,
        detailed_metrics=True,  # per-pipeline A7 mode = one persist per stage
    )
    eng = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        cfg,
        pipelines=[
            FieldFilterPipeline("n_links >= 0"),
            DedupeItemsPipeline(key="url", state_dir=str(tmp_path / "dd")),
        ],
    )
    res = eng.run(pages_df, robots=None)
    assert res.epochs_run >= 5  # the crawl actually looped
    assert res.totals["items_processed"] > 0

    after = _n_cached(spark)
    assert after - before <= 0, (
        f"cache grew by {after - before} persisted DataFrames over "
        f"{res.epochs_run} epochs"
    )


def test_textops_staged_caches_released(spark):
    """VERDICT r3 #3/#4: the textops staged digest/band frames (and
    neardup_clusters' inherited + localCheckpoint caches) must not
    accumulate across repeated invocations — the caller-release contract
    is td.release_staged_caches() after each terminal action."""
    from spider_core_spark.textops import analysis as ta
    from spider_core_spark.textops import dedup as td

    sf = "/root/testdata/sf0.001"
    before = _n_cached(spark)
    for _ in range(2):
        td.minhash_pairs(spark, sf).count()
        td.ngram_jaccard_pairs(spark, sf).count()
        td.ngram_jaccard_pairs_exact(spark, sf).count()
        td.simhash_pairs(spark, sf).count()
        td.neardup_clusters(spark, sf).count()
        ta.corpus_keepers_neardup(spark, sf).count()
        released = td.release_staged_caches()
        assert released > 0  # the ops really do stage caches
        assert _n_cached(spark) - before <= 0, (
            "textops staged caches leaked after release"
        )
