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
