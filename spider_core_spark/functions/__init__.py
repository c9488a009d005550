from spider_core_spark.functions import hashing, url, textextract  # noqa: F401
