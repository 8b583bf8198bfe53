"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full extraction pipeline over pages derived
from sf0.001 documents. ``queries()`` / ``oracle_sql()`` — the operator
registry from SURVEY.md §2 (tesserocr_spark.queries), each Spark
implementation paired with a DuckDB-runnable ANSI-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: html -> main-content
    extraction (the image_to_text analogue) with spans + OSD + metrics."""
    from tesserocr_spark.api import extract_pages
    from tesserocr_spark.pages import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    docs = extract_pages(pages)
    return docs.select(
        "url",
        "extracted_text",
        F.size("spans").alias("n_spans"),
        F.col("osd.script_name").alias("script"),
        F.col("metrics.n_words").alias("n_words"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tesserocr_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tesserocr_spark.queries import ORACLES

    return dict(ORACLES)
