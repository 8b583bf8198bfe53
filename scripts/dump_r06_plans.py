"""Dump .explain('formatted') for bench queries -> plans/r06/<q>_<tag>.txt.

Usage: python scripts/dump_r06_plans.py <tag> [query ...]
With no query args, dumps every bench-timed query plus the extract_* paths.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = "/root/testdata/sf0.001"
    from pyspark.sql import functions as F

    from tesserocr_spark.api import (
        extract_pages,
        extract_spans_long,
        extract_text_only,
    )
    from tesserocr_spark.config import ExtractorConfig
    from tesserocr_spark.pages import pages_from_documents
    from tesserocr_spark.queries import QUERIES

    pages = pages_from_documents(spark, sf)
    nosym = ExtractorConfig(variables={"emit_symbols": "0"})
    targets = {
        "extract_text": lambda: extract_text_only(pages),
        "extract_full": lambda: extract_pages(pages, nosym),
        "extract_flat": lambda: extract_spans_long(pages, nosym)
        .groupBy("level")
        .count(),
        "spans_agg": lambda: extract_spans_long(pages_from_documents(spark, sf))
        .groupBy("url", "level")
        .count(),
    }
    for q in (
        "dedup_minhash_lsh",
        "dedup_simhash64",
        "dedup_campaign_keep_lsh",
        "multimodal_decode",
        "multimodal_pixels",
        "multimodal_gif",
        "multimodal_jpeg",
        "multimodal_tiff",
        "dedup_substrings",
        "ann_bruteforce_topk",
        "q1_flagship_agg",
        "revenue_by_nation",
    ):
        targets[q] = lambda q=q: QUERIES[q](spark, sf)

    outdir = os.path.join(REPO, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name, thunk in targets.items():
        if only and name not in only:
            continue
        df = thunk()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue().rstrip() + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
