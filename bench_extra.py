#!/usr/bin/env python
"""Supplementary measurements for OPTIMIZATION_r06.md — NOT the graded
bench (bench.py is frozen; the driver times that). Three probes, all
noop-sink isolated (guide §1.4):

  python bench_extra.py tax      # serial per-task cost of Python-runner
                                 # stages: identity pandas UDF over
                                 # 8..256 partitions of 120k longs
  python bench_extra.py codecs   # single-threaded codec kernel times
                                 # (encode+decode per payload family)
  python bench_extra.py queries  # best-of-3 noop timings of the bench
                                 # queries (same methodology as bench.py,
                                 # usable mid-session for A/B work)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time


def _spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tesserocr_spark_bench_extra")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _best(fn, reps=3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def probe_task_tax(cpus: int) -> None:
    """Wall time of an identity pandas UDF vs task count: the slope is the
    SERIAL per-task launch/handshake cost of a Python-runner stage (it
    does not parallelize away — measured ~7 ms/task on this box), the
    number that set the r06 partitioning defaults."""
    import pandas as pd
    from pyspark.sql import functions as F

    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    @F.pandas_udf("long")
    def ident(x: pd.Series) -> pd.Series:
        return x

    for parts in (8, 32, 64, 128, 256):
        df = spark.range(0, 120000, 1, parts)
        _noop(df.select(ident("id")))  # warm
        spark.sparkContext.setJobDescription(f"ident udf {parts} parts")
        t = _best(lambda df=df: _noop(df.select(ident("id"))), reps=5)
        print(f"ident_udf parts={parts:3d}: {t:.3f}s")
    spark.stop()


def probe_codecs() -> None:
    """Single-threaded encode+decode kernel cost per payload family (no
    Spark): the number the r06 codec vectorization moved."""
    import pandas as pd

    from tesserocr_spark import multimodal as mm

    ids = pd.DataFrame({"doc_id": range(2000)})
    pairs = {
        "jpeg": (mm.synth_jpeg_full_map, mm.jpeg_stats_map),
        "gif": (mm.synth_gif_map, mm.gif_stats_map),
        "tiff": (mm.synth_tiff_map, mm.tiff_stats_map),
        "pnm": (mm.synth_pnm_map, mm.pnm_stats_map),
    }
    for name, (syn, st) in pairs.items():
        def run():
            for pl in syn(iter([ids])):
                for _ in st(iter([pl])):
                    pass
        run()  # warm caches
        t = _best(run, reps=3)
        print(f"codec {name}: {t:.3f}s / 2000 payloads "
              f"({t / 2000 * 1e6:.0f} us/payload)")


def probe_queries(cpus: int, sf_dir: str) -> None:
    """Best-of-3 noop timings of the bench-timed queries — bench.py's
    methodology, runnable mid-session for before/after A/B."""
    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from tesserocr_spark.queries import QUERIES

    for q in (
        "dedup_minhash_lsh", "dedup_simhash64", "dedup_campaign_keep_lsh",
        "multimodal_decode", "multimodal_pixels", "multimodal_gif",
        "multimodal_jpeg", "multimodal_tiff", "dedup_substrings",
        "ann_bruteforce_topk", "q1_flagship_agg", "revenue_by_nation",
    ):
        _noop(QUERIES[q](spark, sf_dir))  # warm
        spark.sparkContext.setJobDescription(q)
        t = _best(lambda q=q: _noop(QUERIES[q](spark, sf_dir)))
        print(f"{q}: {t:.3f}s")
    spark.stop()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if mode == "tax":
        probe_task_tax(cpus)
    elif mode == "codecs":
        probe_codecs()
    else:
        probe_queries(cpus, sf_dir)


if __name__ == "__main__":
    main()
