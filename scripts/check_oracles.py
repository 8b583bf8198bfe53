"""Local replica of the driver's correctness harness: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB — row count,
schema, and order-insensitive value hash (columns sorted by name).

Usage: python scripts/check_oracles.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        d[c] = d[c].map(lambda v: repr(v))
    rows = sorted(d.apply(lambda r: "\x1f".join(r), axis=1))
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def norm_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        if out[c].dtype == "object":
            continue
        if str(out[c].dtype).startswith("datetime"):
            out[c] = out[c].astype("datetime64[us]")
        elif out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
        elif out[c].dtype.kind == "f":
            out[c] = out[c].astype("float64")
        elif out[c].dtype.kind == "b":
            out[c] = out[c].astype("bool")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_oracles")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = norm_pdf(sdf.toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spdf)} rows)")
            n_pass += 1
            continue
        try:
            opdf = norm_pdf(con.sql(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rowcount {len(spdf)} vs {len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(f"schema {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
        elif value_hash(spdf) != value_hash(opdf):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems and len(spdf) == len(opdf):
                cols = sorted(spdf.columns)
                a = spdf[cols].sort_values(cols).reset_index(drop=True)
                b = opdf[cols].sort_values(cols).reset_index(drop=True)
                diff = (a != b) & ~(a.isna() & b.isna())
                idx = diff.any(axis=1)
                print(a[idx].head(3))
                print(b[idx].head(3))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spdf)} rows)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
