"""Simulate the driver's correctness gate locally.

Runs every ``queries()`` entry from ``__spark_entry__.py`` at sf0.01 on
Spark AND its ``oracle_sql()`` on DuckDB over the same parquet, then
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, floats rounded to 9 significant-ish
decimals before hashing — mirroring the driver's posture).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        elif str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def value_hash(pdf: pd.DataFrame) -> str:
    body = pdf.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.sha256(body).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    only = set(sys.argv[2:])

    import __spark_entry__ as contract
    from accelerating_tc_spark.session import get_spark

    spark = get_spark("check_contract", cores=8, shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = contract.queries()
    oracles = contract.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        spark_pdf = norm_frame(fn(spark, sf_dir).toPandas())
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows={len(spark_pdf):7d}  (rows-only, no oracle)  {t_spark:5.1f}s")
            continue
        oracle_pdf = norm_frame(con.execute(oracles[name]).fetchdf())
        ok_rows = len(spark_pdf) == len(oracle_pdf)
        ok_cols = list(spark_pdf.columns) == list(oracle_pdf.columns)
        h_s, h_o = value_hash(spark_pdf), value_hash(oracle_pdf)
        ok_hash = h_s == h_o
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{name:28s} {status} rows={len(spark_pdf):7d}/{len(oracle_pdf):<7d} "
            f"cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else f'{h_s}!={h_o}'} {t_spark:5.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"  spark cols : {list(spark_pdf.columns)}")
                print(f"  oracle cols: {list(oracle_pdf.columns)}")
            if not ok_hash and ok_cols:
                print("  spark head:\n", spark_pdf.head(3))
                print("  oracle head:\n", oracle_pdf.head(3))
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
