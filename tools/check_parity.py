"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
count, schema width, and an order-insensitive value hash.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from relationextractionpipeline_spark.operators import cache  # noqa: E402
from relationextractionpipeline_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None or v != v:  # NaN
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        "|".join(norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # point the materialization-backed oracles at the same scale
    os.environ["REX_ORACLE_SF_DIR"] = sf_dir
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        finally:
            # per-query persist() scope + checkpoint tails (clearCache alone
            # never frees localCheckpoint blocks — they are RDD-owned)
            spark.catalog.clearCache()
            cache.release_all(checkpoints=True)
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows, {len(sdf.columns)} cols "
                  f"({dt:.1f}s) [rows-only]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(map(str.lower, sdf.columns)) == sorted(
            map(str.lower, odf.columns)
        )
        odf.columns = [c.lower() for c in odf.columns]
        sdf.columns = [c.lower() for c in sdf.columns]
        hs, ho = value_hash(sdf), value_hash(odf)
        ok = ok_rows and ok_cols and hs == ho
        status = "OK   " if ok else "FAIL "
        if not ok:
            failures.append(name)
        print(
            f"{status}{name}: spark={len(sdf)}r/{hs} duckdb={len(odf)}r/{ho} "
            f"({dt:.1f}s)"
        )
        if not ok and len(sdf) < 50 and len(odf) < 50:
            cols = sorted(sdf.columns)
            print("  spark:", sdf[cols].sort_values(cols).head(10).to_dict("records")[:5])
            print("  duck :", odf[cols].sort_values(cols).head(10).to_dict("records")[:5])
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
