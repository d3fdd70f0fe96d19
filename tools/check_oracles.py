"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, compares row counts + column names + order-insensitive values.
Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def normalize(df):
    import pandas as pd

    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        out[c] = out[c].map(lambda v: repr(v))
    rows = sorted(map(tuple, out.itertuples(index=False, name=None)))
    return cols, rows


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        scols, srows = normalize(sdf)
        ocols, orows = normalize(odf)
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} != {ocols}")
            failures += 1
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            failures += 1
        elif srows != orows:
            diff = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            print(f"FAIL {name}: values differ, first diffs: {diff}")
            failures += 1
        else:
            print(f"OK {name}: {len(srows)} rows match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
