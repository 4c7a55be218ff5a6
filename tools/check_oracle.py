"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf directory, then compares row count, column-name set and
(order-insensitively) the values — exact string equality after canonical
formatting, which is stricter than any plausible driver hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.map(lambda v: "null" if pd.isna(v) else f"{v:.9g}")
        elif s.dtype.kind in "iu":
            out[c] = s.map(lambda v: str(int(v)))
        else:
            out[c] = s.map(lambda v: "null" if v is None or (isinstance(v, float) and np.isnan(v)) else str(v))
    c = pd.DataFrame(out)
    return c.sort_values(by=list(c.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from sensordatapipelines_spark import get_spark

    spark = get_spark(shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} duck={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} duck={sorted(odf.columns)}")
        if not problems:
            cs, co = canon(sdf), canon(odf)
            if not cs.equals(co):
                neq = (cs != co).any(axis=1)
                idx = list(cs.index[neq])[:3]
                detail = [
                    f"row {i}: spark={cs.loc[i].to_dict()} duck={co.loc[i].to_dict()}"
                    for i in idx
                ]
                problems.append(f"{int(neq.sum())} mismatched rows; " + " | ".join(detail))
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
