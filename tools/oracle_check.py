#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(views over the sfDir parquet tables), load the Spark result parquet,
sort columns by name, sort rows, and compare cell values.
Floats compare exactly after round-trip through repr (both engines emit
IEEE doubles; our queries round/decimal-sum so they must be identical).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to comparable primitives
    def fix(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(fix(x) for x in v)
        if isinstance(v, float):
            return float(v)
        if isinstance(v, (int,)):
            return int(v)
        try:
            import numpy as np
            if isinstance(v, np.integer):
                return int(v)
            if isinstance(v, np.floating):
                return float(v)
            if isinstance(v, np.bool_):
                return bool(v)
        except ImportError:
            pass
        return v
    rows = [tuple(fix(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows, list(df.columns)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        o_rows, o_cols = canon(oracle_df)
        s_rows, s_cols = canon(spark_df)
        if o_cols != s_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        bad = [(i, s, o) for i, (s, o) in enumerate(zip(s_rows, o_rows)) if s != o]
        if bad:
            i, s, o = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; first at {i}:\n  spark={s}\n  oracle={o}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    # queries without an oracle: rows-only check
    import os
    declared = {d for d in os.listdir(out_dir) if d.startswith("q")}
    for name in sorted(declared - set(oracles)):
        try:
            n = len(pd.read_parquet(f"{out_dir}/{name}"))
            print(f"ROWS {name}: {n} rows (no oracle)")
        except Exception as e:
            print(f"FAIL {name}: unreadable: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracles)} oracled")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
