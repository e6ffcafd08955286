#!/usr/bin/env python3
"""Local dev mirror of the driver's t2 correctness gate.

Usage: tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB against the same sfDir
tables, and compares: columns sorted by name, rows sorted, values compared
exactly (floats reported with max abs diff when not exact).

Dev-only tool (driver-side python deps); not part of the shipped library.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np
import pyarrow.parquet as pq
import pyarrow as pa

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif isinstance(df[c].dtype, object.__class__) and df[c].dtype == object:
            pass
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # engine-version stamp (round-7 verdict ask): a hash mismatch between
    # two runs must be attributable to an engine-version delta in one read
    print(f"ENV  duckdb={duckdb.__version__} pandas={pd.__version__} "
          f"numpy={np.__version__}")
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # Verify emits each entry under both `<name>` and `<name>.parquet`
    # (driver-handoff redundancy); keep the bare form only.
    oracles = {k[:-len(".parquet")] if k.endswith(".parquet") else k: v
               for k, v in oracles.items()}
    n_ok = n_bad = 0
    for name in sorted(oracles):
        sql = oracles[name]
        pdir = os.path.join(out_dir, name + ".parquet")
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        # Physical-schema scan via pyarrow: the driver reads the Spark
        # parquet with pyarrow, where decimal128 columns surface as
        # decimal.Decimal objects and stringify "561405" — but the DuckDB
        # oracle side reaches the driver as float64 "561405.0", so the
        # stringify-hash FAILS even when the values are exactly equal
        # (q290 r7+r9, q330, q357). Reading both sides through DuckDB
        # (below) collapses both to float64 and cannot see this; catch it
        # here. Rule: final output columns must be int/float/string/date,
        # never decimal.
        dec_cols = [f.name for f in pq.read_schema(files[0])
                    if pa.types.is_decimal(f.type)]
        if dec_cols:
            print(f"FAIL {name}: decimal128 on the wire: {dec_cols} — the "
                  f"driver hash stringifies Spark decimals without '.0'; "
                  f"cast to BIGINT or DOUBLE")
            n_bad += 1
            continue
        try:
            got = canon(con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_bad += 1; continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            # The driver's hash stringifies values, so an int64-vs-float64
            # column pair ("123" vs "123.0") is a driver FAIL even when the
            # numbers are equal. DuckDB sum(BIGINT) returns HUGEINT (-> float64
            # in pandas) — oracles must CAST such sums. Mirror that strictness.
            if pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b):
                bad_cols.append(
                    f"{c} (dtype kind mismatch: spark {a.dtype} vs oracle {b.dtype}"
                    f" — driver hash stringifies; CAST the oracle column)")
                continue
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                av = a.astype(float).to_numpy(); bv = b.astype(float).to_numpy()
                both_nan = np.isnan(av) & np.isnan(bv)
                eq = (av == bv) | both_nan
                if not eq.all():
                    d = np.nanmax(np.abs(np.where(eq, 0, av - bv)))
                    bad_cols.append(f"{c} (maxdiff={d:.3e}, n={int((~eq).sum())})")
            else:
                av = a.astype(str); bv = b.astype(str)
                if not (av == bv).all():
                    i = int(np.argmax((av != bv).to_numpy()))
                    bad_cols.append(f"{c} (row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r})")
        if bad_cols:
            print(f"FAIL {name}: value mismatch: {'; '.join(bad_cols)}"); n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)"); n_ok += 1
    # queries without oracle
    declared = set(oracles)
    for d in sorted(os.listdir(out_dir)):
        name = d[:-len(".parquet")] if d.endswith(".parquet") else d
        if os.path.isdir(os.path.join(out_dir, d)) and name not in declared:
            print(f"INFO {name}: no oracle (rows-only check)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
