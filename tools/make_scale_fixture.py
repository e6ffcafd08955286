#!/usr/bin/env python3
"""Synthesize a 10x scale fixture from /root/testdata/sf0.1 (round-11
verdict item 6: the 100 TB design claims were extrapolated, never
sampled). Ten replicas of every scaling table are unioned with entity
keys offset by a power of ten per replica, so each key space is 10x and
foreign keys stay consistent inside a replica; nation/region stay fixed
(spec constants at every SF). This is a TIMING fixture for measuring
sf0.1 -> ~sf1 scaling exponents of the slow-query family (SCALE.md), not
a correctness fixture: values/texts repeat verbatim across replicas.

Tooling-side script (like check_oracle.py) - the engine under test stays
pure Scala Spark.
"""
import os
import duckdb

# Env-overridable (round-14: the 100x capstone probe builds scaledata/sf10
# from the 10x fixture with GRAFT_SCALE_SRC=scaledata/sf1
# GRAFT_SCALE_DST=scaledata/sf10 GRAFT_SCALE_REPLICAS=10 — keys are
# re-offset above the 10x fixture's max, so the composition is a true
# 100x of sf0.1).
SRC = os.environ.get("GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("GRAFT_SCALE_DST", "/root/repo/scaledata/sf1")
REPLICAS = int(os.environ.get("GRAFT_SCALE_REPLICAS", "10"))

# table -> columns to offset (entity keys)
OFFSET_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def pow10_above(n: int) -> int:
    p = 1
    while p <= n:
        p *= 10
    return p


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
    # one shared offset per key FAMILY so foreign keys agree across
    # tables (l_suppkey and s_suppkey must shift by the same amount)
    fam = {}
    for t, cols in OFFSET_COLS.items():
        for c in cols:
            f = c.split("_", 1)[-1]  # orderkey/partkey/suppkey/custkey/...
            m = con.execute(
                f"SELECT max({c}) FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchone()[0]
            fam[f] = max(fam.get(f, 0), int(m))
    off = {f: pow10_above(m) for f, m in fam.items()}
    print("key offsets:", off)
    for t, cols in OFFSET_COLS.items():
        parts = []
        for r in range(REPLICAS):
            sel = ", ".join(
                f"{c} + {r * off[c.split('_', 1)[-1]]} AS {c}"
                if c in cols else c
                for c in [d[0] for d in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
                ).fetchall()])
            parts.append(
                f"SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet')")
        union = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
