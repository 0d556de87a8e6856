#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle gate: run graft.Verify
first, then compare each dumped parquet against the oracle SQL run in
DuckDB over the same sf dir. Usage: check_oracle.py <sfDir> <verifyOut>"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{outdir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"MISSING  {name}: no spark output"); fail += 1; continue
    got = pq.read_table(spark_path).to_pandas()
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fail += 1; continue
    # driver-style normalize: sort columns by name, then rows
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns), ignore_index=True)
        return df
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        print(f"SCHEMA   {name}: spark={list(g.columns)} oracle={list(e.columns)}"); fail += 1; continue
    if len(g) != len(e):
        print(f"ROWS     {name}: spark={len(g)} oracle={len(e)}"); fail += 1; continue
    # the driver's hash is dtype/format-sensitive: DuckDB HUGEINT (from
    # sum(BIGINT)) lands as float64/object while Spark writes int64 — treat
    # any dtype divergence as a failure even when values compare equal
    mism = [(c, str(g[c].dtype), str(e[c].dtype))
            for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
    if mism:
        print(f"DTYPE    {name}: {mism}"); fail += 1; continue
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
        print(f"OK       {name}: {len(g)} rows")
    except AssertionError as ex:
        print(f"VALUES   {name}: {str(ex).splitlines()[0]}")
        # show first differing cells
        for c in g.columns:
            if not g[c].equals(e[c]):
                diff = (g[c] != e[c])
                try:
                    import numpy as np
                    if g[c].dtype.kind == 'f':
                        # keep it a Series: np.isclose returns an ndarray,
                        # which has no .index for the report below
                        diff = pd.Series(
                            ~np.isclose(g[c], e[c], rtol=0, atol=0, equal_nan=True),
                            index=g.index)
                except Exception:
                    pass
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"  col={c} row={i}: spark={g[c][i]!r} oracle={e[c][i]!r}")
        fail += 1
print(f"\n{'FAIL' if fail else 'PASS'}: {len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
