#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
<sfDir> parquet tables and compares against the Spark result parquet the
Verify main dumped at <outDir>/<name>/. Columns are aligned by sorted
name (like the driver), rows sorted by all columns, floats compared with
tight tolerance (the driver hashes, so queries should round in BOTH
engines — this script reports any float drift so we can tighten).

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # decimal -> float for comparison
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: hasattr(v, "as_tuple"), na_action="ignore").any():
            df[c] = df[c].astype(float)
    if len(df):
        # Sort non-float columns first; float columns join the key ONLY
        # when the non-float columns don't already uniquely identify rows
        # (then rounded, so sub-tolerance cross-engine drift can't permute
        # row pairing). When non-floats are a unique key, float values
        # play no part in ordering at all — no boundary-straddle hazard.
        nonf = [c for c in df.columns
                if not pd.api.types.is_float_dtype(df[c])]
        flt = [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]
        unique_nonf = bool(nonf) and not df.duplicated(subset=nonf).any()
        keys = df[nonf].copy() if nonf else pd.DataFrame(index=df.index)
        sort_cols = list(nonf)
        if not unique_nonf:
            for c in flt:
                keys[c] = df[c].round(4)
            sort_cols += flt
        order = keys.sort_values(by=sort_cols, kind="mergesort",
                                 na_position="last").index
        df = df.loc[order].reset_index(drop=True)
    return df


def cmp(name, a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"schema mismatch: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"row count mismatch: spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver hashes values exactly, so an int64 column on one side
        # vs float64 on the other (e.g. DuckDB sum(BIGINT) -> HUGEINT ->
        # pandas float) hash-mismatches even when every value is equal.
        # Mirror that: integer-vs-float dtype splits are a FAIL here, not a
        # tolerance-absorbed pass (q91 round-5 escape: bare sum(n_tokens)
        # in the oracle's final SELECT; fix is CAST(sum(..) AS BIGINT)).
        if (pd.api.types.is_integer_dtype(av) !=
                pd.api.types.is_integer_dtype(bv)) and \
                (pd.api.types.is_float_dtype(av) or
                 pd.api.types.is_float_dtype(bv)):
            return (f"dtype mismatch col={c}: spark={av.dtype} "
                    f"duck={bv.dtype} (driver hash is dtype-exact; "
                    f"CAST the oracle aggregate)")
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype(float)
            bf = bv.astype(float)
            bad = ~((af.isna() & bf.isna()) |
                    (abs(af - bf) <= 1e-6 + 1e-9 * abs(bf)))
            if bad.any():
                i = bad.idxmax()
                return (f"float mismatch col={c} row={i}: "
                        f"spark={af[i]} duck={bf[i]}")
            drift = (af - bf).abs().max()
            if drift and not math.isnan(drift) and drift > 0:
                print(f"    [warn] {name}.{c} float drift {drift:g}")
        else:
            ae = av.astype(str).where(~av.isna(), "<NA>")
            be = bv.astype(str).where(~bv.isna(), "<NA>")
            bad = ae != be
            if bad.any():
                i = bad.idxmax()
                return f"value mismatch col={c} row={i}: spark={av[i]!r} duck={bv[i]!r}"
    return None


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{outdir}/*")
                   if not d.endswith(".json"))
    # Verify writes a manifest of every registered query; anything listed
    # there but absent on disk FAILED (Verify deletes stale outputs) and
    # must be flagged, not silently skipped
    try:
        manifest = json.load(open(f"{outdir}/queries.json"))
        names = sorted(set(names) | set(manifest))
    except FileNotFoundError:
        pass
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        if name not in oracle:
            status = "rows-only" if len(spark_df) > 0 else "EMPTY"
            print(f"{'ok  ' if len(spark_df) else 'FAIL'} {name}: "
                  f"{status} ({len(spark_df)} rows)")
            n_pass += len(spark_df) > 0
            n_fail += len(spark_df) == 0
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        err = cmp(name, canon(spark_df), canon(duck_df))
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"ok   {name}: {len(spark_df)} rows match")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
