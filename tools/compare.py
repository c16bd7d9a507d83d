#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify (parquet dir per query +
oracle_sql.json), runs the oracle SQL in DuckDB against views named after
the sfDir parquet tables and diffs: row count, column names (sorted),
per-cell values (rows sorted, floats rounded), AND pandas dtypes.

The dtype check is driver-faithful: the driver materializes both sides
through pandas before hashing, so a DuckDB HUGEINT column (integer sum()
or // division) becomes float64 while the Spark parquet stays int64 —
identical values, different rendered cell ("123.0" vs "123"), different
hash. Round 3 lost 4 queries to exactly this. Width differences within a
kind (int32 vs int64) rendered identically and passed the driver in r3,
so we compare numpy dtype KIND (i/u/f/b/O/M), not width."""
import sys, os, json, math, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    out = []
    for r in rows:
        cr = []
        for v in r:
            if isinstance(v, float):
                v = round(v, 6)
                if v == 0.0:
                    # Driver-faithful: the driver hashes RENDERED cells,
                    # so -0.0 vs 0.0 is a real mismatch (r8 lost
                    # importance_sample to it while `v == -0.0` here —
                    # true for BOTH zeros in Python — masked it). Tag
                    # the sign into a string so tuple equality sees it.
                    v = "0.0" if math.copysign(1.0, v) > 0 else "-0.0"
            if isinstance(v, decimal.Decimal):
                # Driver-faithful: this local harness reads BOTH sides
                # through DuckDB, so a DECIMAL output column yields
                # Decimal objects on both and compares equal — but the
                # driver materializes Spark via pandas (Decimal objects)
                # and the oracle via DuckDB->pandas (float64), and the
                # rendered cells differ (r8 lost shipping_priority).
                # Emit round(...)::DOUBLE instead of raw DECIMAL.
                raise TypeError(
                    "DECIMAL cell in gate output — the driver renders "
                    "Spark decimals and DuckDB decimals differently; "
                    "cast the emitted column to DOUBLE (keep decimal "
                    "arithmetic internal)")
            if isinstance(v, (list, tuple, dict)):
                # Driver-faithful: the driver's pandas sort dies on array
                # cells (TypeError: unhashable numpy.ndarray) before any
                # comparison. Tuple-izing here green-lit embed_quantize
                # locally while the driver rejected it (r7). Flatten
                # arrays to CSV in the registered query instead.
                raise TypeError(
                    "array/map/struct cell in gate output — the driver's "
                    "pandas compare cannot hash it; flatten to a scalar "
                    "(array_join CSV) in the registered query")
            cr.append(v)
        out.append(tuple(cr))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        got_cols = sorted(got_rel.columns)
        got_dtypes = {c: t.kind for c, t in got_rel.df().dtypes.items()}
        try:
            got = canon([tuple(r[got_rel.columns.index(c)] for c in got_cols)
                         for r in got_rel.fetchall()])
        except TypeError as e:
            n_fail += 1
            print(f"[FAIL] {name}: {e}")
            continue
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(got)} {'OK' if got else 'EMPTY!'}")
            continue
        exp_rel = con.sql(oracle[name])
        exp_cols = sorted(exp_rel.columns)
        exp_dtypes = {c: t.kind for c, t in exp_rel.df().dtypes.items()}
        try:
            exp = canon([tuple(r[exp_rel.columns.index(c)] for c in exp_cols)
                         for r in exp_rel.fetchall()])
        except TypeError as e:
            # an array/struct cell in the ORACLE output is the same
            # contract violation as on the engine side — fail the one
            # query, don't abort the whole gate run
            n_fail += 1
            print(f"[FAIL] {name} (oracle side): {e}")
            continue
        dtype_diff = [(c, got_dtypes.get(c), exp_dtypes.get(c))
                      for c in got_cols if got_dtypes.get(c) != exp_dtypes.get(c)]
        ok = got_cols == exp_cols and got == exp and not dtype_diff
        if ok:
            n_pass += 1
            print(f"[PASS] {name}: {len(got)} rows")
        else:
            n_fail += 1
            print(f"[FAIL] {name}: cols {got_cols==exp_cols} "
                  f"({got_cols} vs {exp_cols}) rows {len(got)}/{len(exp)}")
            if dtype_diff:
                print("  dtype diff (col, spark, oracle):", dtype_diff)
            for g, e in zip(got, exp):
                if g != e:
                    print("  first diff:\n   got:", g, "\n   exp:", e)
                    break
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
