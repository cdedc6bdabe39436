#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles, mimicking the driver's compare:
run each oracle_sql.json entry in DuckDB over the fixture parquet, load the
Spark-dumped parquet, sort columns by name, compare values (float tolerance).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, glob, json, math
import duckdb

def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v

def close(a, b):
    # values come from fetchall(), where SQL NULL is None and a genuine
    # float NaN stays nan — so NULL-vs-NaN divergence FAILS here (the
    # driver hash would catch it) instead of hiding behind fetchdf's
    # NaN rendering of NULL
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True  # both genuinely NaN in the source
            return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-6)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # DuckDB types whose pandas rendering (fetchdf) diverges from the
    # matching Spark/parquet type — HUGEINT renders as float64, DECIMAL as
    # object/float. The driver hashes fetchdf output, so these silently
    # break the driver hash even when values are numerically equal
    # (round-8/9 q_token_budget). Fail them loudly here, pre-driver.
    BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")
    for qname, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{qname}"
        try:
            # Type sweep runs before the dump check so subset runs
            # (SPARK_GRAFT_ONLY) still type-audit every oracle.
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
            badcols = [(c, t) for c, t, *_ in desc
                       if any(b in t.upper() for b in BAD_TYPES)]
            if badcols:
                print(f"FAIL {qname}: oracle output type(s) {badcols} — "
                      f"HUGEINT/DECIMAL render as float64/object in fetchdf "
                      f"and break the driver hash; CAST to BIGINT/DOUBLE")
                n_fail += 1; continue
            if not os.path.isdir(spark_dir):
                print(f"FAIL {qname}: no spark output dir"); n_fail += 1; continue
            oc = con.execute(sql)
            ocols = [d[0] for d in oc.description]
            odf = oc.fetchdf()  # dtype parity only — values from fetchall
            orows = con.execute(sql).fetchall()
        except Exception as e:
            print(f"FAIL {qname}: duckdb error: {e}"); n_fail += 1; continue
        ssel = f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
        sc = con.execute(ssel)
        scols = [d[0] for d in sc.description]
        sdf = sc.fetchdf()  # dtype parity only — values from fetchall
        srows = con.execute(ssel).fetchall()
        # dtype parity: the driver compares pandas-rendered frames, so an
        # int64 vs float64 mismatch per column is a hash mismatch even
        # when every value compares numerically equal. Width differences
        # (int32 vs int64) render identically — compare dtype KIND, with
        # unsigned folded into signed.
        def kind(d):
            return {"u": "i"}.get(d.kind, d.kind)
        dmis = [(c, str(sdf[c].dtype), str(odf[c].dtype)) for c in scols
                if c in odf.columns
                and kind(sdf[c].dtype) != kind(odf[c].dtype)]
        if dmis:
            print(f"FAIL {qname}: dtype mismatch (col, spark, oracle): {dmis}")
            n_fail += 1; continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {qname}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1; continue
        operm = [ocols.index(c) for c in sorted(ocols)]
        sperm = [scols.index(c) for c in sorted(scols)]
        og = [tuple(r[i] for i in operm) for r in orows]
        sg = [tuple(r[i] for i in sperm) for r in srows]
        if len(og) != len(sg):
            print(f"FAIL {qname}: rows spark={len(sg)} oracle={len(og)}")
            n_fail += 1; continue
        # row order: both sides declare ORDER BY; compare in order
        bad = None
        for i, (a, b) in enumerate(zip(sg, og)):
            if not all(close(x, y) for x, y in zip(a, b)):
                bad = (i, a, b); break
        if bad:
            print(f"FAIL {qname}: row {bad[0]} spark={bad[1]} oracle={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {qname} ({len(sg)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
