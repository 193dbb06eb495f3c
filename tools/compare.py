#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in
DuckDB over the same test tables, then compare row count, column names,
and a hash over column-name-sorted, row-sorted values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 SIGNIFICANT digits (%.12g), calibrated empirically against
        # the driver in round 11/12:
        #  - the old round(v, 9) DECIMALS was weaker than the driver for
        #    values ~1.0 (sur1 shipped red while matching locally);
        #  - raw repr() is stronger than the driver: a full-repo sweep
        #    found exactly 9 queries (ab1, pg1, hits1, tx6, tx10, st3,
        #    an1, aat1, bm1) differing ONLY in the 16th significant
        #    digit — order-dependent double sums with documented ulp
        #    caveats — all of which the driver passed for 11 rounds.
        # %.12g catches every divergence >= 1e-12 relative (the sur1
        # class) and absorbs the accepted ulp class. -0.0 normalizes so
        # a signed-zero split never flips a hash.
        if v == 0.0:
            v = 0.0
        return "%.12g" % v
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

def table_digest(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for row in mat:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    # a registered oracle whose result dir is MISSING means the Spark
    # side FAILED to write it (graft.Verify logs the exception) — r14
    # lesson: as1 threw at sf0.001 for two runs while this loop,
    # iterating only over existing dirs, kept reporting all-green
    for name in sorted(oracle):
        if not os.path.isdir(os.path.join(out_dir, name)):
            results[name] = {"status": "MISSING_OUTPUT",
                             "err": "query registered but no result dir "
                                    "(Spark-side failure; see verify log)"}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        try:
            got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
            grows, gcols = got.fetchall(), [c for c in got.columns]
        except Exception as e:
            results[name] = {"status": "SPARK_READ_FAIL", "err": str(e)[:200]}
            continue
        if name not in oracle:
            results[name] = {"status": "ROWS_ONLY", "rows": len(grows),
                             "ok": len(grows) > 0}
            continue
        try:
            exp = con.sql(oracle[name])
            erows, ecols = exp.fetchall(), [c for c in exp.columns]
            etypes = [str(t) for t in exp.types]
        except Exception as e:
            results[name] = {"status": "ORACLE_SQL_FAIL", "err": str(e)[:300]}
            continue
        # Dtype gate (round-12 lesson, sur1): fetchall() erases DuckDB's
        # physical types, so an oracle whose output column materializes
        # as HUGEINT/UHUGEINT can hash-MATCH here (plain Python ints)
        # while the driver's pandas-backed hash sees object dtype vs
        # Spark's int64 and fails. Forbid int128 output columns outright
        # — every oracle must cast its sums/window-sums to BIGINT.
        bad_types = [f"{c}:{t}" for c, t in zip(ecols, etypes)
                     if "HUGEINT" in t.upper()]
        if bad_types:
            results[name] = {"status": "ORACLE_DTYPE_FAIL",
                             "hugeint_cols": bad_types}
            continue
        cols_ok = sorted(gcols) == sorted(ecols)
        rows_ok = len(grows) == len(erows)
        hash_ok = cols_ok and rows_ok and \
            table_digest(grows, gcols) == table_digest(erows, ecols)
        results[name] = {
            "status": "MATCH" if (cols_ok and rows_ok and hash_ok) else "MISMATCH",
            "rows": len(grows), "oracle_rows": len(erows),
            "cols_ok": cols_ok, "rows_ok": rows_ok, "hash_ok": hash_ok}
        if not cols_ok:
            results[name]["cols"] = {"got": sorted(gcols), "want": sorted(ecols)}
        elif not hash_ok and rows_ok:
            # show first differing row for debugging
            order = sorted(range(len(gcols)), key=lambda i: gcols[i])
            gm = sorted(tuple(canon(r[i]) for i in order) for r in grows)
            em = sorted(tuple(canon(r[i]) for i in order) for r in erows)
            for i, (a, b) in enumerate(zip(gm, em)):
                if a != b:
                    results[name]["first_diff"] = {"i": i, "got": a[:6], "want": b[:6]}
                    break
    n_match = sum(1 for r in results.values() if r["status"] == "MATCH")
    n_rows_only = sum(1 for r in results.values()
                      if r["status"] == "ROWS_ONLY" and r.get("ok"))
    print(json.dumps(results, indent=1, default=str))
    print(f"## {n_match} MATCH + {n_rows_only} ROWS_ONLY-ok of {len(results)} queries",
          file=sys.stderr)
    bad = [n for n, r in results.items()
           if r["status"] not in ("MATCH",) and not (r["status"] == "ROWS_ONLY" and r.get("ok"))]
    if bad:
        print("## FAILING: " + " ".join(bad), file=sys.stderr)
        sys.exit(1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
