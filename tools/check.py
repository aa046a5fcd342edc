#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate (dev-only tool;
the shipped library is pure Scala — this mirrors what the driver does:
run Verify's parquet dumps against DuckDB executing oracle_sql.json).

Beyond value equality, this compares pandas DTYPES column-by-column
between the Spark parquet dump and the DuckDB oracle result — the
driver hashes the pandas representation, so a DuckDB HUGEINT (→
float64 in pandas) vs Spark int64 hash-diverges even when every value
is equal. That exact class cost two rounds on `agg_bool_logic`
(r4/r5); value comparison alone reports PASS on it.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
       python3 tools/check.py --selftest
"""
import duckdb, glob, json, math, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    if sys.argv[1:2] == ["--selftest"]:
        selftest()
        return
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdf, scols, stypes = run(con, "SELECT * FROM read_parquet(?)", [files])
            odf, ocols, otypes = run(con, sql)
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(sdf, scols, stypes, odf, ocols, otypes)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows){'' if not msg else '  ' + msg}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


def run(con, sql, params=None):
    """Execute once; return (rows, column names, pandas dtype strings).

    Goes through Arrow so the value rows and the pandas dtypes come
    from the SAME execution — the dtype view is what the driver's
    hasher sees after the duckdb→pandas hop.
    """
    tbl = con.execute(sql, params).arrow()
    cols = tbl.column_names
    dtypes = [str(d) for d in tbl.to_pandas().dtypes]
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return rows, cols, dtypes


def compare(sdf, scols, stypes, odf, ocols, otypes):
    if sorted(scols) != sorted(ocols):
        return False, f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}"
    # dtype parity in driver column order (sorted by name)
    smap = dict(zip(scols, stypes))
    omap = dict(zip(ocols, otypes))
    dt_bad = [(c, smap[c], omap[c]) for c in sorted(scols) if smap[c] != omap[c]]
    if dt_bad:
        det = "; ".join(f"{c}: spark={a} oracle={b}" for c, a, b in dt_bad)
        return False, f"dtype mismatch (hash would diverge): {det}"
    if len(sdf) != len(odf):
        return False, f"row count: spark={len(sdf)} oracle={len(odf)}"
    # driver sorts columns by name before hashing; mirror that
    sidx = [scols.index(c) for c in sorted(scols)]
    oidx = [ocols.index(c) for c in sorted(ocols)]
    srows = [tuple(r[i] for i in sidx) for r in sdf]
    orows = [tuple(r[i] for i in oidx) for r in odf]
    exact = srows == orows
    if exact:
        return True, ""
    # locate first mismatch for diagnosis; allow tiny float fuzz to
    # distinguish "ordering/logic bug" from "float drift"
    drift = 0
    for rn, (a, b) in enumerate(zip(srows, orows)):
        for cn, (x, y) in enumerate(zip(a, b)):
            if x == y:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != 0 and abs(x - y) / max(abs(x), abs(y)) < 1e-9:
                    drift += 1
                    continue
            return False, (f"row {rn} col {sorted(scols)[cn]}: "
                           f"spark={x!r} oracle={y!r}")
    return True, f"WARN: {drift} float cells differ at <1e-9 rel (not exact!)"


def selftest():
    """Prove the checker catches the HUGEINT→float64 vs int64 class.

    Recreates agg_bool_logic's failure shape: equal VALUES, different
    pandas dtypes (DuckDB count_if → HUGEINT → float64; Spark writes
    int64). The old value-only checker said PASS here.
    """
    con = duckdb.connect()
    s = run(con, "SELECT CAST(1223 AS BIGINT) AS n_large")          # Spark side: int64
    o = run(con, "SELECT count_if(x > 0) * 1223 AS n_large "
                 "FROM (VALUES (1)) t(x)")                           # oracle: hugeint
    ok, msg = compare(*s, *o)
    assert not ok and "dtype" in msg, f"selftest MISSED hugeint/int64: ok={ok} msg={msg}"
    print(f"selftest: hugeint/int64 divergence caught: {msg}")
    s2 = run(con, "SELECT CAST(1223 AS BIGINT) AS n_large")
    o2 = run(con, "SELECT CAST(CAST(1223 AS HUGEINT) AS BIGINT) AS n_large")
    ok2, _ = compare(*s2, *o2)
    assert ok2, "selftest: cast-to-BIGINT twin should pass"
    print("selftest: BIGINT-cast twin passes. OK")


if __name__ == "__main__":
    main()
