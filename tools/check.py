#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate (dev-only tool;
the shipped library is pure Scala — this mirrors what the driver does:
run Verify's parquet dumps against DuckDB executing oracle_sql.json).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import duckdb, glob, json, math, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
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
            sdf = con.execute(
                "SELECT * FROM read_parquet(?)", [files]).fetchall()
            scols = [d[0] for d in con.description]
            odf = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(sdf, scols, odf, ocols)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows){'' if not msg else '  ' + msg}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


def compare(sdf, scols, odf, ocols):
    if sorted(scols) != sorted(ocols):
        return False, f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}"
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


if __name__ == "__main__":
    main()
