#!/usr/bin/env python3
"""Self-check harness (SURVEY.md §5.2.2): after `sbt "runMain graft.Verify
<sfDir> <outDir>"`, run each DuckDB oracle on the same fixtures and compare
against the Spark parquet output — rows, columns (sorted by name, mirroring
the driver), values, AND output types. The driver hashes typed values, so a
column that DuckDB widens (SUM(INTEGER) -> HUGEINT, AVG -> raw DECIMAL)
fails its gate even when every value matches — the r12/r14 failure class.
The type leg DESCRIBEs each oracle in DuckDB and diffs type FAMILIES
against the Spark output parquet schema (read back through DuckDB), so the
local gate sees what the driver's hash sees. Exact value equality; float
near-misses are reported separately so rounding discipline can be fixed
before the driver's gate.

Usage: python3 tools/compare.py [sfDir] [outDir]
"""
import sys, json, glob, math, os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def values_eq(a, b):
    if a is None or b is None:
        return a is None and b is None, False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False, False
        if fa == fb:
            return True, False
        if math.isnan(fa) and math.isnan(fb):
            return True, False
        close = abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        return False, close
    return a == b, False


def type_family(t):
    """Collapse a DuckDB type name to the family the driver's typed hash
    distinguishes. HUGEINT and DECIMAL are deliberately NOT folded into
    int/float — those are exactly the widenings that have failed the gate
    (r12 raw DECIMAL, r14 HUGEINT)."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return type_family(t[:-2]) + "[]"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("HUGEINT", "UHUGEINT"):
        return "int128"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith("STRUCT"):
        return "struct"
    if t.startswith("MAP"):
        return "map"
    if t in ("VARCHAR", "STRING", "TEXT"):
        return "string"
    if t == "BLOB":
        return "binary"
    return t.lower()


def type_mismatches(con, sql, parquet_file):
    """[(col, spark_family, duckdb_family)] where the oracle's DESCRIBE
    type family differs from the Spark output parquet's."""
    exp = con.execute("DESCRIBE " + sql).fetchall()
    got = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{parquet_file}')").fetchall()
    etypes = {r[0]: type_family(r[1]) for r in exp}
    gtypes = {r[0]: type_family(r[1]) for r in got}
    return [(c, gtypes[c], etypes[c])
            for c in sorted(set(etypes) & set(gtypes))
            if etypes[c] != gtypes[c]]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass, fails, closes = 0, [], []
    for name in sorted(oracles):
        sql = oracles[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output written")
            fails.append(name)
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{files[0]}')").fetchall()
        gcols = [d[0] for d in con.description]
        try:
            exp = con.execute(sql).fetchall()
            ecols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fails.append(name)
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(ecols)}")
            fails.append(name)
            continue
        try:
            tmis = type_mismatches(con, sql, files[0])
        except Exception as e:
            print(f"FAIL {name}: type audit error: {e}")
            fails.append(name)
            continue
        if tmis:
            for c, gt, et in tmis:
                print(f"FAIL {name} col {c}: spark type {gt} != oracle type {et}")
            fails.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            fails.append(name)
            continue
        gi = sorted(range(len(gcols)), key=lambda i: gcols[i])
        ei = sorted(range(len(ecols)), key=lambda i: ecols[i])
        cols = sorted(gcols)
        bad = close_only = 0
        for r, (g, e) in enumerate(zip(got, exp)):
            for k, (i, j) in enumerate(zip(gi, ei)):
                ok, close = values_eq(g[i], e[j])
                if not ok:
                    if close:
                        close_only += 1
                    else:
                        if bad == 0:
                            print(f"FAIL {name} row {r} col {cols[k]}: "
                                  f"spark={g[i]!r} duckdb={e[j]!r}")
                        bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells / {len(got)} rows")
            fails.append(name)
        elif close_only:
            print(f"CLOSE {name}: {close_only} cells within 1e-9 but not exact")
            closes.append(name)
        else:
            n_pass += 1
    declared_only = [q for q in set()]
    print(f"\n== {n_pass} PASS, {len(closes)} CLOSE, {len(fails)} FAIL "
          f"(of {len(oracles)} oracles) ==")
    if closes:
        print("close:", " ".join(closes))
    if fails:
        print("fail:", " ".join(fails))
        sys.exit(1)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    main(sf, out)
