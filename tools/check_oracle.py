#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(dumps each SparkEntry.queries result to <outDir>/<name>/ parquet and
<outDir>/oracle_sql.json), then this script replays every oracle SQL in
DuckDB over the same sf tables and compares (rows, columns-sorted-by-name,
value hash). Usage: check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(con, rel_sql):
    # fetchall (NOT .df()) so DECIMAL stays Decimal — pandas coercion to
    # float64 masked the round-1 trailing-zero mismatch ("25.00" vs "25.0")
    rel = con.sql(rel_sql)
    names = rel.columns
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    def cell(v):
        if v is None or (isinstance(v, float) and v != v):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = sorted("|".join(cell(row[i]) for i in order) for row in rel.fetchall())
    import hashlib
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(rows), cols, h, rows[:3]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = canon(con, f"SELECT * FROM '{d}/*.parquet'")
        if name not in oracle:
            print(f"[rows-only] {name}: rows={got[0]} {'OK' if got[0] > 0 else 'EMPTY!'}")
            if got[0] == 0: failures += 1
            continue
        want = canon(con, oracle[name])
        ok = got[:3] == want[:3]
        status = "OK" if ok else "MISMATCH"
        print(f"[oracle]    {name}: {status} rows={got[0]}/{want[0]}")
        if not ok:
            failures += 1
            if got[1] != want[1]:
                print(f"    cols got={got[1]} want={want[1]}")
            if got[0] != want[0]:
                print(f"    rowcount got={got[0]} want={want[0]}")
            if got[3] != want[3]:
                print(f"    sample got={got[3]}")
                print(f"    sample want={want[3]}")
    missing = [k for k in oracle if not os.path.isdir(os.path.join(out_dir, k))]
    for k in missing:
        print(f"[missing]   {k}: oracle present but no result dir")
        failures += 1
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
