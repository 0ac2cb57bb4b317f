#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against the DuckDB oracle (same parquet tables), compare values.
Usage: python3 check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = fail = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        print(f"{name:24s} rows-only: {len(got)} rows")
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE ERROR: {str(e)[:160]}")
        fail += 1
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"{name:24s} SCHEMA MISMATCH: {list(got.columns)} vs {list(exp.columns)}")
        fail += 1
        continue
    # type-strict: the driver's hash is type-sensitive where the
    # rows/schema checks are not (r6 shipped 4 "values identical,
    # DECIMAL(28,4) vs DECIMAL(38,4)" hash fails) — compare the
    # DuckDB-declared type of every column, modulo widenings that
    # stringify identically and hash identically in practice.
    def coltypes(rel):
        return {r[0]: r[1] for r in con.sql(f"DESCRIBE {rel}").fetchall()}
    gt = coltypes(f"SELECT * FROM '{d}/*.parquet'")
    et = coltypes(f"({oracle[name]})")
    WIDEN_OK = [("INTEGER", "BIGINT"), ("FLOAT", "DOUBLE"),
                ("TIMESTAMP_NS", "TIMESTAMP")]
    tbad = None
    for c in got.columns:
        a, b = gt.get(c), et.get(c)
        if a != b and (a, b) not in WIDEN_OK and (b, a) not in WIDEN_OK:
            tbad = (c, a, b)
            break
    if tbad:
        print(f"{name:24s} TYPE MISMATCH col={tbad[0]}: spark={tbad[1]} vs oracle={tbad[2]}")
        fail += 1
        continue
    if len(got) != len(exp):
        print(f"{name:24s} ROWCOUNT {len(got)} vs {len(exp)}")
        fail += 1
        continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    mismatch = None
    for c in got.columns:
        gv, ev = gs[c].tolist(), es[c].tolist()
        if [str(x) for x in gv] != [str(x) for x in ev]:
            for i, (a, b) in enumerate(zip(gv, ev)):
                if str(a) != str(b):
                    mismatch = (c, i, a, b)
                    break
            break
    if mismatch:
        c, i, a, b = mismatch
        print(f"{name:24s} VALUE MISMATCH col={c} row={i}: {a!r} vs {b!r}")
        fail += 1
    else:
        print(f"{name:24s} OK ({len(got)} rows)")
        ok += 1
# a query that CRASHED in Verify leaves no result dir at all — surface
# it as a failure instead of silently shrinking the "ok" count. The
# queries.json manifest covers rows-only queries with no oracle entry.
manifest = set(oracle)
mf = os.path.join(out, "queries.json")
if os.path.exists(mf):
    manifest |= set(json.load(open(mf)))
for name in sorted(manifest):
    if not os.path.isdir(os.path.join(out, name)):
        print(f"{name:24s} MISSING RESULT (query failed in Verify?)")
        fail += 1

# no-rows-only ratchet: every declared q_* query must carry an oracle.
# A key silently dropping its oracle_sql entry would downgrade the
# driver's check from hash-compare to rows>0 without anyone noticing.
for name in sorted(manifest - set(oracle)):
    if name.startswith("q_"):
        print(f"{name:24s} DECLARED QUERY WITHOUT AN ORACLE (rows-only regression)")
        fail += 1

# SURVEY §2 <-> registry invariant: every q_* row in the §2 tables must
# be a declared query, and every declared query key must have a §2 row
# (spec-only rows have non-q_* keys, so they are exempt by shape). Only
# meaningful on a full (unfiltered) Verify run — detected by manifest
# size, so local single-query iteration stays usable.
survey = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SURVEY.md")
if os.path.exists(survey) and len(manifest) > 100:
    import re
    s2 = open(survey).read().split("## §2", 1)[-1].split("\n## ", 1)[0]
    rows = set(re.findall(r"^\|\s*(q_[a-z0-9_]+)\s*\|", s2, re.M))
    for k in sorted(rows - manifest):
        print(f"{k:24s} SURVEY ROW WITHOUT A DECLARED QUERY")
        fail += 1
    for k in sorted(manifest - rows):
        print(f"{k:24s} DECLARED QUERY WITHOUT A SURVEY §2 ROW")
        fail += 1

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
