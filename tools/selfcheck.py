#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the fixture parquet tables and compare (as a sorted bag of
rows, columns sorted by name) against the parquet Verify wrote.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, math, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# local-iteration filter, same convention as graft.Verify: a comma
# list of name prefixes (SPARK_GRAFT_ONLY=qt52,qt53 checks just those)
_only = [t.strip() for t in os.environ.get("SPARK_GRAFT_ONLY", "").split(",")
         if t.strip()]
if _only:
    oracle = {k: v for k, v in oracle.items()
              if any(k.startswith(p) for p in _only)}

def norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return ("l",) + tuple(norm(x) for x in v)
    try:  # Decimal → normalized string
        import decimal
        if isinstance(v, decimal.Decimal):
            return ("d", str(v.normalize()))
    except Exception:
        pass
    import datetime
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    return (type(v).__name__, str(v))

def decimal_cols(describe_sql):
    """DECIMAL/HUGEINT output columns — the driver's value hash renders
    these differently per engine (every round-2 hash mismatch was a
    DECIMAL output while values compared equal), so their presence in a
    RESULT schema is a failure here even when values match."""
    desc = con.execute(describe_sql).fetchall()
    return [(r[0], r[1]) for r in desc
            if "DECIMAL" in r[1].upper() or "HUGEINT" in r[1].upper()]

import time

def emit(line):
    # incremental + unbuffered: a multi-hour sf0.1 sweep must show
    # which oracle it is on (and what each one cost) while running
    print(line, flush=True)

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        got_dec = decimal_cols(
            f"DESCRIBE SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        exp_dec = decimal_cols(f"DESCRIBE {sql}")
        if got_dec or exp_dec:
            fails.append((name,
                f"DECIMAL-typed result column (driver hash hazard): "
                f"spark={got_dec} oracle={exp_dec}"))
            emit(f"FAIL {name}: {fails[-1][1]}")
            continue
        got_rel = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        got_cols = [c[0] for c in got_rel.description]
        got = got_rel.fetchall()
        exp_rel = con.execute(sql)
        exp_cols = [c[0] for c in exp_rel.description]
        exp = exp_rel.fetchall()
    except Exception as e:
        fails.append((name, f"ERROR {e}"))
        emit(f"FAIL {name}: ERROR {e} [{time.time()-t0:.1f}s]")
        continue
    if sorted(c.lower() for c in got_cols) != sorted(c.lower() for c in exp_cols):
        fails.append((name, f"schema: got {sorted(got_cols)} exp {sorted(exp_cols)}"))
        emit(f"FAIL {name}: {fails[-1][1]}")
        continue
    gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i].lower())
    ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i].lower())
    grows = sorted(tuple(norm(r[i]) for i in gi) for r in got)
    erows = sorted(tuple(norm(r[i]) for i in ei) for r in exp)
    if len(grows) != len(erows):
        fails.append((name, f"rows: got {len(grows)} exp {len(erows)}"))
        emit(f"FAIL {name}: {fails[-1][1]} [{time.time()-t0:.1f}s]")
    elif grows != erows:
        diff = next(i for i in range(len(grows)) if grows[i] != erows[i])
        fails.append((name, f"values differ, first at sorted-row {diff}:\n  got {grows[diff]}\n  exp {erows[diff]}"))
        emit(f"FAIL {name}: {fails[-1][1]}")
    else:
        passes.append((name, len(grows)))
        emit(f"PASS {name} ({len(grows)} rows) [{time.time()-t0:.1f}s]")
rows_only = set()
for d in glob.glob(f"{outdir}/*/"):
    qn = os.path.basename(d.rstrip("/"))
    # the SPARK_GRAFT_ONLY filter must apply here too, or every
    # filtered-OUT oracle-checked query dir gets misreported as a
    # rows-only query
    if _only and not any(qn.startswith(p) for p in _only):
        continue
    if qn not in oracle:
        rows_only.add(qn)
for qn in sorted(rows_only):
    try:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{outdir}/{qn}/*.parquet')").fetchone()[0]
        print(f"ROWS-ONLY {qn}: {n} rows")
    except Exception as e:
        print(f"ROWS-ONLY {qn}: ERROR {e}")
print(f"\n{len(passes)} passed, {len(fails)} failed, {len(rows_only)} rows-only")
sys.exit(1 if fails else 0)
