#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs graft.Verify (already-compiled classes) on a testdata dir, then runs each
oracle SQL in DuckDB against the same parquet tables and compares result sets
(sorted columns by name, sorted rows, value-wise with dtype normalization).

Usage: python3 tools/verify_local.py [sfDir] [--only=q_name,...] [--family=prefix,...]

Subset modes (mid-round iteration; the FULL run stays the round-close ritual):
  --only=q_a,q_b      exact query names
  --family=q_video,q_dedup
                      every query whose name starts with a listed prefix —
                      the "changed-since" workflow: pass the family prefixes
                      of the operators your diff touched
Both filters may be combined (union).
"""
import json, math, subprocess, sys, tempfile, os

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
ONLY = None
FAMILIES = None
for a in sys.argv:
    if a.startswith("--only="):
        ONLY = set(a.split("=", 1)[1].split(","))
    if a.startswith("--family="):
        FAMILIES = [p for p in a.split("=", 1)[1].split(",") if p]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = tempfile.mkdtemp(prefix="graft_verify_")
CP = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"

ADD_OPENS = []
for p in ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io", "java.net",
          "java.nio", "java.util", "java.util.concurrent", "java.util.concurrent.atomic",
          "sun.nio.ch", "sun.nio.cs", "sun.security.action", "sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]

_filters = sorted(ONLY or set()) + [p + "*" for p in (FAMILIES or [])]
cmd = ["java"] + ADD_OPENS + [
    "-Xmx8g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
    "-cp", CP, "graft.Verify", SF, OUT] + ([",".join(_filters)] if _filters else [])
env = dict(os.environ, SPARK_GRAFT_CPUS="8")
r = subprocess.run(cmd, capture_output=True, text=True, env=env)
if r.returncode != 0:
    print(r.stdout[-3000:]); print(r.stderr[-5000:]); sys.exit(1)
for line in r.stderr.splitlines():
    if "[verify]" in line:
        print(line)

import duckdb
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if v is None: return None
    if isinstance(v, bool): return v
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return float(v)
    if isinstance(v, int): return float(v) if abs(v) < 2**52 else v
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(row[i]) for i in order) for row in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out

fails = []
for name, sql in sorted(oracle.items()):
    if (ONLY or FAMILIES) and not (
            (ONLY and name in ONLY) or
            (FAMILIES and any(name.startswith(p) for p in FAMILIES))):
        continue
    path = f"{OUT}/{name}"
    if not os.path.isdir(path):
        fails.append((name, "spark query failed (no output)")); continue
    try:
        got_cols = [d[0] for d in con.execute(
            f"SELECT * FROM read_parquet('{path}/*.parquet')").description]
        got_rows = con.execute(f"SELECT * FROM read_parquet('{path}/*.parquet')").fetchall()
        exp = con.execute(sql)
        exp_cols = [d[0] for d in exp.description]
        exp_rows = exp.fetchall()
    except Exception as e:
        fails.append((name, f"error: {e}")); continue
    gc, gr = canon(got_cols, got_rows)
    ec, er = canon(exp_cols, exp_rows)
    if gc != ec:
        fails.append((name, f"schema mismatch: spark={gc} oracle={ec}")); continue
    if len(gr) != len(er):
        fails.append((name, f"row count: spark={len(gr)} oracle={len(er)}")); continue
    bad = None
    for i, (a, b) in enumerate(zip(gr, er)):
        if a != b:
            ok = True
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    if not (math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12)): ok = False; break
                elif x != y: ok = False; break
            if not ok:
                bad = (i, a, b); break
    if bad:
        fails.append((name, f"row {bad[0]}: spark={bad[1][:8]} oracle={bad[2][:8]}")); continue
    print(f"  OK {name} ({len(gr)} rows)")

if fails:
    print(f"\n{len(fails)} FAILURES:")
    for n, m in fails: print(f"  FAIL {n}: {m}")
    sys.exit(1)
def _checked(name):
    if not ONLY and not FAMILIES: return True
    return (ONLY and name in ONLY) or \
        (FAMILIES and any(name.startswith(p) for p in FAMILIES))
print(f"\nall {len([n for n in oracle if _checked(n)])} queries match")
