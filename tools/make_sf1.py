#!/usr/bin/env python3
"""Synthesize an sf1-scale rehearsal dataset (10x sf0.1) for the scaling
sweep (tools/scale_sweep — VERDICT r10 #7). NOT oracle data: ids are
remapped per replica so dedup/ANN semantics keep their sf0.1 shape
(plain duplication would turn every document into a 10-copy clique and
every embedding into a 10-way tie, distorting exactly the operators the
sweep is supposed to stress).

  documents:  doc_id + r*10M; every-3rd-word replica marker tokens keep
              cross-replica 3-gram Jaccard under the near-dup threshold
              (same dup density per unit data, 10x volume);
  events:     event_id + r*1e12, user_id + r*1e9 (new contexts -> the
              per-context event count stays sf0.1-sized, the context
              count scales — the 100 TB model);
  embeddings: vec_id + r*10M, embedding circularly rotated by r so
              replicas are not semantic near-dups.

Known ceiling: the image/graph gates derive synthetic PNGs from doc_id
with ~1280 distinct pixel variants (buildSyntheticPng's mod-256/mod-5
structure), so scaling doc count densifies the image dup graph
quadratically regardless of id remapping — interpret those gates'
exponents against EDGE count, not doc count.

Small TPC-H tables are symlinked unchanged. Output is repo-local
(tmp/sf1, gitignored).
"""
import duckdb, os, sys, shutil

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "tmp/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def gen(table, sql):
    out = f"{DST}/{table}.parquet"
    if os.path.exists(out):
        os.remove(out)
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{table}: {n} rows")

reps = f"(SELECT unnest(range({R})) AS r)"

# REPLACE every 3rd word with a replica marker: every 3-gram window then
# contains a replica-specific token, so cross-replica 3-gram Jaccard is
# ~0 (insertion-style markers left J~0.2, which 32x2 banding still
# catches 73% of the time — the candidates were rejected but their
# verify cost was paid). Near-dup pairs WITHIN a replica transform
# identically and keep their sf0.1 similarity, so dup density per unit
# of data matches sf0.1 instead of every doc gaining 9 siblings.
gen("documents", f"""
  SELECT d.doc_id + r.r * 10000000 AS doc_id,
         CASE WHEN r.r = 0 THEN d.text
              ELSE regexp_replace(d.text, '(\\S+ \\S+ )\\S+',
                                  '\\1zq' || r.r, 'g') END AS text,
         d.lang, d.source, d.n_chars
  FROM '{SRC}/documents.parquet' d CROSS JOIN {reps} r
""")

gen("events", f"""
  SELECT e.event_id + r.r * 1000000000000 AS event_id,
         e.ts,
         e.user_id + r.r * 1000000000 AS user_id,
         e.event_type, e.value, e.props
  FROM '{SRC}/events.parquet' e CROSS JOIN {reps} r
""")

# circular rotation by r positions: cos(rotated, original) is ~0 for
# generic vectors, so replicas are NOT semantic near-dups of each other
# and the cosine pair graph keeps its sf0.1 density per unit of data
gen("embeddings", f"""
  SELECT e.vec_id + r.r * 10000000 AS vec_id,
         CASE WHEN r.r = 0 THEN e.embedding
              ELSE e.embedding[r.r + 1:] || e.embedding[:r.r] END AS embedding,
         e.label
  FROM '{SRC}/embeddings.parquet' e CROSS JOIN {reps} r
""")

for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
    dst = f"{DST}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)
print("done:", DST)
