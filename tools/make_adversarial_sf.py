#!/usr/bin/env python3
"""Build a repo-local adversarial scale-factor directory from sf0.001.

The driver testdata contains zero NULL-text documents, so the 150+-query
hash gate cannot see the bug class where a NULL group key silently falls
out of an equi-join (the round-15 dedup_substring bug). This script clones
sf0.001 into target/fixtures_adv/ and appends adversarial rows:

documents (ids continue after the existing max):
  +0  NULL text                  (md5(NULL) group-key path)
  +1  NULL text                  (second NULL doc -> a NULL group of size 2)
  +2  '' empty text              (tokenless, zero-length)
  +3  '   ' whitespace-only text (tokenless but non-empty)
  +4  exact copy of doc 0's text (new member of an existing dup group)
  +5  'a' single-char text       (shorter than every shingle/gram window)

embeddings (ids continue after the existing max):
  +0  NULL embedding
  +1  zero-length FLOAT[] array
  +2  all-zero vector            (zero norm -> cosine guard path)

Usage: python3 tools/make_adversarial_sf.py [out_dir]
Then:  python3 tools/check.py target/fixtures_adv
"""
import os, shutil, sys
import duckdb

SRC = "/root/testdata/sf0.001"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/fixtures_adv"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

os.makedirs(OUT, exist_ok=True)
for t in TABLES:
    if t not in ("documents", "embeddings"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

con = duckdb.connect()

doc_max = con.execute(f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  SELECT * FROM '{SRC}/documents.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    ({doc_max + 1}, NULL,  'en', 'src0', NULL),
    ({doc_max + 2}, NULL,  'de', 'src1', NULL),
    ({doc_max + 3}, '',    'en', 'src0', 0),
    ({doc_max + 4}, '   ', 'fr', 'src2', 3),
    ({doc_max + 5}, (SELECT text FROM '{SRC}/documents.parquet' WHERE doc_id = 0),
                    'es', 'src3',
                    (SELECT n_chars FROM '{SRC}/documents.parquet' WHERE doc_id = 0)),
    ({doc_max + 6}, 'a',   'zh', 'src4', 1)
  ) AS v(doc_id, text, lang, source, n_chars)
  ORDER BY doc_id
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")

vec_max = con.execute(f"SELECT max(vec_id) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
dim = con.execute(f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1").fetchone()[0]
zeros = "[" + ", ".join(["0.0"] * dim) + "]"
con.execute(f"""
COPY (
  SELECT * FROM '{SRC}/embeddings.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    ({vec_max + 1}, NULL,                    1),
    ({vec_max + 2}, CAST([] AS FLOAT[]),     2),
    ({vec_max + 3}, CAST({zeros} AS FLOAT[]), 3)
  ) AS v(vec_id, embedding, label)
  ORDER BY vec_id
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")

for t in TABLES:
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t:12s} {n}")
print(f"adversarial SF written to {OUT}")
