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

documents, round-16 second batch (cross-engine string semantics):
  +6  mixed-script unicode text   (astral-plane emoji = UTF-16 surrogate
      pair, combining marks, CJK/Hangul: length/substr/regex/lower must
      count code points identically in Spark and DuckDB)
  +7  ~22k-char repetitive text   (shingle/winnow/BPE volume on one doc)
  +8  control chars + quotes      (\\n \\t \\r, double quote, backslash:
      tokenizer splits and any JSON/regex escaping path)

embeddings (ids continue after the existing max):
  +0  NULL embedding
  +1  zero-length FLOAT[] array
  +2  all-zero vector            (zero norm -> cosine guard path)
  +3  exact copy of vec 0        (new member of an exact-dup vector group)
  +4  NaN component              (NaN-poisoned dot/cosine ordering: both
      engines must rank/propagate NaN the same way)
  +5  +Inf component             (infinite norm: passes a NaN-only gate,
      then NaN/overflow poisons cosines and fixed-point casts)

events (ids continue after the existing max; exercises the window /
CEP / state-machine family the first batch never touched):
  +1  NULL user_id               (keyed-state key: a primitive Long
      encoder would silently read 0 and invent a phantom user)
  +2  NULL event_type            (group/filter key NULL path)
  +3  NULL ts                    (window assignment of a NULL timestamp)
  +4  truncated-JSON props       (get_json_object -> NULL vs a DuckDB
      json_extract ERROR on invalid input)
  +5  NULL props
  +6  NaN value                  (aggregate + ordering NaN propagation)
  +7  far-future ts, negative value (window range + sign edges)
  +8  +Inf value on a purchase   (money paths: Spark ANSI double->DECIMAL
      silently NULLs Inf, BIGINT cents cast THROWS, DuckDB errors on both)
  +9  -Inf value on a click      (sign twin of +8)

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
    if t not in ("documents", "embeddings", "events"):
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
    ({doc_max + 6}, 'a',   'zh', 'src4', 1),
    ({doc_max + 7}, 'Héllo wörld {chr(129408)} ' || '中文 테스트 naïve café façade ' ||
                    'combining: e' || chr(769) || ' done', 'en', 'src1', NULL),
    ({doc_max + 8}, repeat('the quick brown fox jumps over the lazy dog ', 500),
                    'en', 'src2', 22000),
    ({doc_max + 9}, 'line1' || chr(10) || chr(9) || 'line2' || chr(13) || chr(10) ||
                    '"quoted" back\\slash end', 'fr', 'src3', NULL)
  ) AS v(doc_id, text, lang, source, n_chars)
  ORDER BY doc_id
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")

vec_max = con.execute(f"SELECT max(vec_id) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
dim = con.execute(f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1").fetchone()[0]
zeros = "[" + ", ".join(["0.0"] * dim) + "]"
nan_vec = "[" + ", ".join(["'nan'::FLOAT"] + ["0.5"] * (dim - 1)) + "]"
inf_vec = "[" + ", ".join(["'infinity'::FLOAT"] + ["0.5"] * (dim - 1)) + "]"
con.execute(f"""
COPY (
  SELECT * FROM '{SRC}/embeddings.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    ({vec_max + 1}, NULL,                    1),
    ({vec_max + 2}, CAST([] AS FLOAT[]),     2),
    ({vec_max + 3}, CAST({zeros} AS FLOAT[]), 3),
    ({vec_max + 4}, (SELECT embedding FROM '{SRC}/embeddings.parquet' WHERE vec_id = 0), 4),
    ({vec_max + 5}, CAST({nan_vec} AS FLOAT[]), 5),
    ({vec_max + 6}, CAST({inf_vec} AS FLOAT[]), 6)
  ) AS v(vec_id, embedding, label)
  ORDER BY vec_id
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")

ev_max = con.execute(f"SELECT max(event_id) FROM '{SRC}/events.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  SELECT * FROM '{SRC}/events.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    ({ev_max + 1}, TIMESTAMP '2024-01-10 12:00:00', NULL, 'click',  10.0, '{{"k": 1}}'),
    ({ev_max + 2}, TIMESTAMP '2024-01-11 08:30:00', 7,    NULL,     20.0, '{{"k": 2}}'),
    ({ev_max + 3}, NULL,                            8,    'click',  30.0, '{{"k": 3}}'),
    ({ev_max + 4}, TIMESTAMP '2024-01-12 09:15:00', 9,    'pageview', 5.0, '{{"k": 4'),
    ({ev_max + 5}, TIMESTAMP '2024-01-13 10:45:00', 10,   'click',  15.0, NULL),
    ({ev_max + 6}, TIMESTAMP '2024-01-14 11:20:00', 11,   'purchase', CAST('nan' AS DOUBLE), '{{"k": 6}}'),
    ({ev_max + 7}, TIMESTAMP '2031-06-15 00:00:00', 12,   'click',  -42.5, '{{"k": 7}}'),
    ({ev_max + 8}, TIMESTAMP '2024-01-15 09:00:00', 13,   'purchase', CAST('infinity' AS DOUBLE), '{{"k": 8}}'),
    ({ev_max + 9}, TIMESTAMP '2024-01-16 14:30:00', 14,   'click',  CAST('-infinity' AS DOUBLE), '{{"k": 9}}')
  ) AS v(event_id, ts, user_id, event_type, value, props)
  ORDER BY event_id
) TO '{OUT}/events.parquet' (FORMAT PARQUET)
""")

for t in TABLES:
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t:12s} {n}")
print(f"adversarial SF written to {OUT}")
