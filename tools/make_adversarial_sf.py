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

relational tables, round-16 fourth batch (the TPC-H + structured-record
families never saw a malformed row; ids continue after each max):

customer:
  +1  NULL c_name                 (linkage name-filter path)
  +2  'x' one-char name           (too short for a prefix block)
  +3  NULL c_nationkey            (nation-join drop parity)
  +4  NULL c_mktsegment           (match rule / group key NULL)
  +5  NULL c_acctbal              (band bucket NULL)
  +6  NaN c_acctbal               (money contract: bucket + bal_gap)
  +7  +Inf c_acctbal              (sign/overflow twin of +6)
  +8  exact copy of customer 0's (name, segment, balance) under a new key
      (entity_match within-group row with multiplicity 2)
  +5/+6/+7 share a name-prefix block, so their pairwise bal gaps are
  NULL/NaN/Inf — the finite-or-null contract inside a match feature.

orders:
  +1  NULL o_orderdate            (date-window filters)
  +2  NULL o_custkey              (orphan order; outer-join side)
  +3  dangling o_custkey          (FK past max — join drop parity)
  +4  NULL status+priority, NaN o_totalprice
  +5  +Inf o_totalprice, far-future 2035 date

lineitem:
  +a  NULL l_orderkey             (basket/orders join drop)
  +b  NULL l_partkey              (item-count NULL group)
  +c  exact duplicate of an existing (orderkey, partkey) item
      (distinct-items path; also a second row for q1-style sums)
  +d  NaN l_quantity              (q1's sum through the measure contract)
  +e  +Inf l_extendedprice        (money cast: Spark DECIMAL NULLs it,
      DuckDB CAST hard-errors without the contract CASE)
  +f  negative qty, discount > 1, NULL l_shipdate (range/filter edges)
  +g  NULL l_returnflag/l_linestatus (q1 group-key NULLs)
  rows d-g hang off the adversarial orders so both engines exercise the
  same join paths.

supplier (NOTE: adding rows changes s_cnt, so the whole synthesized
partsupp relation shifts — identically in both engines by construction):
  +1  NULL s_name                 (q2 output column NULL)
  +2  NULL s_nationkey, NaN s_acctbal (nation-join drop + money contract)

part:
  +1  NULL p_name                 (q9 contains-filter path)
  +2  NULL p_brand/p_type/p_size, NaN p_retailprice (q2/q8/q14/q16/q19
      LIKE & equality filters on NULL -> filter-false parity)
  +3  NULL p_partkey              (partsupp derivation fans out NULL keys;
      every equi-join must drop them identically)

Usage: python3 tools/make_adversarial_sf.py [out_dir]
Then:  python3 tools/check.py target/fixtures_adv
"""
import os, shutil, sys
import duckdb

SRC = "/root/testdata/sf0.001"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/fixtures_adv"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

ADVERSARIAL = ("documents", "embeddings", "events",
               "customer", "orders", "lineitem", "supplier", "part")
os.makedirs(OUT, exist_ok=True)
for t in TABLES:
    if t not in ADVERSARIAL:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

con = duckdb.connect()

# ---- relational tables (fourth batch) ----

ck = con.execute(f"SELECT max(c_custkey) FROM '{SRC}/customer.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  SELECT * FROM '{SRC}/customer.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    ({ck + 1}, NULL,                 5,    100.0, 'BUILDING'),
    ({ck + 2}, 'x',                  5,    100.0, 'BUILDING'),
    ({ck + 3}, 'Customer#999999001', NULL, 200.0, 'MACHINERY'),
    ({ck + 4}, 'Customer#999999002', 3,    300.0, NULL),
    ({ck + 5}, 'Customer#999999003', 3,    NULL,  'FURNITURE'),
    ({ck + 6}, 'Customer#999999004', 3,    CAST('nan' AS DOUBLE),      'FURNITURE'),
    ({ck + 7}, 'Customer#999999005', 3,    CAST('infinity' AS DOUBLE), 'FURNITURE'),
    ({ck + 8}, (SELECT c_name       FROM '{SRC}/customer.parquet' WHERE c_custkey = 0),
               9,
               (SELECT c_acctbal    FROM '{SRC}/customer.parquet' WHERE c_custkey = 0),
               (SELECT c_mktsegment FROM '{SRC}/customer.parquet' WHERE c_custkey = 0))
  ) AS v(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
  ORDER BY c_custkey
) TO '{OUT}/customer.parquet' (FORMAT PARQUET)
""")

ok = con.execute(f"SELECT max(o_orderkey) FROM '{SRC}/orders.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  SELECT * FROM '{SRC}/orders.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    ({ok + 1}, 5,        'O',  100.0, NULL,                           '1-URGENT'),
    ({ok + 2}, NULL,     'F',  200.0, TIMESTAMP '2024-02-01 00:00:00', '2-HIGH'),
    ({ok + 3}, 99999999, 'F',  300.0, TIMESTAMP '2024-02-02 00:00:00', '3-MEDIUM'),
    ({ok + 4}, 6,        NULL, CAST('nan' AS DOUBLE),
               TIMESTAMP '2024-02-03 00:00:00', NULL),
    ({ok + 5}, 7,        'O',  CAST('infinity' AS DOUBLE),
               TIMESTAMP '2035-01-01 00:00:00', '5-LOW')
  ) AS v(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
  ORDER BY o_orderkey
) TO '{OUT}/orders.parquet' (FORMAT PARQUET)
""")

dup_ok, dup_pk = con.execute(
    f"SELECT l_orderkey, l_partkey FROM '{SRC}/lineitem.parquet' LIMIT 1").fetchone()
con.execute(f"""
COPY (
  SELECT * FROM '{SRC}/lineitem.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    (NULL,      5,    1, 1,  1.0,   100.0, 0.05, 0.02, 'N',  'O',
     TIMESTAMP '2024-03-01 00:00:00'),
    ({dup_ok},  NULL, 1, 8,  2.0,    50.0, 0.0,  0.0,  'N',  'O',
     TIMESTAMP '2024-03-02 00:00:00'),
    ({dup_ok},  {dup_pk}, 1, 99, 2.0, 60.0, 0.0, 0.0,  'N',  'O',
     TIMESTAMP '2024-03-02 12:00:00'),
    ({ok + 1},  10,   2, 1,  CAST('nan' AS DOUBLE), 200.0, 0.1, 0.0, 'R', 'F',
     TIMESTAMP '2024-03-03 00:00:00'),
    ({ok + 1},  11,   2, 2,  3.0, CAST('infinity' AS DOUBLE), 0.1, 0.0, 'A', 'F',
     TIMESTAMP '2024-03-04 00:00:00'),
    ({ok + 2},  12,   3, 1, -4.0,  -100.0, 1.5,  0.0,  'N',  'O', NULL),
    ({ok + 3},  13,   3, 1,  5.0,   500.0, 0.0,  0.08, NULL, NULL,
     TIMESTAMP '2024-03-05 00:00:00')
  ) AS v(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
  ORDER BY l_orderkey, l_linenumber
) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
""")

sk = con.execute(f"SELECT max(s_suppkey) FROM '{SRC}/supplier.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  SELECT * FROM '{SRC}/supplier.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    ({sk + 1}, NULL,               3,    100.0),
    ({sk + 2}, 'Supplier#999999001', NULL, CAST('nan' AS DOUBLE))
  ) AS v(s_suppkey, s_name, s_nationkey, s_acctbal)
  ORDER BY s_suppkey
) TO '{OUT}/supplier.parquet' (FORMAT PARQUET)
""")

pk = con.execute(f"SELECT max(p_partkey) FROM '{SRC}/part.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  SELECT * FROM '{SRC}/part.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    ({pk + 1}, NULL, 'Brand#55', 'ECONOMY BRUSHED COPPER', 10, 500.0),
    ({pk + 2}, 'adversarial nullfield part', NULL, NULL, NULL,
               CAST('nan' AS DOUBLE)),
    (NULL,     'nullkey part', 'Brand#55', 'STANDARD POLISHED TIN', 5, 100.0)
  ) AS v(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
  ORDER BY p_partkey
) TO '{OUT}/part.parquet' (FORMAT PARQUET)
""")

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
