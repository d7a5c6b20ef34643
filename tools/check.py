#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify, then
compare each query's parquet against its DuckDB oracle (columns sorted by
name, rows sorted, exact equality for every dtype — floats are compared
bit-exactly BY DESIGN, since all query math is constructed to be
bit-identical across engines). Usage: python3 tools/check.py [sfdir] [only_query...]
"""
import json, subprocess, sys, glob, os, time
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])
OUT = os.environ.get("GRAFT_CHECK_OUT", "/root/repo/target/verify_out")
# GRAFT_CHECK_JSON=<path>: also emit a machine-readable artifact in the
# driver's CORRECTNESS_r{N}.json shape (rows/schema/hash match + row counts
# + err), extended with per-query Spark and oracle wall seconds. Rewritten
# after EVERY query (atomic replace) and merged with any existing file, so an
# interrupted sweep leaves a usable partial record and an ONLY-resume fills
# in the gaps instead of clobbering earlier rows.
ART_PATH = os.environ.get("GRAFT_CHECK_JSON")
ART = {}
if ART_PATH and os.path.exists(ART_PATH):
    ART = json.load(open(ART_PATH))
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

env = dict(os.environ)
if ONLY:
    # Verify honors SPARK_GRAFT_ONLY (comma list) — single-query loops
    # skip the other ~70 queries instead of recomputing all of them
    env["SPARK_GRAFT_ONLY"] = ",".join(sorted(ONLY))
if not os.environ.get("GRAFT_SKIP_VERIFY"):
    # GRAFT_SKIP_VERIFY=1: compare-only pass over an existing OUT dir —
    # resume after an interrupted long-SF sweep without re-running Spark
    r = subprocess.run(["bash", "tools/run.sh", "graft.Verify", SF, OUT],
                       capture_output=True, text=True, cwd="/root/repo", env=env)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-5000:]); sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)

else:
    # compare-only resume: the dump on disk must match HEAD, or the gate
    # silently validates current Spark code against stale oracle SQL
    meta_p = f"{OUT}/oracle_meta.json"
    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True, cwd="/root/repo").stdout.strip()
    dumped = json.load(open(meta_p)).get("commit") if os.path.exists(meta_p) else None
    if dumped != head:
        msg = (f"GRAFT_SKIP_VERIFY: dump at {OUT} is from commit "
               f"{dumped or 'unknown'} but HEAD is {head}")
        if os.environ.get("GRAFT_SKIP_VERIFY_FORCE"):
            print("WARNING:", msg, "(forced on)")
        else:
            print("FATAL:", msg, "— rerun without GRAFT_SKIP_VERIFY or set "
                  "GRAFT_SKIP_VERIFY_FORCE=1 if the diff is known-irrelevant")
            sys.exit(1)


def new_con():
    """Fresh connection per query: bounds memory to one oracle at a time and
    lets DuckDB spill (an in-memory connection CANNOT spill without an
    explicit temp_directory — the round-9 x100 sweep died on exactly that)."""
    c = duckdb.connect()
    tmp = os.environ.get("GRAFT_DUCK_TMP", "/root/repo/target/duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    c.execute(f"SET temp_directory='{tmp}'")
    if os.environ.get("GRAFT_DUCK_MEM"):
        # bound the oracle's memory when something else shares the host
        c.execute(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
    if os.environ.get("GRAFT_DUCK_THREADS"):
        # list-heavy oracles allocate LIST payloads outside the buffer-pool
        # accounting, so per-thread pipeline buffers can overshoot
        # memory_limit by a lot (observed 2x at the x100 replica, kernel
        # OOM kill) - capping threads bounds the concurrent overshoot
        c.execute(f"SET threads={int(os.environ['GRAFT_DUCK_THREADS'])}")
    c.execute("SET preserve_insertion_order=false")  # results get re-sorted anyway
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


# per-query Spark wall seconds recorded by graft.Verify (last-wins across
# ONLY-resume appends); merged into the JSON artifact alongside oracle time
TIMINGS = {}
if os.path.exists(f"{OUT}/timings.jsonl"):
    for line in open(f"{OUT}/timings.jsonl"):
        try:
            d = json.loads(line); TIMINGS[d["query"]] = d["sec"]
        except Exception:
            pass


def record(name, **kw):
    if not ART_PATH:
        return
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None,
           "spark_sec": TIMINGS.get(name), "oracle_sec": None}
    rec.update(kw)
    ART[name] = rec
    tmp = ART_PATH + ".tmp"
    json.dump(dict(sorted(ART.items())), open(tmp, "w"), indent=2)
    os.replace(tmp, ART_PATH)


oracles = json.load(open(f"{OUT}/oracle_sql.json"))
fails = 0
# Crash visibility: a query that dies BEFORE its first parquet write leaves
# NO output dir at all, so the dir-driven loop below would silently skip it
# and FAILURES would under-count (observed round 16: 25 engine crashes on the
# adversarial SF were invisible next to 13 compare failures). Every oracled
# query must have produced a dir — absent means the engine crashed upstream.
expected = set(oracles) if not ONLY else set(oracles) & ONLY
missing = sorted(n for n in expected if not os.path.isdir(os.path.join(OUT, n)))
for name in missing:
    print(f"{name:26s} NO OUTPUT DIR (engine crashed before first write)")
    record(name, err="no spark output dir (engine crashed)")
    fails += 1
for name in sorted(os.listdir(OUT)):
    d = os.path.join(OUT, name)
    if not os.path.isdir(d) or (ONLY and name not in ONLY):
        continue
    parts = glob.glob(f"{d}/*.parquet")
    if not parts:
        # a failed query leaves an empty dir — report, don't crash the rest
        print(f"{name:26s} NO OUTPUT (query failed upstream)"); fails += 1
        record(name, err="no spark output (query failed upstream)")
        continue
    con = new_con()
    got = con.sql(f"SELECT * FROM read_parquet({parts!r})").df()
    got = got.reindex(sorted(got.columns), axis=1)
    if name not in oracles:
        print(f"{name:26s} rows={len(got):7d}  (no oracle — rows-only)")
        record(name, spark_rows=len(got), err="no oracle (rows-only)")
        con.close(); continue
    try:
        t0 = time.time()
        want = con.sql(oracles[name]).df()
        osec = round(time.time() - t0, 3)
    except Exception as e:
        print(f"{name:26s} ORACLE SQL ERROR: {str(e)[:200]}")
        record(name, spark_rows=len(got), err=f"oracle: {str(e)[:300]}")
        fails += 1; con.close(); continue
    want = want.reindex(sorted(want.columns), axis=1)
    ok = True
    schema_ok = list(got.columns) == list(want.columns)
    rows_ok = len(got) == len(want)
    hash_ok = False
    if not schema_ok:
        print(f"{name:26s} COLUMN MISMATCH spark={list(got.columns)} oracle={list(want.columns)}")
        ok = False
    elif not rows_ok:
        print(f"{name:26s} ROWCOUNT spark={len(got)} oracle={len(want)}")
        ok = False
    else:
        hash_ok = True
        g = got.sort_values(list(got.columns), na_position="first").reset_index(drop=True)
        w = want.sort_values(list(want.columns), na_position="first").reset_index(drop=True)
        for c in g.columns:
            if str(g[c].dtype) != str(w[c].dtype):
                # cross-dtype compares below can RAISE (datetime vs int,
                # object vs float) — report the dtype mismatch and stop;
                # hash_match must not stay True on a schema break
                print(f"{name:26s} DTYPE {c}: spark={g[c].dtype} oracle={w[c].dtype}")
                schema_ok = False
                hash_ok = False
                ok = False
                break
            eq = (g[c].fillna("__N") == w[c].fillna("__N")) if g[c].dtype == object \
                else (g[c].isna() & w[c].isna()) | (g[c] == w[c])
            if not eq.all():
                bad = (~eq).idxmax()
                print(f"{name:26s} VALUE MISMATCH col={c} row={bad}: "
                      f"spark={g[c][bad]!r} oracle={w[c][bad]!r}")
                ok = False
                hash_ok = False
                break
    con.close()
    record(name, rows_match=rows_ok, schema_match=schema_ok, hash_match=hash_ok,
           spark_rows=len(got), oracle_rows=len(want), oracle_sec=osec)
    if ok:
        print(f"{name:26s} OK rows={len(got)}")
    else:
        fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
