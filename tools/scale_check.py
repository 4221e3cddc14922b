#!/usr/bin/env python3
"""Sharded, out-of-core variant of local_check.py for 30-100x scale
sweeps: same protocol (run graft.Verify first, then compare each dumped
parquet against its DuckDB oracle over the same tables), but built so a
replicated corpus 100x the gate SF cannot kill the checker:

 - per-query WORKER PROCESSES (--procs): each query gets its own DuckDB
   instance with a hard memory_limit and a bounded thread count, so one
   heavy oracle spills to its own temp dir instead of OOMing the run,
   and independent oracles execute in parallel;
 - comparison happens INSIDE DuckDB, streaming: row count + an
   order-independent row-multiset hash (sum of per-row md5 chunks over
   name-sorted, canonically-cast columns). Neither side is ever
   materialized into pandas, so a 60M-row query output costs DuckDB
   aggregation memory, not 2x dataframe RAM;
 - on a hash mismatch with manageable row counts the worker REFALLS to
   the exact pandas comparison (local_check semantics) to rule out
   canonicalization artifacts before reporting a failure;
 - tables may be single parquet FILES or DIRECTORIES of part files
   (ReplicateCorpus files>1) — both sides glob.

Canonicalization: columns sorted by name; approximate/numeric types
(FLOAT/DOUBLE/DECIMAL/HUGEINT/ints) cast to DOUBLE so physical-type
drift between the Spark dump and the oracle (int32 vs BIGINT, DECIMAL
sums vs double) hashes identically — same equivalence pandas' coerced
`==` gave local_check. Lists of floats cast to DOUBLE[]. NULL maps to a
sentinel below any printable value.

ORACLE COST GUARD (round 12): before running a replay, each worker
sums the estimated cardinalities (`EC: N`) over the oracle's own
EXPLAIN plan — a rows-touched estimate of what DuckDB thinks it will
process. A replay whose estimate exceeds --max-oracle-cost still RUNS,
but under a wall-clock interrupt (OVER_BUDGET_TIMEOUT seconds, then
con.interrupt()) and is classified OVER_BUDGET_TIMEOUT if it hits the
limit — bounding the old failure mode (the eight clone-pair replays
spilling 20 min into a malloc death at 100x) without discarding
legitimate verdicts: EC grossly OVERestimates inequality/range joins
(join_overlap's IEJoin estimates |a|x|b| yet finishes in minutes), so
a skip-on-estimate guard would false-positive exactly the replays that
are fine. The estimate is printed on every verdict line, so a replay
drifting toward the budget is visible while it still passes.

INCREMENTAL RE-DUMP PROTOCOL (keep sweeps affordable across rounds):
a full-registry sweep at a decade (30x/100x) stays valid for every
query whose registration block AND oracle text are unchanged. When a
round edits queries:
  1. diff the per-query registration blocks between the swept commit
     and HEAD (git diff over src/main/scala/graft/queries/ plus any
     operator file a changed query calls into);
  2. re-run graft.Verify with the comma-separated changed subset into
     a FRESH out dir (Verify arg 3) — this also rewrites
     oracle_sql.json from HEAD, picking up oracle-text changes;
  3. run this checker with --only over that subset against the same
     replicated corpus;
  4. record the union (prior sweep minus changed, plus re-checked) in
     the round's reports/SWEEP*.md appendix.
This is the procedure the r11 sweep used after the 6f2c55d fixes and
the r12 oracle restructure; it turns an ~hours full re-sweep into
minutes proportional to the diff.
"""
import argparse, json, multiprocessing, os, re, sys, time, traceback

OVER_BUDGET_TIMEOUT = 600  # seconds an over-EC-budget replay may run

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def table_glob(sf_dir, t):
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p

def out_glob(out_dir, name):
    return f"{out_dir}/{name}/*.parquet"

NUMERIC = {"FLOAT", "REAL", "DOUBLE", "HUGEINT", "UHUGEINT",
           "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
           "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}

def canon_expr(col, typ):
    t = typ.upper()
    q = f'"{col}"'
    if t in NUMERIC or t.startswith("DECIMAL("):
        # ids/sums in this corpus stay < 2^53, so the double round-trip
        # is exact; it makes int32/BIGINT/DECIMAL/double hash alike
        return f"CAST(CAST({q} AS DOUBLE) AS VARCHAR)"
    base = t[:-2] if t.endswith("[]") else None
    if base is not None and (base in NUMERIC or base.startswith("DECIMAL(")):
        return f"CAST(CAST({q} AS DOUBLE[]) AS VARCHAR)"
    return f"CAST({q} AS VARCHAR)"

def digest_sql(con, rel_sql):
    """(row_count, hash1, hash2, sorted_cols) for a relation, streamed.
    Hash = sum over rows of two 56-bit md5 chunks of the row string —
    order-independent, collision odds ~2^-112 per query."""
    cols = con.execute(f"DESCRIBE SELECT * FROM ({rel_sql})").fetchall()
    names = sorted((c[0], c[1]) for c in cols)
    exprs = ", ".join(
        f"COALESCE({canon_expr(n, t)}, chr(2))" for n, t in names)
    row = f"md5(concat_ws(chr(31), {exprs}))"
    # hex parses only to BIGINT in DuckDB; sum() auto-widens to HUGEINT
    q = (f"SELECT count(*) AS n, "
         f"COALESCE(sum(('0x' || substr(h, 1, 14))::BIGINT), 0) AS h1, "
         f"COALESCE(sum(('0x' || substr(h, 15, 14))::BIGINT), 0) AS h2 "
         f"FROM (SELECT {row} AS h FROM ({rel_sql}))")
    n, h1, h2 = con.execute(q).fetchone()
    return int(n), int(h1), int(h2), [n for n, _ in names]

def pandas_fallback(con, spark_sql, oracle_sql, limit_rows):
    n = con.execute(f"SELECT count(*) FROM ({spark_sql})").fetchone()[0]
    if n > limit_rows:
        return None  # too big to re-check exactly
    a = con.execute(spark_sql).fetchdf()
    b = con.execute(oracle_sql).fetchdf()
    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    a, b = norm(a), norm(b)
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            eq = (av == bv) | (av.isna() & bv.isna())
        except Exception:
            eq = av.astype(str) == bv.astype(str)
        if not eq.all():
            return False
    return True

def oracle_cost(con, sql):
    """Rows-touched estimate: sum of the optimizer's estimated
    cardinalities (EC) over the replay's physical plan. None when the
    plan won't EXPLAIN (e.g. recursive CTE corner) — never fatal."""
    try:
        plan = con.execute(f"EXPLAIN SELECT * FROM ({sql})").fetchall()
        text = "\n".join(p[1] for p in plan)
        ecs = [int(m) for m in re.findall(r"EC:\s*(\d+)", text)]
        return sum(ecs) if ecs else None
    except Exception:
        return None


def check_one(job):
    name, sf_dir, out_dir, sql, mem, threads, fallback_rows, max_cost = job
    t0 = time.time()
    try:
        import duckdb
        con = duckdb.connect()
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET threads={threads}")
        con.execute(f"SET temp_directory='{out_dir}/.duckdb_tmp_{name}'")
        # every comparison here is an order-INDEPENDENT row-multiset
        # hash, so DuckDB's insertion-order guarantee buys nothing —
        # dropping it lets joins/aggregations stream instead of
        # buffering ordered batches (the graph_pagerank oracle at 30x
        # spilled >75 GB of ordered intermediates with it on)
        con.execute("SET preserve_insertion_order=false")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{table_glob(sf_dir, t)}')")
        spark_sql = f"SELECT * FROM read_parquet('{out_glob(out_dir, name)}')"
        cost = oracle_cost(con, sql) if sql is not None else None
        cost_tag = f" est_rows={cost:,}" if cost is not None else ""
        # Over-budget replays RUN, but under a wall-clock interrupt
        # (con.interrupt() from a timer thread): EC is an optimizer
        # guess that grossly overestimates range/inequality joins
        # (join_overlap's IEJoin estimates |a|x|b| but runs fine), so
        # skipping on it alone throws away legitimate verdicts — while
        # the truly fatal replays (clone-pair joins) die inside the
        # timeout instead of spilling for 20 min into a malloc death.
        sn, sh1, sh2, scols = digest_sql(con, spark_sql)
        if sql is None:
            v = f"rows_only({sn})" + (" EMPTY!" if sn == 0 else "")
            return name, v, time.time() - t0
        # the interrupt timer covers ONLY the oracle replay: the Spark
        # dump digest above is a plain parquet scan whose slowness (cold
        # page cache, a big dump) must never be misclassified as an
        # oracle OVER_BUDGET_TIMEOUT
        timer = None
        if cost is not None and max_cost and cost > max_cost:
            import threading
            cost_tag += f" over_budget_timeout={OVER_BUDGET_TIMEOUT}s"
            timer = threading.Timer(OVER_BUDGET_TIMEOUT, con.interrupt)
            timer.daemon = True
            timer.start()
        on, oh1, oh2, ocols = digest_sql(con, f"SELECT * FROM ({sql})")
        if timer is not None:
            timer.cancel()
        if scols != ocols:
            return name, f"SCHEMA_MISMATCH spark={scols} oracle={ocols}", time.time() - t0
        if sn != on:
            return name, f"ROWCOUNT_MISMATCH spark={sn} oracle={on}", time.time() - t0
        if sn == 0:
            return name, "VACUOUS_EMPTY_MATCH", time.time() - t0
        if (sh1, sh2) == (oh1, oh2):
            return name, "OK" + cost_tag, time.time() - t0
        # hash mismatch: distinguish a real value diff from a
        # canonicalization artifact with the exact pandas compare
        fb = pandas_fallback(con, spark_sql, f"SELECT * FROM ({sql})",
                             fallback_rows)
        if fb is True:
            return name, "OK(pandas-fallback: hash canon artifact)", time.time() - t0
        tag = "HASH_MISMATCH" if fb is None else "VALUE_MISMATCH"
        return name, f"{tag} spark=({sn},{sh1:x},{sh2:x}) oracle=({on},{oh1:x},{oh2:x})", time.time() - t0
    except Exception as e:
        if type(e).__name__ == "InterruptException":
            return (name, f"OVER_BUDGET_TIMEOUT(est={cost:,}, "
                    f"{OVER_BUDGET_TIMEOUT}s) — replay interrupted; "
                    "restructure it to the distinct-key discipline or "
                    "raise --max-oracle-cost", time.time() - t0)
        return name, f"ERROR: {type(e).__name__}: {e}", time.time() - t0

def main():
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--only", help="comma-separated query subset")
    ap.add_argument("--skip", help="comma-separated queries to skip")
    ap.add_argument("--procs", type=int, default=4,
                    help="parallel worker processes (default 4)")
    ap.add_argument("--mem", default="20GB",
                    help="DuckDB memory_limit per worker (default 20GB)")
    ap.add_argument("--threads", type=int, default=8,
                    help="DuckDB threads per worker (default 8)")
    ap.add_argument("--fallback-rows", type=int, default=2_000_000,
                    help="max rows for the exact pandas re-check on a "
                         "hash mismatch (default 2M)")
    ap.add_argument("--max-oracle-cost", type=int, default=20_000_000_000,
                    help="EC budget on the replay's EXPLAIN rows-touched "
                         "estimate (sum of EC). A replay estimated above "
                         "this still RUNS, but under a wall-clock "
                         f"interrupt ({OVER_BUDGET_TIMEOUT}s, then "
                         "con.interrupt()) and is classified "
                         "OVER_BUDGET_TIMEOUT if it hits the limit. "
                         "0 disables. (default 20e9 — ~10x the heaviest "
                         "restructured 100x replay)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    skip = set(args.skip.split(",")) if args.skip else set()

    oracle = json.load(open(f"{args.out_dir}/oracle_sql.json"))
    dumped = {n for n in os.listdir(args.out_dir)
              if os.path.isdir(os.path.join(args.out_dir, n))
              and not n.startswith(".")}
    attempted_file = os.path.join(args.out_dir, "attempted.json")
    attempted = set(json.load(open(attempted_file))) \
        if os.path.exists(attempted_file) else dumped
    if only:
        attempted &= only
        dumped &= only
    dumped -= skip
    results = {n: "NO_OUTPUT_DIR (query threw in Verify?)"
               for n in attempted - dumped - skip}

    jobs = [(n, args.sf_dir, args.out_dir, oracle.get(n), args.mem,
             args.threads, args.fallback_rows, args.max_oracle_cost)
            for n in sorted(dumped)]
    # one task per worker process: a DuckDB connection's buffers are not
    # reliably released when the NEXT job's connection spins up in the
    # same process, and at a 90 GB memory_limit two connections' worth
    # of residue is a system-level malloc failure (seen: tok_bpe "bad
    # allocation" 27 s in, right after a 500 s spill-heavy neighbor)
    with multiprocessing.Pool(args.procs, maxtasksperchild=1) as pool:
        for name, verdict, secs in pool.imap_unordered(check_one, jobs):
            results[name] = verdict
            print(f"[scale_check] {name:24} {verdict}  ({secs:.1f}s)",
                  file=sys.stderr, flush=True)

    def ok(v):
        return v.startswith("OK") or (v.startswith("rows_only")
                                      and "EMPTY" not in v)
    bad = {k: v for k, v in results.items() if not ok(v)}
    for k, v in sorted(results.items()):
        print(f"{'PASS' if k not in bad else 'FAIL':4} {k:24} {v}")
    print(f"\n{len(results) - len(bad)}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
