#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify
first (sbt "runMain graft.Verify <sfDir> <outDir>"), then this script
compares each dumped parquet against its DuckDB oracle on the same
tables. Mirrors the driver: sort columns by name, sort rows, compare."""
import argparse, json, sys, glob, os, time
import duckdb
import pandas as pd

# progress (name + seconds per oracle) streams to stderr so a hung
# oracle is identifiable without waiting for the final table.
ap = argparse.ArgumentParser(description=__doc__)
ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
ap.add_argument("out_dir", nargs="?", default="/tmp/verify_out")
ap.add_argument("--only", help="comma-separated: check just these queries")
ap.add_argument("--skip", help="comma-separated: check all but these")
ap.add_argument("--hash", action="store_true", dest="hash_mode",
                help="also compute the driver-style canonical hash of each "
                     "side (sorted columns, sorted rows, canonicalized cell "
                     "values -> sha256) and fail on HASH_MISMATCH even when "
                     "exact value equality passes. Mirrors the r16 "
                     "RECONSTRUCTION of the driver's verdict (the driver "
                     "source is not in this repo): the one documented fact "
                     "is that it sorts columns by name before hashing "
                     "values; cell canonicalization here is repr() of the "
                     "python value (shortest float repr), NaN/None -> \\x00. "
                     "A bit-level float difference (e.g. -0.0 vs 0.0, or a "
                     "last-ulp drift) flips this hash while the == compare "
                     "can still pass -- exactly the class a driver "
                     "hash_match=false / local-OK split (r15 win_moving_avg) "
                     "would come from. See reports/ORACLEENV_r16.md.")
args = ap.parse_args()
sf_dir, out_dir = args.sf_dir, args.out_dir
only_q = set(args.only.split(",")) if args.only else None
skip_q = set(args.skip.split(",")) if args.skip else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
# A query that THREW in Verify leaves no output dir and would be
# invisible here (the checker only walks dirs that exist). Verify
# writes attempted.json — the exact post-filter set it tried to dump —
# so every attempted-but-missing name is a hard failure regardless of
# how many other queries also died. Fallback for dumps from an older
# Verify: flag missing oracle keys only when the run looks full.
dumped = {n for n in os.listdir(out_dir)
          if os.path.isdir(os.path.join(out_dir, n))}
attempted_file = os.path.join(out_dir, "attempted.json")
if os.path.exists(attempted_file):
    missing = set(json.load(open(attempted_file))) - dumped
else:
    missing = set(oracle) - dumped
    if len(dumped) <= len(oracle) * 0.9:
        missing = set()
for name in missing:
    results[name] = "NO_OUTPUT_DIR (query threw in Verify?)"
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    if only_q is not None and name not in only_q:
        continue
    if skip_q is not None and name in skip_q:
        continue
    t0 = time.time()
    print(f"[check] {name} ...", file=sys.stderr, flush=True)
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        results[name] = "NO_OUTPUT"
        continue
    spark_df = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        results[name] = f"rows_only({len(spark_df)})" + (
            " EMPTY!" if len(spark_df) == 0 else "")
        continue
    try:
        oracle_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    print(f"[check] {name} oracle done in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    def _verdict(v, name=name):
        print(f"[check] {name} -> {v}", file=sys.stderr, flush=True)
        return v
    def norm(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        results[name] = _verdict(f"SCHEMA_MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
        continue
    if len(a) != len(b):
        results[name] = _verdict(f"ROWCOUNT_MISMATCH spark={len(a)} oracle={len(b)}")
        continue
    mismatched = []
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            eq = (av == bv) | (av.isna() & bv.isna())
        except Exception:
            eq = av.astype(str) == bv.astype(str)
        if not eq.all():
            idx = (~eq).idxmax()
            mismatched.append(f"{c}[row{idx}]: spark={av[idx]!r} oracle={bv[idx]!r} dtypes {av.dtype}/{bv.dtype}")
    if mismatched:
        results[name] = _verdict("VALUE_MISMATCH " + "; ".join(mismatched[:3]))
        continue
    if args.hash_mode:
        import hashlib
        import numpy as np
        def canon_cell(v):
            # unwrap numpy scalars FIRST (numpy 2.x repr is
            # 'np.float64(0.1)'); plain-python repr is the shortest
            # round-trip string, so any BIT difference between the two
            # engines' doubles (incl. -0.0 vs 0.0, which == treats as
            # equal) changes the hash
            if isinstance(v, np.ndarray):
                v = v.tolist()
            if isinstance(v, np.floating):
                v = float(v)
            elif isinstance(v, np.integer):
                v = int(v)
            elif isinstance(v, np.bool_):
                v = bool(v)
            if isinstance(v, (list, tuple)):
                return "[" + ",".join(canon_cell(x) for x in v) + "]"
            if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
                return "\x00"
            return repr(v)
        def canon_hash(df):
            h = hashlib.sha256()
            for row in df.itertuples(index=False):
                for v in row:
                    h.update(canon_cell(v).encode())
                    h.update(b"\x01")
                h.update(b"\x02")
            return h.hexdigest()
        ha, hb = canon_hash(a), canon_hash(b)
        if ha != hb:
            results[name] = _verdict(
                f"HASH_MISMATCH (values == but canonical hash differs: "
                f"spark={ha[:12]} oracle={hb[:12]} — bit-level float "
                f"drift, run a cell-by-cell struct.pack comparison)")
            continue
    # an empty frame matching an empty oracle is a VACUOUS pass —
    # join_fuzzy once shipped a blocking refinement that silently
    # zeroed its own output and the gate kept passing on 0 == 0.
    # Flag it as a local FAILURE so it gets looked at.
    results[name] = _verdict("VACUOUS_EMPTY_MATCH" if len(a) == 0 else "OK")

ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows_only("))
bad = {k: v for k, v in results.items() if not (v == "OK" or (v.startswith("rows_only") and "EMPTY" not in v))}
for k, v in sorted(results.items()):
    print(f"{'PASS' if k not in bad else 'FAIL':4} {k:24} {v}")
print(f"\n{len(results)-len(bad)}/{len(results)} pass")
sys.exit(1 if bad else 0)
