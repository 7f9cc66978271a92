#!/usr/bin/env python3
"""Reproducible Spark-vs-DuckDB head-to-head at a given SF dir.

This is the judge's method, checked in so any round can re-run it
without archaeology (round-6 VERDICT "Next round" #8):

  * DuckDB side: each oracle SQL from `graft.Verify`'s oracle_sql.json
    runs in a FRESH OS process (stronger than a fresh connection),
    32 threads, 24 GB memory limit, min-of-N wall time (default 2),
    180 s timeout per query.
  * Spark side: per-query seconds come from a Bench artifact
    (BENCH_local_r*.json or a driver BENCH_r*.json) produced by
    `graft.Bench` on the same box and SF.
  * Ratios are reported over the documented cuts below, so the
    "within 2x of the oracle engine" bar is checked on stated,
    reproducible terms rather than whichever artifact is at hand.

Usage:
  python3 bench_duckdb.py [--sf /root/testdata/sf0.1]
      [--bench BENCH_local_r7.json] [--oracle /tmp/graft_verify/oracle_sql.json]
      [--reps 2] [--timeout 180] [--out /tmp/headtohead.json]
  python3 bench_duckdb.py --one <name> --sf ... --oracle ...   # internal

The Spark artifact and oracle_sql.json must come from the same HEAD
(run `sbt "runMain graft.Verify <sf> /tmp/graft_verify"` and
`SPARK_GRAFT_SF_DIR=<sf> SPARK_GRAFT_BENCH_OUT=BENCH_local_rN.json
sbt "runMain graft.Bench"` first).
"""
import argparse
import json
import os
import subprocess
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# ---- documented exclusion cuts ---------------------------------------
# Faces whose DuckDB oracle is a bespoke-math SQL restatement that is
# inherently pathological for a vectorized SQL engine while the Spark
# side runs the same math as codegen'd JVM expressions. Keeping them in
# flatters Spark; each line says why the SQL form is pathological.
DUCK_PATHOLOGICAL = {
    "q_embed_docs": "hash-model embedding restated as pure SQL (512-dim per-row recursive hash fold); >180 s in DuckDB at sf0.1",
    "q_embed_search": "same hash-model restatement plus a search join; >180 s in DuckDB at sf0.1",
    "q_text_embedding_sql": "same hash-model restatement through the SQL function face",
    "q_multimodal_features": "splitmix64 byte-fold over binary blobs restated as recursive SQL (~20 s DuckDB vs sub-second JVM)",
    "q_image_dedup": "perceptual dHash = per-pixel SQL over unnested bytes (~20 s DuckDB)",
    "q_winnow": "FNV byte-fold winnowing restated as positional SQL over every gram (~22 s DuckDB)",
    "q_winnow_overlap": "winnow fold twice + self-join (~23 s DuckDB)",
    "q_embdup_cos": "all-pairs cosine in SQL; no index, quadratic unnest (~9 s DuckDB)",
    "q_embdup_cos_lsh": "hyperplane signature fold restated per dimension in SQL (~9 s DuckDB)",
    "q_simhash_dups": "64-bit FNV token folds + bit-count pigeonhole restated in SQL (~8 s DuckDB)",
    "q_embed_incremental": "full hash-model restatement (the oracle re-embeds everything; the Spark side's whole point is NOT to); >180 s in DuckDB at sf0.1",
    "q_maxsim_search": "hash-model restatement over every chunk; >180 s in DuckDB at sf0.1",
}
# The round-5 judge's narrower cut: only the historic hash-model
# restatements (the subset of the above that existed before round 6).
BESPOKE_HISTORIC = ["q_embed_docs", "q_embed_search",
                    "q_text_embedding_sql", "q_multimodal_features"]
# Faces that do real durable writes (parquet/CSV/JSONL shards, index
# dirs, streaming checkpoints) their oracles do not restate — the gap
# IS the write barriers under test. Reported both kept and dropped.
WRITE_FACES = {
    "q_csv_sink": "writes + re-parses a CSV artifact",
    "q_jsonl_sink": "writes size-bounded JSONL shards; oracle re-parses",
    "q_dedup_stream_replay": "2 streaming micro-batches + checkpoint replay",
    "q_vec_ingest_replay": "streaming ingest + crash re-run through checkpoints",
    "q_ivf_append_knn": "fresh index build + append (durable artifact)",
    "q_ivf_sq_append_knn": "fresh SQ8 index build + append",
    "q_ivf_compact_knn": "fresh index build + append + full cell-compaction rewrite",
    "q_ivf_merge_knn": "TWO shard index builds + merge + compaction (durable artifacts)",
    "q_ivf_f16_append": "fresh F16 index build + append (durable artifact)",
    "q_sparse_append": "fresh sparse inverted-file build + append + sidecar swap",
    "q_sparse_compact": "fresh sparse build + 2 appends + full bucket-compaction rewrite",
    "q_ivf_delete_knn": "fresh index build + tombstone delete + full compaction purge",
    "q_sparse_delete": "fresh sparse build + tombstone delete + purge-with-recount compaction",
    "q_mv_retention": "two-day ingest lifecycle: 3 durable base parquet writes + rollup chunk write + chunk drop per call; writes-only control 0.68 s of the 2.17 s face (r13 measurement), oracle restates only the final group-by",
    "q_mv_retract": "GDPR-erasure lifecycle: full base overwrite + negated-partials chunk write + post-delete base rewrite per call; writes-only control 0.58 s of the 1.74 s face (r13 measurement), oracle restates only the final group-by",
}


def fresh_con(sf):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def run_one(name, sql, sf):
    con = fresh_con(sf)
    t0 = time.time()
    con.execute(sql).fetchall()
    return time.time() - t0


def time_duckdb(name, sql, sf, reps, timeout):
    """min-of-reps, each rep a fresh OS process; None on timeout/error."""
    best = None
    for _ in range(reps):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name,
                 "--sf", sf, "--oracle", ARGS.oracle],
                capture_output=True, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            return None, "timeout"
        if r.returncode != 0:
            return None, (r.stderr or "error").strip().splitlines()[-1][:200]
        sec = float(r.stdout.strip().splitlines()[-1])
        best = sec if best is None else min(best, sec)
    return best, None


def summarize(spark, duck, names, label, lines):
    both = [n for n in names if n in spark and duck.get(n) is not None]
    s = sum(spark[n] for n in both)
    d = sum(duck[n] for n in both)
    ratio = s / d if d else float("nan")
    lines.append(f"{label}: {len(both)} queries, Spark {s:.1f} s vs "
                 f"DuckDB {d:.1f} s = {ratio:.2f}x")
    return {"label": label, "n": len(both), "spark_sec": round(s, 2),
            "duckdb_sec": round(d, 2), "ratio": round(ratio, 3)}


def main():
    with open(ARGS.oracle) as f:
        oracle = json.load(f)
    if ARGS.one:
        print(f"{run_one(ARGS.one, oracle[ARGS.one], ARGS.sf):.4f}")
        return
    with open(ARGS.bench) as f:
        bench = json.load(f)
    spark = bench["queries"]
    # Prefer the pure-search split for index-bearing faces? No — keep
    # the full wall time; the build/search split is reported alongside
    # in the bench artifact itself, and the cuts handle write faces.
    duck, skipped = {}, {}
    for name in sorted(oracle):
        if name not in spark:
            skipped[name] = "not in spark bench artifact"
            continue
        sec, err = time_duckdb(name, oracle[name], ARGS.sf,
                               ARGS.reps, ARGS.timeout)
        if err:
            skipped[name] = err
            print(f"[duck] {name}: {err}", file=sys.stderr)
        else:
            duck[name] = sec
            print(f"[duck] {name}: {sec:.3f}s", file=sys.stderr)

    comparable = [n for n in duck if n in spark]
    lines = []
    cuts = [
        summarize(spark, duck, comparable, "all_comparable", lines),
        summarize(spark, duck,
                  [n for n in comparable if n not in BESPOKE_HISTORIC],
                  "judge_r5_method", lines),
        summarize(spark, duck,
                  [n for n in comparable if n not in DUCK_PATHOLOGICAL],
                  "strict_no_pathological", lines),
        summarize(spark, duck,
                  [n for n in comparable if n not in DUCK_PATHOLOGICAL
                   and n not in WRITE_FACES],
                  "strict_no_pathological_no_writes", lines),
    ]
    out = {
        "sf": ARGS.sf, "bench_artifact": ARGS.bench, "reps": ARGS.reps,
        "cuts": cuts, "duckdb_sec": {k: round(v, 3) for k, v in duck.items()},
        "spark_sec": {n: spark[n] for n in comparable},
        "skipped": skipped,
        "exclusions": {"duck_pathological": DUCK_PATHOLOGICAL,
                       "write_faces": WRITE_FACES,
                       "bespoke_historic": BESPOKE_HISTORIC},
    }
    with open(ARGS.out, "w") as f:
        json.dump(out, f, indent=1)
    print("\n".join(lines))
    print(f"wrote {ARGS.out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--bench", default="BENCH_local_r7.json")
    ap.add_argument("--oracle", default="/tmp/graft_verify/oracle_sql.json")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--timeout", type=int, default=180)
    ap.add_argument("--out", default="/tmp/headtohead.json")
    ap.add_argument("--one", default=None)
    ARGS = ap.parse_args()
    main()
