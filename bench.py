"""Benchmark harness. Prints ONE JSON line:

{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {...per-query sec...}, "sf": <sf>,
 "cdc": {"n_events": N, "events_per_sec": X, ...}}

Headline: CDC apply throughput — a synthetic transcript changelog sized to
the SF dir is drained through the real streaming engine (micro-batched
dedup+MERGE into a SnapshotTable), the north-rule metric. Plus wall times
for representative queries() entries at $SPARK_GRAFT_SF_DIR.

env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), CDC_BENCH_EVENTS (override size).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "cdc_final_state",
    "cdc_last_writer",
    "cdc_lineage",
    "doc_dedup_exact",
    "doc_minhash_lsh",
    "doc_text_stats",
    "emb_neardup",
    "ann_topk_bruteforce",
    "tpch_pricing_summary",
    "tpch_revenue_by_nation",
]


def _state_fingerprint(df):
    """Order-insensitive (hash-sum, row-count) fingerprint of a table
    state — one aggregate job, no driver materialization."""
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    r = (
        df.select(
            F.xxhash64(
                *[F.col(c).cast("string") for c in cols]
            ).alias("h")
        )
        .agg(
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    return (int(r["s"] or 0), int(r["n"]))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    # explicit heap size opts in to Xms/AlwaysPreTouch (see session.py —
    # lazy heap first-touch at 32 threads measured 97% system CPU) — but
    # only when the pre-touched heap actually fits in free memory, so the
    # bench JVM can't fail at startup on a constrained host (session.py's
    # adaptive sizing handles that case instead)
    from milvus_cdc_spark.session import _mem_avail_gb, get_spark

    avail = _mem_avail_gb()
    if avail is None or avail >= 20:
        os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    from milvus_cdc_spark.sources import generate_changelog, write_changelog
    from milvus_cdc_spark.streaming.engine import run_until_drained
    import __spark_entry__ as entrymod

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    t_all = time.time()

    # ---- CDC apply throughput (headline) --------------------------------
    # sized so the apply runs in the amortized regime (~10M events at
    # sf0.1): small logs measure per-epoch fixed cost, not throughput —
    # SCALING.json carries the full-size (48M) evidence
    n_events = int(os.environ.get("CDC_BENCH_EVENTS", "0")) or max(
        200_000, int(100_000_000 * sf) if sf > 0 else 200_000
    )
    # tmpfs when available: the sandbox's single virtual disk serializes
    # parquet writes at any core count (a multi-node cluster's aggregate
    # disk bandwidth scales with executors); see scripts/bench_scaling.py
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="cdc_bench_", dir=base)
    log_dir = os.path.join(work, "log")
    t0 = time.time()
    write_changelog(
        generate_changelog(
            spark, n_events, n_parts=32, n_convs=max(200, n_events // 500),
            turns_per_conv=50,
        ),
        log_dir,
        n_files=16,
    )
    gen_sec = time.time() - t0

    # best-of-2 drains (sustained 32-thread user CPU on this host varies up
    # to ~1.7x run-to-run; rep 1 additionally warms JIT/codegen for rep 2)
    apply_reps = []
    for rep in range(2):
        t0 = time.time()
        task = run_until_drained(
            spark,
            log_dir,
            os.path.join(work, f"table{rep}"),
            os.path.join(work, f"ckpt{rep}"),
            max_files_per_trigger=8,
            n_buckets=16,
        )
        apply_reps.append(time.time() - t0)
    apply_sec = min(apply_reps)
    n_epochs = len(task.table.current().epochs)
    final_rows = task.table.read(spark).count()

    # merge-on-read twin over the SAME log, best-of-2 like the headline
    # (single-rep drains on this host vary up to ~2x run-to-run, which
    # read as fake mode regressions round-over-round). Final row count
    # must match cow exactly — the cross-mode convergence anchor.
    mor_reps = []
    for rep in range(2):
        t0 = time.time()
        mtask = run_until_drained(
            spark,
            log_dir,
            os.path.join(work, f"table_mor{rep}"),
            os.path.join(work, f"ckpt_mor{rep}"),
            max_files_per_trigger=8,
            n_buckets=16,
            write_mode="mor",
        )
        mor_reps.append(time.time() - t0)
    mor_sec = min(mor_reps)
    mor_rows = mtask.table.read(spark).count()

    # partial-update twin: same event count with 15% OP_PATCH events,
    # drained CoW. Exercises the per-column-ordinal merge
    # (compose_patch_actions + merge_patched_actions) at bench scale.
    # SELF-CHECKING: the two reps run at DIFFERENT trigger caps and the
    # final states must hash-equal — patch apply is read-modify-write, so
    # any batching dependence (the round-4 WAL-ordering bug) shows up as
    # patch_state_match=false instead of silently benchmarking a wrong
    # state. The changelog writer's parallel tasks give the files
    # effectively random mtimes, so this also exercises the WAL gate's
    # out-of-order delivery path, not just a happy in-order drain.
    patch_log = os.path.join(work, "plog")
    write_changelog(
        generate_changelog(
            spark, n_events, n_parts=32, n_convs=max(200, n_events // 500),
            turns_per_conv=50, ties_group=1, patch_pct=15,
        ),
        patch_log,
        n_files=16,
    )
    patch_reps = []
    patch_states = []
    for rep, mft in enumerate((8, 3)):
        t0 = time.time()
        ptask = run_until_drained(
            spark,
            patch_log,
            os.path.join(work, f"table_patch{rep}"),
            os.path.join(work, f"ckpt_patch{rep}"),
            max_files_per_trigger=mft,
            n_buckets=16,
        )
        patch_reps.append(time.time() - t0)
        patch_states.append(_state_fingerprint(ptask.table.read(spark)))
    patch_sec = min(patch_reps)
    patch_rows = patch_states[0][1]
    patch_state_match = patch_states[0] == patch_states[1]
    shutil.rmtree(work, ignore_errors=True)

    # ---- representative queries (best of 2 for the same reason) ----------
    queries = entrymod.queries()
    q_times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        reps = []
        for _ in range(2):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            reps.append(time.time() - t0)
        q_times[name] = round(min(reps), 3)

    total = time.time() - t_all
    print(
        json.dumps(
            {
                "metric": "cdc_apply_plus_queries_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": q_times,
                "sf": sf,
                "cdc": {
                    "n_events": n_events,
                    "gen_sec": round(gen_sec, 3),
                    "apply_sec": round(apply_sec, 3),
                    "apply_sec_reps": [round(x, 3) for x in apply_reps],
                    "events_per_sec": round(n_events / apply_sec, 1),
                    "n_epochs": n_epochs,
                    "final_rows": final_rows,
                    "mor_apply_sec": round(mor_sec, 3),
                    "mor_apply_sec_reps": [round(x, 3) for x in mor_reps],
                    "mor_events_per_sec": round(n_events / mor_sec, 1),
                    "mor_final_rows_match": mor_rows == final_rows,
                    "patch_apply_sec": round(patch_sec, 3),
                    "patch_apply_sec_reps": [round(x, 3) for x in patch_reps],
                    "patch_events_per_sec": round(n_events / patch_sec, 1),
                    "patch_final_rows": patch_rows,
                    "patch_state_match": patch_state_match,
                    "cpus": cpus,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
