"""Sustained-drain evidence for the north rule's 10^10-event design point:
one long changelog (default 200M change events) generated to tmpfs, then
drained end-to-end through the streaming engine in a FRESH JVM at one
parallelism level (default local[32]), reporting sustained events/sec and
the final live-row count (byte-identity anchor across rounds: the 100M
drain must keep producing 8,988,190 rows).

Protocol matches scripts/bench_scaling.py (fresh subprocess JVM, 1M-event
warmup drain inside it, tmpfs work dir + per-run spark.local.dir) but at a
single level with epoch-batched triggers sized like the 100M round-1/2
runs (16 files per trigger, 32 buckets) so the numbers chain into one
evidence curve in BASELINE.md.

Usage: python scripts/bench_sustained.py [--events 200000000] [--cpus 32]
       [--files-per-trigger 16] [--n-buckets 32]
Prints ONE JSON line and writes SUSTAINED_<events>.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WARMUP_EVENTS = 1_000_000


def _drain_main(cpus: int, work: str, files_per_trigger: int, n_buckets: int,
                write_mode: str = "cow") -> None:
    from milvus_cdc_spark.session import _mem_avail_gb, get_spark
    from milvus_cdc_spark.streaming.engine import run_until_drained

    # explicit heap opts in to Xms/AlwaysPreTouch, but only when the
    # pre-touched heap fits free memory (same guard as bench.py) —
    # session.py's adaptive sizing handles constrained hosts
    avail = _mem_avail_gb()
    if avail is None or avail >= 20:
        os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

    spark = get_spark(
        "sustained",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
        extra_conf={"spark.local.dir": os.path.join(work, "spark-local")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    run_until_drained(
        spark,
        os.path.join(work, "warmup_log"),
        os.path.join(work, "wtable"),
        os.path.join(work, "wckpt"),
        max_files_per_trigger=8,
        n_buckets=16,
    )
    t0 = time.time()
    task = run_until_drained(
        spark,
        os.path.join(work, "log"),
        os.path.join(work, "table"),
        os.path.join(work, "ckpt"),
        max_files_per_trigger=files_per_trigger,
        n_buckets=n_buckets,
        write_mode=write_mode,
    )
    sec = time.time() - t0
    rows = task.table.read(spark).count()
    epochs = len(task.table.current().epochs)
    spark.stop()
    print(json.dumps({"sec": round(sec, 2), "rows": rows, "epochs": epochs}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--files-per-trigger", type=int, default=16)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--write-mode", choices=["cow", "mor"], default="cow")
    ap.add_argument("--_drain", nargs=5,
                    metavar=("CPUS", "WORK", "FPT", "NB", "MODE"))
    args = ap.parse_args()
    if args._drain:
        c, w, f, b, mode = args._drain
        _drain_main(int(c), w, int(f), int(b), mode)
        return

    base = os.environ.get("SCALING_WORK_DIR", "/dev/shm")
    work = tempfile.mkdtemp(prefix="cdc_sustained_", dir=base)
    try:
        from milvus_cdc_spark.session import get_spark

        gen = get_spark("sustained-gen", master="local[32]",
                        shuffle_partitions=64,
                        extra_conf={"spark.local.dir": os.path.join(work, "gen-local")})
        gen.sparkContext.setLogLevel("ERROR")
        from scripts.bench_scaling import _gen  # same generator, same knobs

        tg0 = time.time()
        # ~1.5M events/file like the round-1/2 100M runs (64 files), so
        # files_per_trigger=16 yields a handful of multi-minute epochs
        n_files = max(64, args.events // 1_500_000)
        _gen(gen, args.events, os.path.join(work, "log"), n_files)
        _gen(gen, WARMUP_EVENTS, os.path.join(work, "warmup_log"), 8)
        gen_sec = time.time() - tg0
        gen.stop()
        print(f"  generated {args.events} events ({n_files} files) "
              f"in {gen_sec:.1f}s", flush=True)

        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_drain",
             str(args.cpus), work, str(args.files_per_trigger),
             str(args.n_buckets), args.write_mode],
            capture_output=True, text=True, timeout=5400,
        )
        out = None
        for line in reversed(r.stdout.strip().splitlines()):
            if line.startswith("{"):
                out = json.loads(line)
                break
        if out is None:
            raise RuntimeError(
                f"drain failed (rc={r.returncode}):\n{r.stdout[-2000:]}\n"
                f"{r.stderr[-2000:]}")
        result = {
            "metric": "cdc_apply_sustained_throughput",
            "value": round(args.events / out["sec"], 1),
            "unit": "events_per_sec",
            "n_events": args.events,
            "cpus": args.cpus,
            "wall_sec": out["sec"],
            "gen_sec": round(gen_sec, 1),
            "final_rows": out["rows"],
            "epochs": out["epochs"],
            "files_per_trigger": args.files_per_trigger,
            "n_buckets": args.n_buckets,
            "write_mode": args.write_mode,
        }
        suffix = "" if args.write_mode == "cow" else f"_{args.write_mode}"
        path = os.path.join(REPO, f"SUSTAINED_{args.events}{suffix}.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
