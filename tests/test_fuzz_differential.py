"""Seeded differential fuzz of the apply engine vs the sequential oracle.

Each case draws EVERYTHING from one deterministic ``random.Random(seed)``:
the changelog shape (skew, tie groups, delete/upsert mix, which DDL kinds
are present), the write mode, the bucket count, the epoch boundaries, the
epoch application ORDER, committed-epoch replays, and the maintenance
actions interleaved between epochs (compact / vacuum / CoW→MOR convert).
The final table must always equal ``oracle.replay`` over the full log —
the same convergence contract the reference's randomized checker threads
assert end-to-end (reference tests/base/checker.py:86-131 drive random
insert/upsert/delete/drop mixes and compare final collection states).

Failures print the full knob dict, so any counterexample is reproducible
by seed alone.
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.oracle import replay
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.sources.changelog_gen import generate_changelog

SEEDS = [101, 202, 303, 404, 505, 606]


def _run_case(spark, tmp_path, seed: int) -> None:
    rng = random.Random(seed)
    n = rng.randrange(1500, 3500)
    knobs = dict(
        seed=seed,
        n_parts=rng.choice([2, 4, 8]),
        n_convs=rng.choice([20, 60, 150]),
        turns_per_conv=rng.choice([5, 20, 50]),
        n_hot=rng.choice([1, 3]),
        hot_pct=rng.choice([0, 20, 50]),
        delete_pct=rng.choice([0, 10, 30]),
        upsert_pct=rng.choice([0, 30, 60]),
        ties_group=rng.choice([1, 4, 16]),
        evolve=rng.random() < 0.7,
        drops=rng.random() < 0.7,
        truncates=rng.random() < 0.5,
        widens=rng.random() < 0.5,
        num_partitions=4,
    )
    log = generate_changelog(spark, n, **knobs).cache()
    try:
        want_rows, want_cols = replay([r.asDict() for r in log.collect()])

        write_mode = rng.choice(["cow", "mor"])
        n_buckets = rng.choice([2, 4, 8])
        table = SnapshotTable(str(tmp_path / f"fuzz{seed}"))
        table.create(
            S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=n_buckets, write_mode=write_mode
        )

        k = rng.randrange(2, 6)
        cuts = sorted(rng.sample(range(1, n), k - 1))
        bounds = list(zip([0] + cuts, cuts + [n]))
        order = list(range(k))
        rng.shuffle(order)
        trace = []
        for epoch, i in enumerate(order):
            lo, hi = bounds[i]
            batch = log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
            apply_batch(spark, table, batch, epoch=epoch)
            trace.append(f"apply[{lo},{hi})@{epoch}")
            if rng.random() < 0.25:
                # replaying a committed epoch must be a no-op skip
                res = apply_batch(spark, table, batch, epoch=epoch)
                assert res.get("skipped"), (knobs, trace, res)
                trace.append(f"replay@{epoch}")
            act = rng.random()
            if act < 0.20:
                table.compact(spark)
                trace.append("compact")
            elif act < 0.30:
                table.vacuum(keep_versions=1, min_age_sec=0.0)
                trace.append("vacuum")
            elif act < 0.40 and write_mode == "cow":
                table.convert(spark, "mor")
                write_mode = "mor"
                trace.append("convert->mor")

        df = table.read(spark)
        got_cols = sorted(df.columns)
        assert got_cols == sorted(want_cols), (knobs, trace, got_cols, want_cols)
        got = sorted(tuple(r[c] for c in got_cols) for r in df.collect())
        want = sorted(tuple(r[c] for c in got_cols) for r in want_rows)
        assert got == want, (
            f"seed={seed} knobs={knobs} mode={write_mode} trace={trace}: "
            f"{len(got)} vs {len(want)} rows"
        )
    finally:
        log.unpersist()


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_apply_matches_sequential_oracle(spark, tmp_path, seed):
    _run_case(spark, tmp_path, seed)


@pytest.mark.parametrize("seed", [7, 8, 9])
def test_fuzz_scattered_epochs_converge(spark, tmp_path, seed):
    """Harsher than contiguous slices: every lsn is hash-assigned to an
    epoch, so each epoch holds a SCATTERED subset of the log (tie groups,
    DDL, and the rows they govern land in different epochs), applied in
    random order. Convergence must not depend on batches being
    ts-contiguous — only on the stored (ts, rank, lsn) ordering."""
    rng = random.Random(seed)
    n = 2500
    log = generate_changelog(
        spark, n, seed=seed, truncates=True, widens=True, num_partitions=4
    ).cache()
    try:
        want_rows, want_cols = replay([r.asDict() for r in log.collect()])
        table = SnapshotTable(str(tmp_path / f"scatter{seed}"))
        table.create(
            S.TRANSCRIPTS_BASE_COLUMNS,
            n_buckets=4,
            write_mode=rng.choice(["cow", "mor"]),
        )
        k = 4
        order = list(range(k))
        rng.shuffle(order)
        for epoch, i in enumerate(order):
            batch = log.filter(
                F.pmod(F.xxhash64("lsn", F.lit(seed)), F.lit(k)) == i
            )
            apply_batch(spark, table, batch, epoch=epoch)
        df = table.read(spark)
        cols = sorted(df.columns)
        assert cols == sorted(want_cols)
        got = sorted(tuple(r[c] for c in cols) for r in df.collect())
        want = sorted(tuple(r[c] for c in cols) for r in want_rows)
        assert got == want, f"seed={seed}: {len(got)} vs {len(want)} rows"
    finally:
        log.unpersist()
