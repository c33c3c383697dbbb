"""Seeded differential fuzz of the apply engine vs the sequential oracle.

Each case draws EVERYTHING from one deterministic ``random.Random(seed)``:
the changelog shape (skew, tie groups, delete/upsert mix, which DDL kinds
are present), the write mode, the bucket count, the epoch boundaries, the
epoch application ORDER, committed-epoch replays, and the maintenance
actions interleaved between epochs (compact / vacuum / CoW→MOR convert /
rebucket).
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
        col_drops=rng.random() < 0.5,
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
            elif act < 0.50:
                nb2 = rng.choice([2, 4, 8, 16])
                table.rebucket(spark, nb2)  # same-count draw = no-op path
                trace.append(f"rebucket->{nb2}")

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


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_fuzz_patch_stream_converges(spark, tmp_path, seed):
    """In-order epoch fuzz of OP_PATCH streams: random patch density,
    delete/upsert mix, DDL kinds, skew, write mode, epoch cuts,
    committed-epoch replays, and interleaved maintenance. Epochs apply in
    log order — the WAL regime OP_PATCH's contract requires (a patch must
    not COMMIT before its anchor's epoch; see schemas.OP_PATCH boundary
    rule) — and within that regime every other knob is fair game."""
    rng = random.Random(seed)
    n = rng.randrange(2000, 4000)
    knobs = dict(
        seed=seed,
        ties_group=1,
        patch_pct=rng.choice([10, 25, 40]),
        delete_pct=rng.choice([0, 10, 25]),
        upsert_pct=rng.choice([20, 50]),
        n_convs=rng.choice([20, 80]),
        turns_per_conv=rng.choice([5, 20]),
        n_hot=rng.choice([1, 3]),
        hot_pct=rng.choice([0, 30]),
        evolve=rng.random() < 0.7,
        drops=rng.random() < 0.6,
        truncates=rng.random() < 0.4,
        widens=rng.random() < 0.5,
        num_partitions=4,
    )
    log = generate_changelog(spark, n, **knobs).cache()
    try:
        events = [r.asDict() for r in log.collect()]
        assert any(e["op"] == S.OP_PATCH for e in events), "no patches drawn"
        want_rows, want_cols = replay(events)

        write_mode = rng.choice(["cow", "mor"])
        table = SnapshotTable(str(tmp_path / f"patchfuzz{seed}"))
        table.create(
            S.TRANSCRIPTS_BASE_COLUMNS,
            n_buckets=rng.choice([2, 4, 8]),
            write_mode=write_mode,
        )

        k = rng.randrange(2, 6)
        cuts = sorted(rng.sample(range(1, n), k - 1))
        bounds = list(zip([0] + cuts, cuts + [n]))
        trace = []
        for epoch, (lo, hi) in enumerate(bounds):  # in order — see docstring
            batch = log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
            apply_batch(spark, table, batch, epoch=epoch)
            trace.append(f"apply[{lo},{hi})@{epoch}")
            if rng.random() < 0.2:
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
            elif act < 0.50:
                nb2 = rng.choice([2, 4, 8, 16])
                table.rebucket(spark, nb2)  # same-count draw = no-op path
                trace.append(f"rebucket->{nb2}")

        df = table.read(spark)
        cols = sorted(df.columns)
        assert cols == sorted(want_cols), (knobs, trace, cols, want_cols)
        got = sorted(tuple(r[c] for c in cols) for r in df.collect())
        want = sorted(tuple(r[c] for c in cols) for r in want_rows)
        assert got == want, (
            f"seed={seed} knobs={knobs} mode={write_mode} trace={trace}: "
            f"{len(got)} vs {len(want)} rows"
        )
    finally:
        log.unpersist()


@pytest.mark.parametrize("seed", [51, 52])
def test_fuzz_patch_scattered_delivery_through_real_task(
    spark, tmp_path, seed
):
    """Scattered-delivery fuzz of OP_PATCH through the REAL streaming
    engine: random knobs, random file count, adversarially shuffled file
    mtimes (the file source's delivery order), random trigger cap — the
    WAL gate (streaming/wal.py) must re-form lsn-ordered batches and land
    exactly on the sequential oracle. This is the end-to-end pin for the
    round-4 finding that mtime-ordered batching produced batching-
    dependent wrong states."""
    import os

    from milvus_cdc_spark.sources.changelog_gen import write_changelog
    from milvus_cdc_spark.streaming.engine import run_until_drained

    rng = random.Random(seed)
    n = rng.randrange(2000, 4000)
    knobs = dict(
        seed=seed,
        ties_group=1,
        patch_pct=rng.choice([15, 30]),
        delete_pct=rng.choice([5, 20]),
        upsert_pct=rng.choice([20, 50]),
        n_convs=rng.choice([20, 80]),
        evolve=rng.random() < 0.7,
        drops=rng.random() < 0.6,
        num_partitions=4,
    )
    log_df = generate_changelog(spark, n, **knobs).cache()
    try:
        events = [r.asDict() for r in log_df.collect()]
        assert any(e["op"] == S.OP_PATCH for e in events), "no patches drawn"
        want_rows, want_cols = replay(events)

        log = str(tmp_path / f"log{seed}")
        write_changelog(log_df, log, n_files=rng.choice([6, 10]))
        files = sorted(
            f for f in os.listdir(log) if not f.startswith((".", "_"))
        )
        order = list(range(len(files)))
        rng.shuffle(order)
        base = 1_600_000_000
        for f, rank in zip(files, order):
            p = os.path.join(log, f)
            os.utime(p, (base + rank * 11, base + rank * 11))

        task = run_until_drained(
            spark, log,
            str(tmp_path / f"table{seed}"), str(tmp_path / f"ckpt{seed}"),
            max_files_per_trigger=rng.choice([1, 2, 3]),
            n_buckets=rng.choice([4, 8]),
            write_mode=rng.choice(["cow", "mor"]),
        )
        df = task.table.read(spark)
        cols = sorted(df.columns)
        assert cols == sorted(want_cols), (knobs, cols, want_cols)
        got = sorted(tuple(r[c] for c in cols) for r in df.collect())
        want = sorted(tuple(r[c] for c in cols) for r in want_rows)
        assert got == want, (
            f"seed={seed} knobs={knobs} delivery={order}: "
            f"{len(got)} vs {len(want)} rows"
        )
    finally:
        log_df.unpersist()


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_fuzz_rollback_replay_converges(spark, tmp_path, seed):
    """Random rollbacks interleaved with out-of-order epochs: roll the
    table back to the version recorded after an earlier epoch, then
    re-drain every undone epoch (rollback restores the epoch registry, so
    the re-drain REPLAYS rather than skips), possibly rolling back again
    later — any interleaving must land on the sequential oracle. No
    vacuum in this fuzz: rollback targets must stay retained (vacuum
    expiring old manifests is the documented trade; rollback-after-vacuum
    raising is covered in test_round4.py)."""
    rng = random.Random(seed)
    n = 2500
    knobs = dict(
        seed=seed,
        delete_pct=20,
        upsert_pct=40,
        drops=True,
        evolve=True,
        truncates=rng.random() < 0.5,
        widens=rng.random() < 0.5,
        col_drops=rng.random() < 0.5,
        num_partitions=4,
    )
    log = generate_changelog(spark, n, **knobs).cache()
    try:
        want_rows, want_cols = replay([r.asDict() for r in log.collect()])
        write_mode = rng.choice(["cow", "mor"])
        table = SnapshotTable(str(tmp_path / f"rbfuzz{seed}"))
        table.create(
            S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, write_mode=write_mode
        )

        k = 5
        cuts = sorted(rng.sample(range(1, n), k - 1))
        bounds = list(zip([0] + cuts, cuts + [n]))
        order = list(range(k))
        rng.shuffle(order)

        def batch_of(i):
            lo, hi = bounds[i]
            return log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))

        applied: list[int] = []  # bounds-index per epoch (epoch = position)
        versions: list[int] = []  # table version right after each epoch
        trace = []
        for i in order:
            apply_batch(spark, table, batch_of(i), epoch=len(applied))
            trace.append(f"apply#{i}@{len(applied)}")
            applied.append(i)
            versions.append(table.current().version)
            if rng.random() < 0.25:
                table.compact(spark)
                trace.append("compact")
            if len(versions) >= 2 and rng.random() < 0.4:
                j = rng.randrange(0, len(versions) - 1)
                table.rollback(versions[j])
                trace.append(f"rollback->v{versions[j]}(post-epoch-{j})")
                versions = versions[: j + 1]
                for ep in range(j + 1, len(applied)):
                    res = apply_batch(spark, table, batch_of(applied[ep]), epoch=ep)
                    assert not res.get("skipped"), (knobs, trace, ep, res)
                    versions.append(table.current().version)
                    trace.append(f"redrain#{applied[ep]}@{ep}")

        df = table.read(spark)
        cols = sorted(df.columns)
        assert cols == sorted(want_cols), (knobs, trace, cols, want_cols)
        got = sorted(tuple(r[c] for c in cols) for r in df.collect())
        want = sorted(tuple(r[c] for c in cols) for r in want_rows)
        assert got == want, (
            f"seed={seed} knobs={knobs} mode={write_mode} trace={trace}: "
            f"{len(got)} vs {len(want)} rows"
        )
    finally:
        log.unpersist()


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


@pytest.mark.parametrize("seed", [71, 72, 73])
def test_fuzz_constraint_gate_matches_prefiltered_oracle(spark, tmp_path, seed):
    """Seeded fuzz of the ingest constraint gate: random predicates from
    a pool (each with an exact Python mirror of the SQL CHECK rule —
    violation iff the expression is literally FALSE), random changelog
    shape/DDL mix, random epoch cuts and application ORDER, quarantine
    on. The final table must equal ``oracle.replay`` over the events the
    mirror keeps, and the DLQ must hold exactly the violating count —
    the gate composes with every other engine behavior, not just the
    happy path."""
    rng = random.Random(seed)
    n = rng.randrange(1500, 3000)
    knobs = dict(
        seed=seed,
        n_parts=rng.choice([2, 4]),
        n_convs=rng.choice([20, 80]),
        turns_per_conv=rng.choice([5, 20]),
        n_hot=1,
        hot_pct=rng.choice([0, 30]),
        delete_pct=rng.choice([0, 15]),
        upsert_pct=rng.choice([20, 50]),
        ties_group=rng.choice([1, 8]),
        evolve=rng.random() < 0.7,
        drops=rng.random() < 0.5,
        truncates=rng.random() < 0.4,
        widens=rng.random() < 0.5,
        num_partitions=4,
    )
    pool = [
        ("turn_idx % 5 <> 0",
         lambda r: r["turn_idx"] is not None and r["turn_idx"] % 5 == 0),
        ("length(text) <= 40",
         lambda r: r["text"] is not None and len(r["text"]) > 40),
        ("conv_id NOT LIKE '%3'",
         lambda r: r["conv_id"] is not None and r["conv_id"].endswith("3")),
    ]
    chosen = rng.sample(pool, rng.choice([1, 2]))
    log = generate_changelog(spark, n, **knobs).cache()
    try:
        rows = [r.asDict() for r in log.collect()]
        dml = set(S.DML_OPS)

        def violated(r):
            return r["op"] in dml and any(f(r) for _e, f in chosen)

        want_rows, want_cols = replay([r for r in rows if not violated(r)])
        n_vio = sum(1 for r in rows if violated(r))

        table = SnapshotTable(str(tmp_path / f"cfuzz{seed}"))
        table.create(
            S.TRANSCRIPTS_BASE_COLUMNS,
            n_buckets=rng.choice([2, 4, 8]),
            write_mode=rng.choice(["cow", "mor"]),
        )
        k = rng.randrange(2, 5)
        cuts = sorted(rng.sample(range(1, n), k - 1))
        bounds = list(zip([0] + cuts, cuts + [n]))
        order = list(range(k))
        rng.shuffle(order)
        exprs = [e for e, _f in chosen]
        for epoch, i in enumerate(order):
            lo, hi = bounds[i]
            batch = log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
            apply_batch(
                spark, table, batch, epoch=epoch,
                constraints=exprs, on_violation="dlq",
            )

        df = table.read(spark)
        got_cols = sorted(df.columns)
        assert got_cols == sorted(want_cols), (knobs, exprs, got_cols)
        got = sorted(tuple(r[c] for c in got_cols) for r in df.collect())
        want = sorted(tuple(r[c] for c in got_cols) for r in want_rows)
        assert got == want, (
            f"seed={seed} knobs={knobs} exprs={exprs}: "
            f"{len(got)} vs {len(want)} rows"
        )
        import os

        dlq_root = os.path.join(table.root, "dlq")
        n_dlq = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(dlq_root).count()
            if os.path.isdir(dlq_root)
            else 0
        )
        assert n_dlq == n_vio, (knobs, exprs, n_dlq, n_vio)
    finally:
        log.unpersist()
