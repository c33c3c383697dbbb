"""Bucket-count evolution (Iceberg partition-spec-evolution analogue):
rebucket() must preserve logical state, re-route lookups, keep the tail
applying under the new layout, and make a racing writer planned against
the old layout fail loudly instead of scattering its keys."""

import json

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.functions.keyhash import bucket_of
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.plans.manifest import CommitConflictError, SnapshotTable
from milvus_cdc_spark.sources import generate_changelog


def _build(spark, tmp_path, write_mode="cow", epochs=2, n=5000):
    log = generate_changelog(spark, n, n_parts=4, n_convs=40, turns_per_conv=8)
    t = SnapshotTable(str(tmp_path / f"t_{write_mode}"))
    t.create(
        S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, overwrite=True,
        write_mode=write_mode,
    )
    step = n // epochs
    for e in range(epochs):
        apply_batch(
            spark, t,
            log.filter(
                (F.col("lsn") >= e * step) & (F.col("lsn") < (e + 1) * step)
            ),
            epoch=e,
        )
    return t, log, step


def _state(spark, t):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.read(spark).collect()
    )


@pytest.mark.parametrize("write_mode", ["cow", "mor"])
def test_rebucket_preserves_state_and_layout(spark, tmp_path, write_mode):
    t, _log, _step = _build(spark, tmp_path, write_mode=write_mode)
    before = _state(spark, t)
    m0 = t.current()
    m1 = t.rebucket(spark, 16)
    assert m1.n_buckets == 16 and m1.version == m0.version + 1
    assert m1.write_mode == write_mode  # mode survives the rewrite
    assert m1.epochs == m0.epochs  # replay gate intact
    assert m1.summary["rebucketed_from"] == 4
    assert _state(spark, t) == before
    # every file sits under its NEW bucket, and keys route there
    for b, rels in m1.files.items():
        assert all(f"bucket={b}" in r for r in rels)
    # idempotent
    assert t.rebucket(spark, 16).version == m1.version


def test_lookup_routes_by_new_layout(spark, tmp_path):
    t, _log, _step = _build(spark, tmp_path)
    convs = sorted(
        r.conv_id for r in t.read(spark).select("conv_id").distinct().collect()
    )
    t.rebucket(spark, 16)
    m = t.current()
    for conv in convs[:3]:
        got = sorted(
            (r.turn_idx, r.text) for r in t.lookup(spark, conv).collect()
        )
        want = sorted(
            (r.turn_idx, r.text)
            for r in t.read(spark).filter(F.col("conv_id") == conv).collect()
        )
        assert got == want and got
        # and the scan stayed within the re-routed bucket
        b = bucket_of(conv, m.n_buckets)
        assert all(
            f"bucket={b}" in f for f in t.lookup(spark, conv).inputFiles()
        )


def test_tail_continues_after_rebucket(spark, tmp_path):
    """Epochs applied AFTER the rebucket must land under the new layout
    and converge to the same final state as a never-rebucketed twin."""
    t, log, step = _build(spark, tmp_path, epochs=2, n=5000)
    t.rebucket(spark, 16)
    apply_batch(spark, t, log.filter(F.col("lsn") >= 2 * step), epoch=2)
    twin = SnapshotTable(str(tmp_path / "twin"))
    twin.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, overwrite=True)
    for e in range(3):
        batch = log.filter(F.col("lsn") >= e * step)
        if e < 2:
            batch = batch.filter(F.col("lsn") < (e + 1) * step)
        apply_batch(spark, twin, batch, epoch=e)
    assert _state(spark, t) == _state(spark, twin)
    # new epoch's buckets respect the 16-way layout
    assert all(int(b) < 16 for b in t.current().files)


def test_racing_writer_fails_instead_of_rebasing(spark, tmp_path):
    """A commit planned against the pre-rebucket manifest must raise
    CommitConflictError — its buckets were computed under the old
    layout (n_buckets is excluded from the maintenance rebase)."""
    t, _log, _step = _build(spark, tmp_path)
    stale = t.current()
    t.rebucket(spark, 16)
    with pytest.raises(CommitConflictError):
        t.commit(epoch=99, replaced_buckets={0: []}, base=stale)


def test_rebucket_cli_verb(spark, tmp_path):
    import io
    from contextlib import redirect_stdout

    from milvus_cdc_spark.streaming import cli

    t, _log, _step = _build(spark, tmp_path)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(
            ["rebucket", "--table", t.root, "--to-buckets", "16"]
        )
    assert rc == 0
    out = json.loads(buf.getvalue())
    name = next(iter(out))
    assert out[name]["n_buckets"] == 16
    assert t.current().n_buckets == 16
