"""OP_PATCH partial-row updates: per-column last-writer-wins.

Beyond-reference operator (Milvus' data model is insert+delete only,
/root/reference/core/writer/channel_writer.go:139-212); semantics are
the declarative per-column LWW rule in schemas.OP_PATCH's docstring.
Every scenario is checked against the sequential ord-order fold
(milvus_cdc_spark.oracle.replay) and, where epochs split, against the
single-epoch engine result — the same convergence contract the anchor
ops carry.
"""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.oracle import replay
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.sources.changelog_gen import generate_changelog


def _mk(spark, rows):
    return spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)


def _ev(lsn, op, conv, turn, sec, role=None, text=None, tool=None, part=0,
        extra=None, micro=0):
    return (
        lsn,
        datetime(2024, 1, 1, 0, 0, sec, micro),
        part,
        op,
        conv,
        turn,
        role,
        text,
        tool,
        None,
        extra,
    )


def _rows(events):
    return [
        {
            "lsn": e[0], "ts": e[1], "part": e[2], "op": e[3],
            "conv_id": e[4], "turn_idx": e[5], "role": e[6], "text": e[7],
            "tool": e[8], "ddl_arg": e[9], "extra": e[10],
        }
        for e in events
    ]


def _table(tmp_path, mode="cow", n_buckets=4):
    t = SnapshotTable(str(tmp_path / f"t_{mode}"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=n_buckets, write_mode=mode)
    return t


def _state(spark, t):
    return sorted(
        (
            (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"],
             r["ts"], r["lsn"])
            for r in t.read(spark).collect()
        )
    )


def _oracle_state(events):
    rows, _ = replay(_rows(events))
    return sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"],
         r["ts"], r["lsn"])
        for r in rows
    )


def _apply_epochs(spark, t, events, cuts):
    """Apply `events` (list) as epochs split at lsn `cuts`."""
    df = _mk(spark, events)
    bounds = [-1] + list(cuts) + [10**15]
    for i in range(len(bounds) - 1):
        batch = df.filter(
            (F.col("lsn") > bounds[i]) & (F.col("lsn") <= bounds[i + 1])
        )
        apply_batch(spark, t, batch, epoch=i)
    return t


BASE = [
    _ev(1, "INSERT", "c1", 1, 1, role="user", text="a1", tool=None),
    _ev(2, "INSERT", "c1", 2, 2, role="assistant", text="a2", tool="t0"),
    _ev(3, "INSERT", "c2", 1, 3, role="user", text="b1", tool=None),
]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_patch_overwrites_nonnull_keeps_null(spark, tmp_path, mode):
    """One patch on a live row: tool lands, text lands, role untouched;
    row ts/lsn advance to the patch's."""
    events = BASE + [_ev(10, "PATCH", "c1", 1, 9, text="a1x", tool="hammer")]
    t = _table(tmp_path, mode)
    _apply_epochs(spark, t, events, cuts=[3])
    assert _state(spark, t) == _oracle_state(events)
    row = {(r[0], r[1]): r for r in _state(spark, t)}[("c1", 1)]
    assert row[2] == "user" and row[3] == "a1x" and row[4] == "hammer"
    assert row[6] == 10


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_patch_void_on_missing_and_deleted(spark, tmp_path, mode):
    """Patches never create or resurrect rows."""
    events = BASE + [
        _ev(4, "DELETE", "c1", 2, 4),
        _ev(10, "PATCH", "c1", 2, 9, tool="ghost"),   # deleted key
        _ev(11, "PATCH", "cX", 7, 9, tool="ghost2"),  # never-created key
    ]
    t = _table(tmp_path, mode)
    _apply_epochs(spark, t, events, cuts=[4])
    st = _state(spark, t)
    assert st == _oracle_state(events)
    assert not any(r[0] == "cX" for r in st)
    assert not any(r[0] == "c1" and r[1] == 2 for r in st)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_patch_composes_in_batch_and_across_epochs(spark, tmp_path, mode):
    """Several patches on one key: each column takes its latest non-null
    setter, regardless of how the log is cut into epochs."""
    events = BASE + [
        _ev(10, "PATCH", "c1", 1, 5, tool="p1"),
        _ev(11, "PATCH", "c1", 1, 6, text="a1y"),
        _ev(12, "PATCH", "c1", 1, 7, tool="p3"),
    ]
    expected = _oracle_state(events)
    for cuts in ([], [3], [10], [10, 11], [3, 10, 11]):
        t = _table(tmp_path / f"cuts{len(cuts)}{cuts[-1] if cuts else 0}", mode)
        _apply_epochs(spark, t, events, cuts=cuts)
        assert _state(spark, t) == expected, f"cuts={cuts}"
    row = {(r[0], r[1]): r for r in expected}[("c1", 1)]
    assert row[3] == "a1y" and row[4] == "p3" and row[6] == 12


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_anchor_after_patch_replaces_all_columns(spark, tmp_path, mode):
    """An UPSERT newer than every patch wins every column (full-row
    write); an UPSERT older than a patch loses the patched columns but
    lands the rest (the anchor-lost/patch-wins merge case)."""
    events = BASE + [
        _ev(10, "PATCH", "c1", 1, 5, tool="p1"),
        _ev(11, "UPSERT", "c1", 1, 6, role="system", text="z", tool=None),
    ]
    t = _table(tmp_path / "newer", mode)
    _apply_epochs(spark, t, events, cuts=[10])
    st = _state(spark, t)
    assert st == _oracle_state(events)
    row = {(r[0], r[1]): r for r in st}[("c1", 1)]
    assert (row[2], row[3], row[4]) == ("system", "z", None)

    # BOUNDARY RULE (schemas.OP_PATCH): an anchor LATER in the log with an
    # OLDER ts than an applied patch violates per-key causality. In one
    # batch the composer reproduces the ord-order fold (anchor lands its
    # columns under the patch); once the patch has been COMMITTED in an
    # earlier epoch, the stored row resolves by row-LWW and the stale
    # anchor loses whole-row. Both outcomes are pinned here so a future
    # change to either is a deliberate decision.
    events2 = BASE + [
        _ev(10, "PATCH", "c1", 1, 8, tool="p1"),
        _ev(11, "UPSERT", "c1", 1, 5, role="system", text="z", tool=None),
    ]
    t_one = _table(tmp_path / "older_one", mode)
    _apply_epochs(spark, t_one, events2, cuts=[3])  # patch+anchor together
    st_one = _state(spark, t_one)
    assert st_one == _oracle_state(events2)
    assert {(r[0], r[1]): r for r in st_one}[("c1", 1)][2:5] == (
        "system", "z", "p1",
    )
    t_split = _table(tmp_path / "older_split", mode)
    _apply_epochs(spark, t_split, events2, cuts=[10])  # patch commits first
    row2 = {(r[0], r[1]): r for r in _state(spark, t_split)}[("c1", 1)]
    assert (row2[2], row2[3], row2[4]) == ("user", "a1", "p1")


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_patch_same_epoch_as_anchor(spark, tmp_path, mode):
    """Insert and its patches in ONE batch compose correctly, including a
    patch older than the batch's own winning anchor (discarded)."""
    events = [
        _ev(1, "INSERT", "c9", 1, 1, role="user", text="v1"),
        _ev(2, "PATCH", "c9", 1, 2, tool="early"),
        _ev(3, "UPSERT", "c9", 1, 3, role="user", text="v2", tool=None),
        _ev(4, "PATCH", "c9", 1, 4, tool="late"),
    ]
    t = _table(tmp_path, mode)
    _apply_epochs(spark, t, events, cuts=[])
    st = _state(spark, t)
    assert st == _oracle_state(events)
    row = st[0]
    assert (row[3], row[4], row[6]) == ("v2", "late", 4)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_anchor_voids_batch_patches(spark, tmp_path, mode):
    """A DELETE that wins the batch voids the batch's patches for that
    key even when a patch's ord is higher (ord-order fold: the patch hits
    an absent row)."""
    events = BASE + [
        _ev(10, "DELETE", "c2", 1, 5),
        _ev(11, "PATCH", "c2", 1, 6, tool="zombie"),
    ]
    for cuts in ([], [10]):
        t = _table(tmp_path / f"c{len(cuts)}", mode)
        _apply_epochs(spark, t, events, cuts=cuts)
        st = _state(spark, t)
        assert st == _oracle_state(events), f"cuts={cuts}"
        assert not any(r[0] == "c2" for r in st)


def test_patch_below_drop_watermark_dies(spark, tmp_path):
    """A patch cannot carry a row past a DROP_PARTITION watermark by
    advancing its ts: events below the watermark die BEFORE composition."""
    events = [
        _ev(1, "INSERT", "c1", 1, 1, role="user", text="a", part=3),
        _ev(2, "PATCH", "c1", 1, 2, tool="p", part=3),
        (3, datetime(2024, 1, 1, 0, 0, 5), 3, "DROP_PARTITION", None, None,
         None, None, None, '{"part":3}', None),
        _ev(4, "INSERT", "c8", 1, 8, role="user", text="late", part=3),
    ]
    t = _table(tmp_path)
    _apply_epochs(spark, t, events, cuts=[])
    st = _state(spark, t)
    assert st == _oracle_state(events)
    assert [r[0] for r in st] == ["c8"]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_patch_moves_row_across_partitions(spark, tmp_path, mode):
    """A patch carrying a different part MOVES the row: its bookkeeping
    (ts, part, lsn) advances to the newest applied piece, so a later
    DROP_PARTITION on the OLD part spares it and one on the NEW part
    kills it — engine and sequential oracle agree. (Regression: the
    oracle used to keep the anchor's part, a latent divergence masked by
    fixtures that derive part from conv_id.)"""
    base = [
        _ev(1, "INSERT", "mover", 1, 1, role="user", text="a", part=3),
        _ev(2, "INSERT", "stay3", 1, 1, role="user", text="b", part=3),
        _ev(3, "PATCH", "mover", 1, 2, tool="p", part=5),
    ]
    drop_old = (4, datetime(2024, 1, 1, 0, 0, 9), 3, "DROP_PARTITION",
                None, None, None, None, None, '{"part":3}', None)
    drop_new = (4, datetime(2024, 1, 1, 0, 0, 9), 5, "DROP_PARTITION",
                None, None, None, None, None, '{"part":5}', None)
    for tag, drop, survivors in (("old", drop_old, ["mover"]),
                                 ("new", drop_new, ["stay3"])):
        events = base + [drop]
        t = SnapshotTable(str(tmp_path / f"t_{mode}_{tag}"))
        t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, write_mode=mode)
        _apply_epochs(spark, t, events, cuts=[3])
        st = _state(spark, t)
        assert st == _oracle_state(events), tag
        assert [r[0] for r in st] == survivors, tag


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_patch_promoted_column_via_bag(spark, tmp_path, mode):
    """A patch can set an ADD_COLUMN-promoted field through the dynamic
    bag — bag promotion decodes it into the typed column exactly as for
    upserts."""
    events = [
        _ev(1, "INSERT", "c1", 1, 1, role="user", text="a"),
        (2, datetime(2024, 1, 1, 0, 0, 2), 0, "ADD_COLUMN", None, None,
         None, None, None, '{"column":"tool_args","type":"string"}', None),
        _ev(3, "PATCH", "c1", 1, 3, extra={"tool_args": "xyz"}),
    ]
    t = _table(tmp_path, mode)
    _apply_epochs(spark, t, events, cuts=[2])
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in t.read(spark).collect()
    }
    row = out[("c1", 1)]
    assert row["tool_args"] == "xyz"
    assert row["text"] == "a" and row["lsn"] == 3


def test_patch_epoch_is_idempotent(spark, tmp_path):
    """Replaying a committed patch epoch is a no-op (exactly-once gate)."""
    events = BASE + [_ev(10, "PATCH", "c1", 1, 9, tool="h")]
    t = _table(tmp_path)
    df = _mk(spark, events)
    apply_batch(spark, t, df.filter(F.col("lsn") <= 3), epoch=0)
    apply_batch(spark, t, df.filter(F.col("lsn") > 3), epoch=1)
    before = _state(spark, t)
    res = apply_batch(spark, t, df.filter(F.col("lsn") > 3), epoch=1)
    assert res.get("skipped") is True
    assert _state(spark, t) == before


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_generated_patch_stream_matches_oracle(spark, tmp_path, mode):
    """Differential: a generated changelog with patch_pct=20 and
    ties_group=1 (per-key ord order == log order — the regime
    schemas.OP_PATCH guarantees) drained in 4 epochs matches the
    sequential fold, in both write modes."""
    log = generate_changelog(
        spark, 4000, seed=7, ties_group=1, patch_pct=20,
        drops=True, evolve=True,
    )
    events = [tuple(r) for r in log.collect()]
    assert any(e[3] == "PATCH" for e in events), "generator emitted no patches"
    t = _table(tmp_path, mode, n_buckets=8)
    for i in range(4):
        apply_batch(
            spark, t,
            log.filter((F.col("lsn") >= i * 1000) & (F.col("lsn") < (i + 1) * 1000)),
            epoch=i,
        )
    rows, cols = replay(_rows(events))
    got = sorted(
        tuple(r[c] for c in cols) for r in t.read(spark).collect()
    )
    want = sorted(tuple(r.get(c) for c in cols) for r in rows)
    assert got == want


def test_mor_patch_epoch_appends_only_changed_rows(spark, tmp_path):
    """The MOR patch epoch is read-modify-write but the WRITE stays
    O(changed rows): untouched keys of the touched bucket do not
    re-append (an unchanged row re-appended at the same ord would tie the
    resolution winner)."""
    t = _table(tmp_path, "mor", n_buckets=1)  # all keys share one bucket
    events = [
        _ev(i, "INSERT", f"c{i}", 1, i, role="user", text=f"v{i}")
        for i in range(1, 51)
    ]
    apply_batch(spark, t, _mk(spark, events), epoch=0)
    patch = [_ev(100, "PATCH", "c7", 1, 55, tool="only-me")]
    apply_batch(spark, t, _mk(spark, patch), epoch=1)
    m = t.current()
    e1_files = [f for fs in m.files.values() for f in fs if "/e1/" in f or f.startswith("data/e1")]
    assert e1_files, "patch epoch appended no delta"
    import os
    delta = spark.read.parquet(*[os.path.join(t.root, f) for f in e1_files])
    assert delta.count() == 1
    assert delta.collect()[0]["tool"] == "only-me"
    # and the resolved read reflects exactly one patched row
    st = {(r[0], r[1]): r for r in _state(spark, t)}
    assert st[("c7", 1)][4] == "only-me"
    assert st[("c8", 1)][4] is None
