"""Single-writer enforcement at the manifest layer: a second writer racing
the commit protocol must fail LOUDLY (CommitConflictError) and leave the
table consistent — the analogue of an Iceberg CAS failure. Reference
single-ownership: one task owns a collection's write path, dup-task
validation at /root/reference/server/cdc_impl.go:371-497.
"""

import json
import os
import subprocess
import sys
import time

import pytest

from milvus_cdc_spark.plans.manifest import CommitConflictError, SnapshotTable
from milvus_cdc_spark.schemas import TRANSCRIPTS_BASE_COLUMNS


def _mk(tmp_path, name="t"):
    t = SnapshotTable(str(tmp_path / name))
    t.create(TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    return t


def test_stale_base_commit_loses_loudly(tmp_path):
    t = _mk(tmp_path)
    stale = t.current()  # both writers plan against v0
    t.commit(1, summary_delta={"events_applied": 5}, base=stale)  # writer A wins
    v_after_a = t.current().version
    with pytest.raises(CommitConflictError, match="second writer"):
        t.commit(2, summary_delta={"events_applied": 7}, base=stale)  # B loses
    # table is exactly writer A's state: B's commit left no trace
    m = t.current()
    assert m.version == v_after_a
    assert set(m.epochs) == {"1"}
    assert m.summary["events_applied"] == 5


def test_stale_base_replay_of_committed_epoch_is_noop(tmp_path):
    """Crash-replay vs conflict: a stale-based commit of an epoch that
    ALREADY landed is an idempotent no-op, not an error."""
    t = _mk(tmp_path)
    stale = t.current()
    t.commit(1, summary_delta={"events_applied": 5}, base=stale)
    t.commit(2, summary_delta={"events_applied": 3})
    v = t.current().version
    got = t.commit(1, summary_delta={"events_applied": 5}, base=stale)
    assert got.version == v  # returned CURRENT, wrote nothing
    assert t.current().version == v


def test_held_lease_blocks_then_conflicts(tmp_path):
    t = _mk(tmp_path)
    lease = os.path.join(t.meta_dir, "LEASE")
    with open(lease, "w") as f:
        f.write(json.dumps({"owner": "other-writer", "ts": time.time()}))
    with pytest.raises(CommitConflictError, match="other-writer"):
        with t.commit_lease(ttl_sec=30.0, timeout_sec=0.2):
            pass
    os.unlink(lease)


def test_stale_lease_taken_over(tmp_path):
    """A lease whose holder died (ts older than TTL) is taken over instead
    of blocking forever."""
    t = _mk(tmp_path)
    lease = os.path.join(t.meta_dir, "LEASE")
    with open(lease, "w") as f:
        f.write(json.dumps({"owner": "dead-writer", "ts": time.time() - 999}))
    t.commit(1, summary_delta={"events_applied": 1})  # acquires via takeover
    assert "1" in t.current().epochs
    assert not os.path.exists(lease)  # released


def test_compact_conflicts_when_writer_lands_mid_rewrite(tmp_path, spark):
    t = _mk(tmp_path)
    t.commit(1, summary_delta={"events_applied": 1})
    m = t.current()
    # simulate a commit landing between compact's plan and its swing
    real_lease = t.commit_lease
    fired = []

    def racing_lease(*a, **k):
        if not fired:  # only ambush compact's acquisition, not the racer's
            fired.append(1)
            t.commit(2, summary_delta={"events_applied": 1})
        return real_lease(*a, **k)

    t.commit_lease = racing_lease
    with pytest.raises(CommitConflictError, match="compact"):
        t.compact(spark)
    t.commit_lease = real_lease
    assert set(t.current().epochs) == {"1", "2"}  # both commits intact


def test_two_processes_one_loses(tmp_path):
    """Cross-process race: both processes plan against the same manifest
    version; exactly one commit lands, the other exits loudly."""
    t = _mk(tmp_path)
    code = f"""
import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from milvus_cdc_spark.plans.manifest import CommitConflictError, SnapshotTable
t = SnapshotTable({t.root!r})
stale = t.at_version(0)
import time; time.sleep(float(sys.argv[1]))
try:
    t.commit(int(sys.argv[2]), summary_delta={{"events_applied": 1}}, base=stale)
    print("WIN")
except CommitConflictError:
    print("CONFLICT")
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, delay, epoch],
            stdout=subprocess.PIPE, text=True,
        )
        for delay, epoch in (("0.0", "1"), ("0.3", "2"))
    ]
    outs = [p.communicate()[0].strip() for p in procs]
    assert sorted(outs) == ["CONFLICT", "WIN"], outs
    assert len(t.current().epochs) == 1  # exactly one landed
