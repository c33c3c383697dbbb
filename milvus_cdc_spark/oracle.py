"""Single-threaded reference reducer — the independent replay oracle.

The analogue of the reference's dual-cluster convergence oracle ("golden =
upstream state", /root/reference/tests/testcases/test_cdc_e2e.py:78-96)
and its msg-count replay tool (server/tool/msg_count/main.go:318-356):
a trivially-correct sequential fold over the changelog that the engine's
distributed MERGE result must match exactly.

Fold order is the engine's declared total order: ``(ts, rank, lsn)`` with
rank DELETE(0) < DROP_PARTITION(1) < INSERT/UPSERT(2) — delete applies
before insert at equal ts (reference intra-pack sort,
core/reader/replicate_channel_manager.go:1170-1173), and a partition drop
defeats earlier-ts DML but loses to later-or-equal-ts inserts.

Test-scale only: materializes the log on the driver.
"""

from __future__ import annotations

from typing import Any

from milvus_cdc_spark import schemas as S

_RANKS = {
    S.OP_DELETE: 0,
    S.OP_DROP_PARTITION: 1,
    S.OP_TRUNCATE: 1,
    S.OP_INSERT: 2,
    S.OP_UPSERT: 2,
    # partial update ranks with the full-row writes: at equal ts a PATCH
    # later in the log (higher lsn) overrides, an earlier one is overridden
    S.OP_PATCH: 2,
    S.OP_ADD_COLUMN: 3,
    S.OP_RENAME_COLUMN: 3,
    # metadata-only type promotion: values are plain Python ints either
    # way, so the sequential fold just skips it
    S.OP_WIDEN_COLUMN: 3,
    S.OP_DROP_COLUMN: 3,
}


def replay(events: list[dict[str, Any]]) -> tuple[list[dict[str, Any]], list[str]]:
    """Fold the changelog; return (final rows, logical column names)."""
    import json

    state: dict[tuple[str, int], dict[str, Any]] = {}
    added_cols: list[str] = []
    renames: dict[str, str] = {}
    # DROP_COLUMN name retirement (schemas.OP_DROP_COLUMN): retired names
    # — logical at drop time AND the underlying base name — never come
    # back; an ADD on a retired name is a no-op. Matches the engine's
    # monotone retired set (manifest.dropped).
    retired: set[str] = set()
    base_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "part", "lsn"]

    for e in sorted(events, key=lambda e: (e["ts"], _RANKS[e["op"]], e["lsn"])):
        op = e["op"]
        if op == S.OP_ADD_COLUMN:
            col = json.loads(e["ddl_arg"])["column"]
            if col not in added_cols and col not in retired:
                added_cols.append(col)
        elif op == S.OP_DROP_COLUMN:
            col = json.loads(e["ddl_arg"])["column"]
            retired.add(col)
            # resolve the current logical name back to its base column so
            # a renamed-then-dropped column retires its physical slot too
            phys = next((k for k in base_cols if renames.get(k, k) == col), None)
            if phys is not None:
                retired.add(phys)
            if col in added_cols:
                added_cols.remove(col)
        elif op == S.OP_RENAME_COLUMN:
            arg = json.loads(e["ddl_arg"])
            renames[arg["from"]] = arg["to"]
        elif op == S.OP_DROP_PARTITION:
            part = json.loads(e["ddl_arg"]).get("part", e["part"])
            state = {k: v for k, v in state.items() if v["part"] != part}
        elif op == S.OP_TRUNCATE:
            # table-level drop: every entry folded so far has a strictly
            # smaller (ts, rank, lsn), so clearing state matches the
            # engine's strict-< truncate watermark exactly
            state = {}
        elif op == S.OP_WIDEN_COLUMN:
            pass  # type promotion — no value change in the Python fold
        elif op == S.OP_DELETE:
            state.pop((e["conv_id"], e["turn_idx"]), None)
        elif op == S.OP_PATCH:
            # partial update: non-null payload columns overwrite, nulls
            # leave the stored value; a patch on an absent row is VOID
            # (patches never create rows). Because the fold runs in
            # (ts, rank, lsn) order, "absent here" is exactly the
            # declarative rule: no live anchor with a smaller ord.
            # scope: typed payload columns — base ones ride the event's
            # own columns, evolved ones its dynamic bag (the engine's
            # bag-promotion decodes extra[c] into the typed column for
            # patches exactly as for upserts). Engine parity requires the
            # bag key be PROMOTED (ADD_COLUMN applied) by the patch's
            # epoch; patching a never-promoted key is undefined.
            row = state.get((e["conv_id"], e["turn_idx"]))
            if row is not None:
                for c in ("role", "text", "tool"):
                    if e[c] is not None:
                        row[c] = e[c]
                for k, v in (e.get("extra") or {}).items():
                    if v is not None:
                        row["_extra"] = {**row["_extra"], k: v}
                # bookkeeping advances to the newest applied piece —
                # including part: a patch carrying a different partition
                # MOVES the row (engine: compose_patch_actions /
                # merge_patched_actions advance ('ts','part','lsn')
                # together), so a later DROP_PARTITION on the old part
                # must not kill it
                row["ts"] = e["ts"]
                row["lsn"] = e["lsn"]
                row["part"] = e["part"]
        else:  # INSERT / UPSERT — full-row replace
            state[(e["conv_id"], e["turn_idx"])] = {
                "conv_id": e["conv_id"],
                "turn_idx": e["turn_idx"],
                "role": e["role"],
                "text": e["text"],
                "tool": e["tool"],
                "ts": e["ts"],
                "part": e["part"],
                "lsn": e["lsn"],
                "_extra": e.get("extra") or {},
            }

    # dropped columns leave the output entirely — retirement is forever,
    # so values stored mid-fold can never resurface (no re-add exists)
    live_base = [c for c in base_cols if c not in retired
                 and renames.get(c, c) not in retired]
    logical_cols = [renames.get(c, c) for c in live_base] + added_cols

    rows = []
    for v in sorted(state.values(), key=lambda r: (r["conv_id"], r["turn_idx"])):
        row = {renames.get(k, k): v[k] for k in live_base}
        for c in added_cols:
            row[c] = v["_extra"].get(c)
        rows.append(row)
    return rows, logical_cols
