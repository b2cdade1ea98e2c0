"""Upsert/delete fold (operator E9) — the batch analog of the reference's
changefeed sync.

The reference applies changefeed events one at a time with at-least-once
delivery made idempotent by ``doc_as_upsert`` keyed on document id
(/root/reference/src/search-ingest/elastic.cr:420, 431-449) and deletes via
tombstones (elastic.cr:452-464).  Ray-native restatement: delta rows carry
``(action ∈ {created, updated, deleted}, epoch)``; folding is last-write-wins
per id on ``(epoch, seq)`` with delete tombstones dropping the document —
``groupby(id).map_groups(latest)``.  Replaying an epoch is a no-op
(idempotency invariant 5 in FIXTURES.md).
"""

from __future__ import annotations

import pandas as pd

ACTIONS = ("created", "updated", "deleted")


def fold_last_write_wins(ds, id_col: str, order_cols: list[str],
                         action_col: str | None = None,
                         drop_order_cols: bool = False):
    """Fold a delta Dataset to one surviving row per ``id_col``.

    ``order_cols``: total order within an id (e.g. ["epoch"] or ["ts",
    "event_id"]); the row with the greatest order wins.  If ``action_col``
    is given, a winning row whose action is ``deleted`` removes the document
    entirely (tombstone, analog of S5).
    """
    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        win = g.tail(1)
        if action_col is not None and win[action_col].iloc[0] == "deleted":
            return win.head(0)
        return win

    out = ds.groupby(id_col).map_groups(latest, batch_format="pandas")
    if drop_order_cols:
        keep = [c for c in ds.schema().names if c not in order_cols]
        out = out.select_columns(keep)
    return out


def apply_epoch(base_ds, delta_ds, id_col: str, epoch_col: str = "epoch",
                action_col: str = "action"):
    """Apply one epoch of deltas onto a base snapshot: union then fold.

    Base rows are treated as epoch -1 ``created`` rows; the fold keeps the
    latest state per id and drops tombstoned docs.  Equivalent reference
    behavior: process_resource created/updated/deleted dispatch
    (/root/reference/src/search-ingest/table.cr:25-46).
    """
    import pyarrow as pa

    def tag_base(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if epoch_col not in batch.column_names:
            batch = batch.append_column(epoch_col, pa.array([-1] * n, pa.int64()))
        if action_col not in batch.column_names:
            batch = batch.append_column(action_col, pa.array(["created"] * n, pa.string()))
        return batch

    base = base_ds.map_batches(tag_base, batch_format="pyarrow")
    merged = base.union(delta_ds)
    return fold_last_write_wins(merged, id_col, [epoch_col], action_col)
