"""Temporal operators over an event stream table: gap sessionization and
as-of joins.

Ray Data has no event-time windowing; the guide's pattern applies — treat
the table as a partitioned log: hash-partition by entity key
(``groupby(key)``), sort within the partition by timestamp, and run the
window logic per group with pandas (``map_groups``).  The ordering
assumption: per-key event order is established inside each group, no global
order is required (SURVEY.md §2.9 — the reference's hour-bucket files are
pre-materialized tumbling windows; these operators generalize that).
"""

from __future__ import annotations

import pandas as pd

import ray.data


def sessionize(ds: "ray.data.Dataset", key: str = "user_id", ts: str = "ts",
               gap_minutes: int = 30) -> "ray.data.Dataset":
    """Gap-based sessions: a new session starts when the time since the
    previous event of the same key exceeds ``gap_minutes``.

    Output: one row per (key, session_id) with n_events, session start/end.
    ``session_id`` is 0-based per key in time order — deterministic given
    the input, independent of partitioning.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts)
        new_sess = (g[ts].diff() > gap).cumsum()
        out = g.groupby(new_sess).agg(
            n_events=(ts, "size"), session_start=(ts, "min"),
            session_end=(ts, "max"))
        out.index.name = None
        out = out.reset_index(drop=True)
        out.insert(0, "session_id", range(len(out)))
        out.insert(0, key, g[key].iloc[0])
        return out

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def session_counts(ds: "ray.data.Dataset", key: str = "user_id", ts: str = "ts",
                   gap_minutes: int = 30) -> "ray.data.Dataset":
    """Per-key session count (the compact, oracle-friendly view)."""
    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts)
        gap = pd.Timedelta(minutes=gap_minutes)
        n = int((g[ts].diff() > gap).sum()) + 1
        return pd.DataFrame({key: [g[key].iloc[0]], "n_sessions": [n],
                             "n_events": [len(g)]})

    out = ds.groupby(key).map_groups(per_key, batch_format="pandas")
    return out


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key: str, ts: str, right_cols: list[str],
              suffix: str = "_r") -> "ray.data.Dataset":
    """As-of join: for each left row, the latest right row of the same key
    with right.ts <= left.ts (``pd.merge_asof`` per key bucket).

    Implementation: co-partition both sides by key via a tagged union +
    single ``groupby(key)`` (one shuffle), then merge_asof inside each
    group.  At scale, salt wide keys and pre-bucket by time range.
    """
    lcols = left.schema().names

    def tag(side: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["_side"] = side
            return batch

        return f

    both = left.map_batches(tag("L"), batch_format="pandas", batch_size=None) \
        .union(right.map_batches(tag("R"), batch_format="pandas", batch_size=None))

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["_side"] == "L"].drop(columns=["_side"]).dropna(axis=1, how="all")
        rg = group[group["_side"] == "R"].drop(columns=["_side"]).dropna(axis=1, how="all")
        lg = lg.sort_values(ts)
        if lg.empty:
            return pd.DataFrame(columns=list(lcols) + right_cols)
        if rg.empty:
            out = lg[[c for c in lcols if c in lg.columns]].copy()
            for c in right_cols:
                out[c] = pd.NA
            return out
        rg = rg.sort_values(ts)[[ts] + [c for c in right_cols if c in rg.columns]]
        # right cols keep their names; ``suffix`` applies only on collision
        return pd.merge_asof(lg, rg, on=ts, suffixes=("", suffix),
                             direction="backward")

    return both.groupby(key).map_groups(per_key, batch_format="pandas")
