"""Stream-shaped processing with incremental actor state.

Ray Data is a batch engine; for workloads whose semantics need *incremental
per-key state over an ordered stream* (running counters, sliding windows
that must emit per event), the guide's last-resort pattern applies: raw Ray
actors, one per key-hash bucket, fed batches in timestamp order.  This is
the ONE place the engine drops below the Dataset API — everything
expressible as groupby+map_groups (tumbling windows, sessions) lives in
``ops/sessionize.py`` instead.

Ordering assumption: the driver feeds batches in global ts order (obtained
via ``ds.sort(ts)``); each actor sees its bucket's events in order.  At
cluster scale the sort is the usual range-partitioned shuffle and buckets
process in parallel; state is bounded by (window span × event rate) per key.
"""

from __future__ import annotations

from collections import deque

import pandas as pd

import ray
import ray.data


@ray.remote
class WindowBucketActor:
    """Holds sliding-window state for every key hashed to this bucket.

    Emits, per event, the count and value-sum of the key's events within the
    trailing window (including the event itself) — a per-event sliding
    window aggregate, which groupby/map_groups cannot produce incrementally.
    """

    def __init__(self, window_seconds: int) -> None:
        self.window = pd.Timedelta(seconds=window_seconds)
        self.state: dict = {}

    def process(self, batch: pd.DataFrame, key: str, ts: str,
                value: str) -> pd.DataFrame:
        outs = []
        for _, row in batch.iterrows():
            dq = self.state.setdefault(row[key], deque())
            t = row[ts]
            dq.append((t, row[value]))
            while dq and dq[0][0] < t - self.window:
                dq.popleft()
            outs.append((row[key], t, len(dq), sum(v for _, v in dq)))
        return pd.DataFrame(outs, columns=[key, ts, "w_count", "w_sum"])

    def n_keys(self) -> int:
        return len(self.state)


def sliding_window_counts(ds: "ray.data.Dataset", key: str = "user_id",
                          ts: str = "ts", value: str = "value",
                          window_seconds: int = 3600,
                          num_buckets: int = 4,
                          batch_rows: int = 4096) -> pd.DataFrame:
    """Per-event trailing-window (count, sum) per key.

    Driver streams ts-sorted batches; each batch is split by key-hash and
    dispatched to the bucket actors concurrently (in-flight across actors,
    ordered within an actor by submission order — Ray actor tasks execute
    FIFO per actor, which preserves the per-bucket stream order).
    """
    actors = [WindowBucketActor.remote(window_seconds) for _ in range(num_buckets)]
    pending = []
    for batch in ds.sort(ts).iter_batches(batch_size=batch_rows,
                                          batch_format="pandas"):
        h = pd.util.hash_pandas_object(batch[key], index=False)
        bucket = (h % num_buckets).astype(int)
        for bi in range(num_buckets):
            sub = batch[bucket.to_numpy() == bi]
            if len(sub):
                pending.append(actors[bi].process.remote(sub, key, ts, value))
    parts = ray.get(pending)
    for a in actors:
        ray.kill(a)
    if not parts:
        return pd.DataFrame(columns=[key, ts, "w_count", "w_sum"])
    return pd.concat(parts, ignore_index=True)
