"""Generic relational building blocks on Ray Data, scale-first.

These are the engine's reusable operators beyond the Zeek pipeline itself:
broadcast hash joins for small dimension tables (the shape of the reference's
only join, the ip2location lookup — SURVEY.md §2.4 J1), partitioned hash
joins for fact⨝fact, grouped integer-exact aggregation, and top-k.

Float policy for oracle-checked results: money/value columns are converted to
integer cents (``round(x * 100) → int64``) BEFORE summing, so aggregates are
exact integers and immune to floating-point summation-order differences
between Ray and the DuckDB oracle.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def read_table(sf_dir: str, name: str,
               columns: list[str] | None = None) -> "ray.data.Dataset":
    """Column-pruned Parquet read of one testdata table."""
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def small_table(sf_dir: str, name: str,
                columns: list[str] | None = None) -> pd.DataFrame:
    """Driver-side load of a SMALL dimension table (region/nation/…).

    At cluster scale the result is ``ray.put`` once and read inside tasks;
    never use for fact tables.
    """
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{name}.parquet", columns=columns).to_pandas()


def broadcast_merge(ds: "ray.data.Dataset", small: pd.DataFrame, on: str | list[str],
                    how: str = "inner") -> "ray.data.Dataset":
    """Broadcast hash join: ``ray.put`` the small side once, pandas-merge
    inside each ``map_batches`` task — no shuffle of the big side.

    The Ray analog of the reference's dict-lookup enrichment join
    (zeek_log.rs:436-447) generalized to any small dimension table.
    """
    ref = ray.put(small)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(ref)  # zero-copy from local object store after 1st fetch
        return batch.merge(sm, on=on, how=how)

    return ds.map_batches(merge, batch_format="pandas", batch_size=None)


def default_join_partitions(requested: int | None = None) -> int:
    """Join/shuffle partition count bounded by cluster CPUs: the hash
    aggregators are actors, and more partitions than CPUs can DEADLOCK a
    small cluster (measured: num_partitions=16 on 4 CPUs hangs)."""
    from zeeklog_ray.cluster import cluster_cpus

    cap = max(2, cluster_cpus())
    return min(requested, cap) if requested else cap


def with_hash_bucket(ds: "ray.data.Dataset", key: str | Sequence[str],
                     num_buckets: int = 1024,
                     col: str = "_bucket") -> "ray.data.Dataset":
    """Append a deterministic hash-bucket column for ``key`` (a column name
    or a list of column names hashed together row-wise).

    The bucketed-groupby pattern: Ray's grouped execution pays Python per
    GROUP, so any per-entity groupby scales its overhead with entity
    cardinality (measured: 1M distinct digests 189 s vs 17 s bucketed;
    1M rows / 100k users in trailing_windows 12.8 s vs 1.3 s).  Grouping
    by the bucket instead still co-locates every row of a key (same key ⇒
    same bucket) while the per-group cost is paid per bucket; inside the
    bucket the per-key logic runs as C-level pandas/numpy over sorted
    key segments.

    SIZE ``num_buckets`` TO THE DATA: one bucket materializes as a single
    in-memory pandas group of ~rows/num_buckets rows, so pick
    ``num_buckets ≈ total_rows / 2M`` (≈100 MB/bucket) — the defaults
    suit the 10^6–10^9-row range; at 10^12 rows pass ~500k buckets.  The
    only correctness constraint is determinism of the hash; any bucket
    count preserves key co-location."""
    sel = key if isinstance(key, str) else list(key)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch[sel], index=False).to_numpy()
        batch[col] = (h % np.uint64(num_buckets)).astype("int64")
        return batch

    return ds.map_batches(bucketize, batch_format="pandas", batch_size=None)


def bucketed_distinct(ds: "ray.data.Dataset", keys: Sequence[str],
                      num_buckets: int = 1024) -> "ray.data.Dataset":
    """DISTINCT on ``keys`` via the bucketed-groupby pattern.

    ``Dataset.groupby(keys).aggregate(...)`` pays Python per distinct key
    tuple (~0.19 ms/group measured — ops/text.py:166-168), so distinct over
    10M candidate pairs would spend ~30 min in per-group overhead; here the
    per-group cost is paid per BUCKET and the per-bucket dedup is one
    C-level ``drop_duplicates``.  Same key tuple ⇒ same bucket, so the
    result is exact."""
    keys = list(keys)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(subset=keys)[keys]

    return with_hash_bucket(ds, keys, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def bucketed_group_min(ds: "ray.data.Dataset", key: str, val: str,
                       num_buckets: int = 1024) -> "ray.data.Dataset":
    """Per-key MIN of ``val`` via the bucketed-groupby pattern — the drop-in
    for ``groupby(key).aggregate(Min(val))`` when key cardinality is large
    (the connected-components label merge runs this once PER ROUND, so the
    per-group Python cliff would multiply by the component diameter)."""

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return (group.groupby(key, sort=False, dropna=False)[val]
                .min().reset_index())

    return with_hash_bucket(ds, key, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def sized_join_partitions(n_rows: int,
                          rows_per_partition: int = 25_000) -> int:
    """Partition count proportional to the DATA, bounded by the CPU cap:
    every hash-shuffle partition costs a fixed aggregator-actor spin-up
    (measured ~0.1 s each), so a small join at 32 partitions pays ~4 s of
    pure overhead, while a big join WANTS the full width (measured on an
    800k-row self-join: 13 s at 4 partitions vs 8.6 s at 32).  25k rows
    per partition is the measured crossover.  Use when the input size is
    known (e.g. after a ``materialize``); at cluster scale the CPU cap
    dominates and this degenerates to :func:`default_join_partitions`."""
    import math

    return default_join_partitions(max(2, math.ceil(n_rows / rows_per_partition)))


def hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              on: str, right_on: str | None = None,
              num_partitions: int | None = None,
              how: str = "inner") -> "ray.data.Dataset":
    """Partitioned hash join for two large sides (``Dataset.join``);
    ``how`` ∈ inner / left_outer / right_outer / full_outer.

    Both sides shuffle on the key; at multi-node scale pass ``num_partitions``
    ≈ 2–4 × total CPUs — locally it is capped at the CPU count (see
    :func:`default_join_partitions`).
    """
    return left.join(right, join_type=how,
                     num_partitions=default_join_partitions(num_partitions),
                     on=(on,), right_on=(right_on or on,))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (uint64 wraparound) — an INDEPENDENT second
    hash derived from the first.  Needed because ``hash_pandas_object``
    ignores ``hash_key`` for numeric dtypes, so two "differently-keyed"
    pandas hashes of an int column are IDENTICAL and the
    Kirsch-Mitzenmacher probes h1+i·h2 degenerate to correlated positions
    (measured: 8% bloom false positives where ~0.6% is theoretical)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bloom_hashes(keys: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    h1 = pd.util.hash_pandas_object(keys, index=False).to_numpy(np.uint64)
    return h1, _mix64(h1)


def build_bloom(keys: pd.Series | np.ndarray, n_bits: int = 1 << 20,
                k_hashes: int = 5) -> np.ndarray:
    """Packed bloom-filter bitset (``n_bits/8`` bytes) over ``keys``.

    Two independent 64-bit hashes combined Kirsch-Mitzenmacher style
    (``h1 + i·h2``) give the ``k_hashes`` probe positions.  Deterministic
    across processes (fixed pandas hash keys), and MERGEABLE: bitwise-OR of
    two filters is the filter of the union — so at scale each task blooms
    its own fragment and a tiny OR-reduce merges them.

    Size rule: false-positive rate ≈ (1 - e^(-k·n/m))^k — 10 bits/key with
    k=5 gives ~1%; 10^9 keys fit in ~1.2 GB where an exact key set would
    need tens of GB."""
    s = keys if isinstance(keys, pd.Series) else pd.Series(keys)
    h1, h2 = _bloom_hashes(s)
    # round UP to a byte multiple: bloom_contains recovers the modulus as
    # len(bits)*8, so a non-multiple n_bits would probe a DIFFERENT modulus
    # than the build (silent false negatives) or index past the last byte
    n_bits = (n_bits + 7) & ~7
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    for i in range(k_hashes):
        idx = ((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64)
        np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
    return bits


def bloom_contains(bits: np.ndarray, keys: pd.Series,
                   k_hashes: int = 5) -> np.ndarray:
    """Vectorized membership mask: True = maybe-present (false positives
    possible), False = DEFINITELY absent."""
    n_bits = len(bits) * 8
    h1, h2 = _bloom_hashes(keys)
    mask = np.ones(len(keys), dtype=bool)
    for i in range(k_hashes):
        idx = ((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64)
        mask &= (bits[idx >> 3] >> (idx & 7) & 1).astype(bool)
    return mask


def bloom_semi_filter(ds: "ray.data.Dataset", keys: pd.Series | np.ndarray,
                      on: str, n_bits: int = 1 << 20,
                      k_hashes: int = 5) -> "ray.data.Dataset":
    """Bloom-filter SEMI-JOIN PRE-FILTER: drop every row whose ``on`` key is
    definitely not in ``keys`` — a SUPERSET of the exact semi-join (false
    positives pass), so follow with an exact join/isin when exactness
    matters.  The point at scale: the broadcast is ``n_bits/8`` bytes (10
    bits per key) instead of the full key set, and the pruned fact side
    shrinks BEFORE any shuffle join — the classic bloom-pruned join."""
    bits_ref = ray.put(build_bloom(keys, n_bits, k_hashes))

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        bits = ray.get(bits_ref)
        return batch[bloom_contains(bits, batch[on], k_hashes)]

    return ds.map_batches(keep, batch_format="pandas", batch_size=None)


def arrow_round_away(x) -> "pa.Array":
    """Half-away-from-zero round → int64 — DuckDB's ROUND semantics.

    Arrow's (and numpy's) default is half-to-even, which diverges from the
    oracle on exact .5 products; every Arrow-side cents/qty conversion must
    go through this helper (pandas-side twin: queries._round_half_away)."""
    import pyarrow.compute as pc

    return pc.cast(pc.round(x, round_mode="half_towards_infinity"),
                   pa.int64())


def to_cents(batch: pa.Table, cols: dict[str, str]) -> pa.Table:
    """Append integer-cent columns: for each src→dst, dst = round(src*100)
    half away from zero (oracle ROUND parity)."""
    import pyarrow.compute as pc

    for src, dst in cols.items():
        batch = batch.append_column(
            dst, arrow_round_away(pc.multiply(batch[src], pa.scalar(100.0))))
    return batch


def grouped_sum(ds: "ray.data.Dataset", keys: Sequence[str],
                sums: dict[str, str] | None = None,
                count_as: str | None = None,
                empty_schema: "pa.Schema | None" = None) -> "ray.data.Dataset":
    """Grouped sum/count as a vectorized TREE-COMBINE: per-batch pandas
    partials → coalesce → per-block combine → single-block final combine.

    Why not ``Dataset.groupby().aggregate`` for the merge: Ray's sort-based
    grouped aggregation costs ~2.7 ms of Python per GROUP (measured: 15k
    distinct keys over 60k partial rows took 40 s); the pandas combine is
    C-level per block.  Assumes the final aggregated result (one row per
    distinct key tuple) fits one block — true for report-shaped aggregates;
    for very high-cardinality keys use ``Dataset.groupby`` directly and
    accept the per-group cost, or shard by key-hash first.

    ``empty_schema``: optional pyarrow schema of the OUTPUT.  When the
    input can be entirely empty (e.g. a filter that may match nothing),
    Ray's executor passes empty blocks through every map stage untouched
    and ``repartition`` strips their column metadata, so the aggregate
    would emit a ZERO-COLUMN block — which a downstream ``Dataset.join``
    cannot take (no schema to broadcast; see raypatch.py).  Passing the
    expected schema unions in a zero-row seed block that pins it.
    """
    keys = list(keys)
    sums = sums or {}

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, observed=True, dropna=False)
        out = pd.DataFrame(index=g.size().index)
        if count_as:
            out[count_as] = g.size()
        for src, dst in sums.items():
            out[dst] = g[src].sum()
        return out.reset_index()

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, observed=True, dropna=False)
        return g.sum().reset_index()

    from zeeklog_ray.aggregate import coalesce_partials

    partial_ds = ds.select_columns(list(dict.fromkeys(keys + list(sums)))).map_batches(
        partial, batch_format="pandas", batch_size=None)
    mid = coalesce_partials(partial_ds).map_batches(
        combine, batch_format="pandas", batch_size=None)
    out = mid.repartition(1).map_batches(combine, batch_format="pandas",
                                         batch_size=None)
    if empty_schema is not None:
        import pyarrow as pa  # noqa: F811
        import ray.data

        seed = ray.data.from_arrow(empty_schema.empty_table())
        out = out.union(seed)
    return out


def grouped_sum_bucketed(ds: "ray.data.Dataset", keys: Sequence[str],
                         sums: dict[str, str] | None = None,
                         count_as: str | None = None,
                         num_buckets: int = 1024) -> "ray.data.Dataset":
    """ENTITY-shaped grouped sum/count: one output row per key tuple at
    arbitrary cardinality.  :func:`grouped_sum` assumes the final result
    fits one block (report-shaped: per-source, per-status, ...); per-user
    / per-document aggregates scale with the entity count, so here the
    per-batch combiner partials shuffle ONCE on the key-hash bucket and
    each bucket finishes with a C-level pandas groupby-sum — the result
    stays distributed (≈rows/num_buckets per output block; size
    ``num_buckets`` per the with_hash_bucket rule)."""
    keys = list(keys)
    sums = sums or {}

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, observed=True, dropna=False)
        out = pd.DataFrame(index=g.size().index)
        if count_as:
            out[count_as] = g.size()
        for src, dst in sums.items():
            out[dst] = g[src].sum()
        return out.reset_index()

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return (group.drop(columns=["_bucket"])
                .groupby(keys, sort=False, observed=True, dropna=False)
                .sum().reset_index())

    partials = ds.select_columns(
        list(dict.fromkeys(keys + list(sums)))).map_batches(
        partial, batch_format="pandas", batch_size=None)
    return with_hash_bucket(partials, keys, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def rollup_sum(ds: "ray.data.Dataset", keys: Sequence[str],
               sums: dict[str, str] | None = None,
               count_as: str | None = None) -> pd.DataFrame:
    """``GROUP BY ROLLUP(keys...)``: the finest level runs ONCE as the
    distributed combiner-first :func:`grouped_sum`; every super-aggregate
    level then re-combines the finest result on the driver — sums and
    counts are algebraic, so re-aggregating the (report-shaped, tiny)
    finest table is exact and costs zero extra corpus scans or shuffles.

    Super-aggregate rows carry NULL in the rolled-up key columns (the SQL
    ROLLUP convention — ambiguous if real null key values exist; this
    corpus has none, and callers with null keys should pre-fill a
    sentinel).  Returns a driver DataFrame (|finest| + |prefix levels|
    rows).
    """
    keys = list(keys)
    vals = ([count_as] if count_as else []) + list((sums or {}).values())
    finest = grouped_sum(ds, keys, sums=sums, count_as=count_as).to_pandas()
    parts = [finest[keys + vals]]
    for lvl in range(len(keys) - 1, -1, -1):
        sub = keys[:lvl]
        if sub:
            g = finest.groupby(sub, sort=False, dropna=False)[vals] \
                .sum().reset_index()
        else:
            g = finest[vals].sum().to_frame().T
        for k in keys[lvl:]:
            g[k] = None
        parts.append(g[keys + vals])
    out = pd.concat(parts, ignore_index=True)
    out[vals] = out[vals].astype("int64")
    return out


def cube_sum(ds: "ray.data.Dataset", keys: Sequence[str],
             sums: dict[str, str] | None = None,
             count_as: str | None = None) -> pd.DataFrame:
    """``GROUP BY CUBE(keys...)``: every subset of the key columns, not
    just the prefixes :func:`rollup_sum` covers.  Same execution shape —
    the finest level runs ONCE distributed, then each of the 2^|keys|-1
    remaining subsets re-combines the (report-shaped, tiny) finest table
    on the driver; sums/counts are algebraic so the re-aggregation is
    exact and costs zero extra corpus scans.  NULL marks a rolled-up key
    column (same caveat as rollup_sum: callers with real null key values
    should pre-fill a sentinel)."""
    from itertools import combinations

    keys = list(keys)
    vals = ([count_as] if count_as else []) + list((sums or {}).values())
    finest = grouped_sum(ds, keys, sums=sums, count_as=count_as).to_pandas()
    parts = [finest[keys + vals]]
    for r in range(len(keys) - 1, -1, -1):
        for sub in combinations(keys, r):
            sub = list(sub)
            if sub:
                g = finest.groupby(sub, sort=False, dropna=False)[vals] \
                    .sum().reset_index()
            else:
                g = finest[vals].sum().to_frame().T
            for k in keys:
                if k not in sub:
                    g[k] = None
            parts.append(g[keys + vals])
    out = pd.concat(parts, ignore_index=True)
    out[vals] = out[vals].astype("int64")
    return out


def latest_per_key(ds: "ray.data.Dataset", keys: Sequence[str],
                   order_cols: Sequence[str],
                   num_buckets: int = 1024) -> "ray.data.Dataset":
    """Log-compaction / SCD "latest wins": keep, per key tuple, the single
    row that is greatest by ``order_cols`` (compared in order, descending
    — ties broken by the next column, so make the last column unique for
    determinism).

    Two-level argmax: a per-batch prune first reduces each block to at
    most one row per key IT contains (row-local, no shuffle), then the
    survivors — bounded by |blocks| × |keys-per-block| — go through one
    bucketed groupby where the final winner is a C-level sort +
    ``drop_duplicates`` per bucket.  Only pruned survivors shuffle."""
    keys = list(keys)
    order_cols = list(order_cols)

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.sort_values(order_cols, ascending=False, kind="mergesort")
        return g.drop_duplicates(keys, keep="first")

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order_cols, ascending=False, kind="mergesort")
        return g.drop_duplicates(keys, keep="first").drop(columns=["_bucket"])

    pruned = ds.map_batches(prune, batch_format="pandas", batch_size=None)
    return with_hash_bucket(pruned, keys, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def seq_index_per_key(ds: "ray.data.Dataset", key: str,
                      order_cols: Sequence[str],
                      out: str = "seq",
                      num_buckets: int = 1024) -> "ray.data.Dataset":
    """Per-key ROW_NUMBER: for every row, its 1-based rank within its key
    partition ordered ascending by ``order_cols`` (make the last column
    unique for a deterministic total order).

    Unlike :func:`latest_per_key` every row survives, so the full table
    shuffles once on the key-hash bucket; inside each bucket the
    numbering is one C-level sort + ``groupby(...).cumcount()``.  Same
    partitioning assumption as the repo's other windowed ops: a key's
    rows fit one bucket's pandas group (size ``num_buckets`` to the
    data — with_hash_bucket docstring)."""
    order_cols = list(order_cols)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key] + order_cols, kind="mergesort")
        # dropna=False: null keys form ONE partition numbered 1..n, the
        # SQL ROW_NUMBER semantics — pandas' default would emit NaN seq
        # for them and degrade the column to float64
        g[out] = g.groupby(key, sort=False,
                           dropna=False).cumcount().to_numpy() + 1
        return g.drop(columns=["_bucket"])

    return with_hash_bucket(ds, key, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def ranks_per_key(ds: "ray.data.Dataset", key: str,
                  order_cols: Sequence[str],
                  tie_cols: Sequence[str] | None = None,
                  ntile: int | None = None,
                  percent_scale: int | None = None,
                  num_buckets: int = 1024) -> "ray.data.Dataset":
    """Per-key SQL ranking functions in one bucketed pass: ``rnk`` = RANK()
    and ``drnk`` = DENSE_RANK() over ``tie_cols`` (ties share a rank; RANK
    leaves gaps, DENSE_RANK doesn't), plus ``tile`` = NTILE(ntile) over the
    full ``order_cols`` total order when ``ntile`` is given.

    ``percent_scale`` adds fixed-point PERCENT_RANK / CUME_DIST columns in
    exact integer math (truncating division, matching a HUGEINT oracle):
    ``pr_scaled = (rnk−1)·scale // (m−1)`` (0 for single-row partitions,
    the SQL convention) and ``cume_scaled = c·scale // m`` where ``m`` is
    the key-partition size and ``c`` the number of rows whose tie tuple
    sorts ≤ the current row's.

    ``tie_cols`` (default: all of ``order_cols``) must be a PREFIX of
    ``order_cols`` — the sort arranges equal-tie rows contiguously only
    then.  Make the last order column unique so NTILE (which is
    position-based, not value-based) is deterministic; RANK/DENSE_RANK are
    deterministic regardless since ties map to equal outputs.

    Same scale shape as :func:`seq_index_per_key`: every row survives, one
    key-hash-bucket shuffle, then C-level sort + numpy index algebra per
    bucket (no per-key Python).  Null keys form ONE partition (factorize,
    matching SQL PARTITION BY) and null tie values one tie group."""
    order_cols = list(order_cols)
    tie_cols = order_cols if tie_cols is None else list(tie_cols)
    if order_cols[:len(tie_cols)] != tie_cols:
        raise ValueError(f"ranks_per_key: tie_cols {tie_cols!r} must be a "
                         f"prefix of order_cols {order_cols!r}")
    if ntile is not None and ntile < 1:
        raise ValueError(f"ranks_per_key: ntile must be >= 1, got {ntile}")
    if percent_scale is not None and percent_scale < 1:
        raise ValueError(f"ranks_per_key: percent_scale must be >= 1, "
                         f"got {percent_scale}")

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key] + order_cols, kind="mergesort")
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        kcodes, _ = pd.factorize(g[key], use_na_sentinel=False)
        new_seg = np.r_[True, kcodes[1:] != kcodes[:-1]]
        new_tie = new_seg.copy()
        for c in tie_cols:
            # factorize so nulls compare equal to each other (one tie
            # group), and adjacency comparison works for any dtype
            oc, _ = pd.factorize(g[c], use_na_sentinel=False)
            new_tie[1:] |= oc[1:] != oc[:-1]
        seg_start = np.maximum.accumulate(np.where(new_seg, idx, 0))
        tie_start = np.maximum.accumulate(np.where(new_tie, idx, 0))
        out = g.drop(columns=["_bucket"])
        out["rnk"] = tie_start - seg_start + 1
        d = np.cumsum(new_tie)
        out["drnk"] = d - d[seg_start] + 1
        if ntile is not None or percent_scale is not None:
            seg_id = np.cumsum(new_seg) - 1
            m = np.bincount(seg_id)[seg_id]
        if percent_scale is not None:
            rnk = tie_start - seg_start + 1
            out["pr_scaled"] = np.where(
                m > 1, (rnk - 1) * percent_scale // np.maximum(m - 1, 1), 0)
            # index of the LAST row of each tie group: nearest tie-group
            # end at or after the row (sentinel n, reverse min-accumulate)
            ends_here = np.r_[new_tie[1:], True]
            tie_end = np.minimum.accumulate(
                np.where(ends_here, idx, n)[::-1])[::-1]
            out["cume_scaled"] = (tie_end - seg_start + 1) * \
                percent_scale // m
        if ntile is not None:
            # NTILE: the first (m mod k) tiles get ceil(m/k) rows, the
            # rest floor(m/k), by row position within the key segment
            p = idx - seg_start
            base, rem = m // ntile, m % ntile
            boundary = rem * (base + 1)
            in_big = p < boundary
            # base==0 only when m < ntile, and then boundary == m > p,
            # so the small-tile branch (and its divisor) is never taken
            out["tile"] = np.where(
                in_big, p // (base + 1),
                rem + (p - boundary) // np.maximum(base, 1)) + 1
        return out

    return with_hash_bucket(ds, key, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def mode_per_key(ds: "ray.data.Dataset", key: str, val: str,
                 out: str | None = None,
                 num_buckets: int = 256) -> "ray.data.Dataset":
    """Per-key MODE: the most frequent ``val`` per ``key`` (ties → the
    smallest value, so the result is deterministic), plus its count
    ``n_mode``.

    Scale shape: counts are MERGEABLE, so each batch first collapses to
    per-(key, val) partial counts row-locally (the combiner — raw rows
    never shuffle), then ONE key-hash-bucket shuffle merges the partials
    and a C-level sort + drop_duplicates picks the winner per key.  Only
    |distinct (key, val)| rows move, not |rows|."""
    out = out or f"mode_{val}"

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby([key, val], sort=False, dropna=False) \
            .size().reset_index(name="_cnt")

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby([key, val], sort=False, dropna=False)["_cnt"] \
            .sum().reset_index()
        g = g.sort_values([key, "_cnt", val],
                          ascending=[True, False, True], kind="mergesort")
        g = g.drop_duplicates([key], keep="first")
        return pd.DataFrame({key: g[key], out: g[val],
                             "n_mode": g["_cnt"].astype("int64")})

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=None)
    return with_hash_bucket(partials, key, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def string_agg_per_key(ds: "ray.data.Dataset", key: str, val: str,
                       order_cols: Sequence[str], sep: str = ">",
                       out: str = "agg",
                       num_buckets: int = 256) -> "ray.data.Dataset":
    """Per-key ordered string concatenation — SQL ``STRING_AGG(val, sep
    ORDER BY order_cols)``; the "user journey" feature-building shape
    (event-type sequences per user).  Make the last order column unique
    for a deterministic string.

    Scale shape: one key-hash-bucket shuffle of (key, order, val), then a
    C-level sort per bucket; the join itself is per-key Python but over
    string data that is Python-object-backed in pandas anyway.  The
    output is one row per key — assume a key's rows fit one bucket (same
    contract as the repo's other windowed ops), and remember each output
    string is O(rows-per-key) long: follow with a hash/fingerprint stage
    rather than shipping giant strings onward at 100 TB."""
    order_cols = list(order_cols)

    def join_non_null(s: pd.Series):
        # SQL STRING_AGG skips NULL elements and yields NULL (not "")
        # for an all-null group; a raw sep.join would TypeError on None
        s = s.dropna()
        return sep.join(s) if len(s) else None

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key] + order_cols, kind="mergesort")
        agg = g.groupby(key, sort=False, dropna=False)[val] \
            .agg(join_non_null).reset_index(name=out)
        return agg

    cols = [key] + order_cols + [val]
    return with_hash_bucket(ds.select_columns(cols), key, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def melt(ds: "ray.data.Dataset", id_cols: Sequence[str],
         value_cols: Sequence[str], var_name: str = "variable",
         value_name: str = "value") -> "ray.data.Dataset":
    """UNPIVOT — the inverse of :func:`pivot_sum`'s widening: each input
    row becomes |value_cols| long rows ``(id_cols..., variable, value)``.
    Purely row-local (one C-level ``DataFrame.melt`` per batch, no
    shuffle); output is |value_cols|× the input row count, so follow with
    a filter/aggregate rather than materializing wide×long blowups."""
    id_cols, value_cols = list(id_cols), list(value_cols)

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.melt(id_vars=id_cols, value_vars=value_cols,
                          var_name=var_name, value_name=value_name)

    return ds.map_batches(per_batch, batch_format="pandas", batch_size=None)


def grouped_var_exact(ds: "ray.data.Dataset", keys: Sequence[str],
                      val: str, scale: int = 10**6) -> pd.DataFrame:
    """Per-group sample variance of an INTEGER column in exact arithmetic:
    ``var_scaled = (n·Σx² − (Σx)²) · scale // (n·(n−1))`` (floor division,
    groups with n<2 dropped).

    Shape: one combiner-first :func:`grouped_sum` ships only per-group
    ``(n, Σx, Σx²)`` partials — the classic algebraic-aggregate
    decomposition, mergeable across any partitioning — and the final
    formula runs on the report-shaped result in PYTHON ints (the
    ``n·Σx²·scale`` product overflows int64 long before the partials do,
    so the driver finish deliberately leaves int64).  Exactness makes the
    result hash-comparable against an oracle computing the same integer
    formula in HUGEINT, where float VAR_SAMP could differ in the last ulp.
    """
    keys = list(keys)

    def add_sq(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[keys + [val]].copy()
        batch["_sq"] = batch[val] * batch[val]
        return batch

    partials = grouped_sum(
        ds.map_batches(add_sq, batch_format="pandas", batch_size=None),
        keys, sums={val: "_sx", "_sq": "_sx2"}, count_as="_n").to_pandas()
    rows = partials[partials["_n"] >= 2]
    n = rows["_n"].astype(object)
    sx = rows["_sx"].astype(object)
    sx2 = rows["_sx2"].astype(object)
    var = (n * sx2 - sx * sx) * scale // (n * (n - 1))
    out = rows[keys].copy()
    out["n"] = rows["_n"].to_numpy()
    out["var_scaled"] = var.astype("int64").to_numpy()
    return out.reset_index(drop=True)


def _trunc_div(num: int, den: int) -> int:
    """Truncating integer division (toward zero) on Python ints — DuckDB's
    ``//`` semantics; Python's ``//`` FLOORS, which differs for negative
    numerators, so any oracle-compared fixed-point ratio must go through
    this."""
    q = abs(num) // abs(den)
    return q if (num >= 0) == (den > 0) else -q


def grouped_cov_exact(ds: "ray.data.Dataset", keys: Sequence[str],
                      x: str, y: str, scale: int = 10**6,
                      corr2_scale: int | None = None) -> pd.DataFrame:
    """Per-group sample covariance and OLS regression slope of two INTEGER
    columns in exact arithmetic:

    - ``cov_scaled``   = (n·Σxy − Σx·Σy) · scale ÷ (n·(n−1))
    - ``slope_scaled`` = (n·Σxy − Σx·Σy) · scale ÷ (n·Σx² − (Σx)²)
    - ``corr2_scaled`` = (n·Σxy − Σx·Σy)² · corr2_scale ÷
      ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))  — squared Pearson r, emitted
      only when ``corr2_scale`` is given (r itself needs a sqrt, which
      has no exact integer form; r² is a polynomial and stays exact).
      Keep ``corr2_scale`` modest (1e4): the oracle's HUGEINT numerator
      is num²·scale, and num² alone can reach ~1e28 on cents columns.

    with TRUNCATING division (:func:`_trunc_div`) because the numerator can
    be negative and the HUGEINT oracle's ``//`` truncates.  Groups with
    n < 2 or zero x-variance are dropped (the ratios are undefined there);
    with ``corr2_scale``, zero y-variance groups are dropped too.

    Same shape as :func:`grouped_var_exact`: one combiner-first
    :func:`grouped_sum` ships only per-group partials — mergeable across
    any partitioning — and the final formulas run on the report-shaped
    result in Python ints.  The product sums (Σxy, Σx², Σy²) are
    accumulated as SPLIT 32-bit halves (Σ(p>>32) and Σ(p&0xFFFFFFFF)
    separately, recombined in Python ints at the finish): a plain int64
    Σx² wraps at ~10^6 rows of cents-scale values (x² ≈ 2.5·10^13 each),
    while the split form is exact up to ~2·10^9 rows per group — and
    each per-row product must fit int64, guarded per batch (max|x|·max|y|
    < 2^62).  Σy² is only computed/shipped when ``corr2_scale`` is set."""
    keys = list(keys)
    want_yy = corr2_scale is not None
    _LO = np.int64(0xFFFFFFFF)

    def add_prods(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[keys + [x, y]].copy()
        xv = batch[x].to_numpy(np.int64)
        yv = batch[y].to_numpy(np.int64)
        if len(xv):
            mx, my = np.abs(xv).max(), np.abs(yv).max()
            if max(int(mx), int(my)) ** 2 >= 1 << 62 or \
                    int(mx) * int(my) >= 1 << 62:
                raise OverflowError(
                    f"grouped_cov_exact: |{x}|·|{y}| up to {mx}·{my} "
                    f"does not fit a per-row int64 product — rescale "
                    f"the inputs first")
        prods = [("_xy", xv * yv), ("_xx", xv * xv)]
        if want_yy:
            prods.append(("_yy", yv * yv))
        for name, p in prods:
            out[name + "h"] = p >> 32          # arithmetic shift: exact
            out[name + "l"] = p & _LO          # for negative p too
        return out

    sums = {x: "_sx", y: "_sy", "_xyh": "_sxyh", "_xyl": "_sxyl",
            "_xxh": "_sxxh", "_xxl": "_sxxl"}
    if want_yy:
        sums.update({"_yyh": "_syyh", "_yyl": "_syyl"})
    partials = grouped_sum(
        ds.map_batches(add_prods, batch_format="pandas", batch_size=None),
        keys, sums=sums, count_as="_n").to_pandas()
    rows = partials[partials["_n"] >= 2]
    two32 = 1 << 32

    def recombine(hi: pd.Series, lo: pd.Series) -> pd.Series:
        return hi.astype(object) * two32 + lo.astype(object)

    n = rows["_n"].astype(object)
    sx = rows["_sx"].astype(object)
    sy = rows["_sy"].astype(object)
    sxy = recombine(rows["_sxyh"], rows["_sxyl"])
    sxx = recombine(rows["_sxxh"], rows["_sxxl"])
    num = n * sxy - sx * sy
    var_den = n * sxx - sx * sx
    vary_den = None
    if want_yy:
        syy = recombine(rows["_syyh"], rows["_syyl"])
        vary_den = n * syy - sy * sy
    keep = var_den != 0
    if corr2_scale is not None:
        keep &= vary_den != 0
    rows, n, num = rows[keep], n[keep], num[keep]
    var_den = var_den[keep]
    if want_yy:
        vary_den = vary_den[keep]
    out = rows[keys].copy()
    out["n"] = rows["_n"].to_numpy()
    out["cov_scaled"] = np.fromiter(
        (_trunc_div(v * scale, c * (c - 1)) for v, c in zip(num, n)),
        dtype="int64", count=len(rows))
    out["slope_scaled"] = np.fromiter(
        (_trunc_div(v * scale, d) for v, d in zip(num, var_den)),
        dtype="int64", count=len(rows))
    if corr2_scale is not None:
        out["corr2_scaled"] = np.fromiter(
            (_trunc_div(v * v * corr2_scale, dx * dy)
             for v, dx, dy in zip(num, var_den, vary_den)),
            dtype="int64", count=len(rows))
    return out.reset_index(drop=True)


def top_k(ds: "ray.data.Dataset", by: list[str], descending: list[bool],
          k: int) -> "ray.data.Dataset":
    """Global top-k: per-batch partial top-k → coalesce → sort + limit.

    The partial pass bounds the sort input at |blocks| × k rows, and the
    coalesce avoids the tiny-block sort-shuffle pathology (a range sort of
    15k rows across hundreds of near-empty blocks measured 37 s; with the
    partial+coalesce it is sub-second).
    """
    from zeeklog_ray.aggregate import coalesce_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=[not d for d in descending]).head(k)

    pruned = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    return coalesce_partials(pruned).sort(by, descending=descending).limit(k)


def pivot_sum(ds: "ray.data.Dataset", index: str, pivot_col: str,
              value_col: str, categories: Sequence[str],
              prefix: str = "", count_as: str | None = None,
              bucketed: bool = False) -> "ray.data.Dataset":
    """Wide conditional aggregation (SQL PIVOT ... IN (...)): one output
    column per category holding the per-``index`` sum of ``value_col``
    where ``pivot_col`` equals that category, zero elsewhere.

    ``categories`` must be a KNOWN small list — the fixed-schema
    requirement every distributed pivot has (same as SQL PIVOT's IN
    list); values outside it contribute nothing to the category columns
    but still count toward ``count_as``, exactly like
    ``SUM(CASE WHEN ... ELSE 0 END)`` + ``COUNT(*)``.

    Scale shape: the widening is ROW-LOCAL (one ``where`` mask per
    category inside ``map_batches``), then :func:`grouped_sum` reduces —
    only |index| × (|categories| + 1) aggregated cells ever shuffle, not
    rows.  Output column order: ``index``, ``count_as`` (if set), then
    one ``{prefix}{category}`` per category in the given order.
    """
    cats = list(categories)
    if len(set(cats)) != len(cats):
        raise ValueError(f"pivot_sum: duplicate categories in {cats!r}")

    def widen(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({index: batch[index]})
        for c in cats:
            out[f"{prefix}{c}"] = batch[value_col].where(
                batch[pivot_col] == c, 0)
        return out

    wide = ds.select_columns([index, pivot_col, value_col]).map_batches(
        widen, batch_format="pandas", batch_size=None)
    # entity-shaped index (per-user, per-doc): bucketed=True keeps the
    # wide result distributed; the default one-block finish is for
    # report-shaped indexes only
    reducer = grouped_sum_bucketed if bucketed else grouped_sum
    return reducer(wide, [index],
                   sums={f"{prefix}{c}": f"{prefix}{c}" for c in cats},
                   count_as=count_as)


def set_op(a: "ray.data.Dataset", b: "ray.data.Dataset",
           cols: Sequence[str], op: str,
           num_buckets: int = 256) -> "ray.data.Dataset":
    """Distinct set operations — SQL ``INTERSECT`` / ``EXCEPT`` over the
    ``cols`` tuples of two datasets.

    Scale shape: tag each side with a ``_side`` bit (row-local), union,
    then ONE hash-bucketed shuffle on the tuple; inside a bucket a
    C-level pandas groupby min/max of the side bit decides membership
    (min==0 ⇒ in A; max==1 ⇒ in B).  Equal-key rows always land in the
    same bucket, so the decision is local; only distinct-ish tuples need
    to coexist in a bucket, never whole tables on one node.  For a
    HUGELY larger B side, prefer :func:`bloom_semi_filter` (EXCEPT ≈
    anti-join) — this operator is the exact symmetric form.
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"set_op: op must be 'intersect' or 'except', "
                         f"got {op!r}")
    cols = list(cols)

    def tag(side: int):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[cols].copy()
            out["_side"] = np.int8(side)
            return out

        return f

    tagged = a.select_columns(cols).map_batches(
        tag(0), batch_format="pandas", batch_size=None).union(
        b.select_columns(cols).map_batches(
            tag(1), batch_format="pandas", batch_size=None))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(cols, sort=False, dropna=False)["_side"] \
            .agg(["min", "max"]).reset_index()
        keep = (g["min"] == 0) & \
            ((g["max"] == 1) if op == "intersect" else (g["max"] == 0))
        return g.loc[keep, cols]

    bucketed = with_hash_bucket(tagged, cols, num_buckets)
    return bucketed.groupby("_bucket").map_groups(per_bucket,
                                                  batch_format="pandas")


# Default salt for cap_per_key's draw hash: an arbitrary odd 64-bit
# constant so the cap's "random" order is DECORRELATED from
# ops.sample.hash_sample's unsalted mix64 on the same id column (else the
# same low-hash rows would win both the sample and the cap).
CAP_SALT = 0x6C62272E07BB0142


def cap_per_key(ds: "ray.data.Dataset", key: str | Sequence[str], n: int,
                id_col: str, salt: int = CAP_SALT,
                num_buckets: int = 1024) -> "ray.data.Dataset":
    """Deterministic per-key CAP: keep at most ``n`` rows per key — the
    ``n`` with the smallest ``mix64(id + salt)`` (ties broken by the id
    itself, so a unique ``id_col`` gives a total order).  The "max
    documents per domain" operator of a training-data pipeline: unlike a
    rate sample (:func:`ops.sample.hash_sample`) the cap is EXACT per
    key, and unlike top-N-by-value the winners are an unbiased
    deterministic draw — the same rows survive on any cluster layout or
    partitioning.  ``id_col`` must be non-negative integers (doc_id);
    the SQL replay treats ids as HUGEINT in [0, 2^63).

    Scale shape: a row-local per-batch prune first cuts every block to
    ≤ n rows per key IT contains, so at most |blocks|·n·|keys-per-block|
    rows shuffle — a hot key (half the corpus one domain) still ships
    only n rows per block, never the full table.  One key-hash-bucketed
    pass then picks the global winners with a C-level sort +
    ``groupby.head``.  SQL replay: ``ROW_NUMBER() OVER (PARTITION BY key
    ORDER BY mix64(id+salt), id) <= n`` via ops.sample.mix64_sql
    (bit-exact splitmix64 in HUGEINT)."""
    if n < 1:
        raise ValueError(f"cap_per_key: n must be >= 1, got {n}")
    keys = [key] if isinstance(key, str) else list(key)
    salt64 = np.uint64(salt % (1 << 64))

    def draw_order(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        if not np.issubdtype(ids.dtype, np.integer):
            raise TypeError(f"{id_col} must be integer, got {ids.dtype}")
        if len(ids) and ids.min() < 0:
            # the HUGEINT oracle replay and the id tiebreak both assume
            # non-negative ids; a silent uint64 wrap would diverge
            raise ValueError(f"cap_per_key: {id_col} must be "
                             f"non-negative, saw {ids.min()}")
        batch["_h"] = _mix64(ids.astype(np.uint64, copy=False) + salt64)
        return batch.sort_values(["_h", id_col], kind="mergesort")

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        b = draw_order(batch)
        return b.groupby(keys, sort=False, dropna=False).head(n)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["_h", id_col], kind="mergesort")
        return g.groupby(keys, sort=False, dropna=False).head(n) \
            .drop(columns=["_bucket", "_h"])

    pruned = ds.map_batches(prune, batch_format="pandas", batch_size=None)
    return with_hash_bucket(pruned, keys, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


_NULLABLE_INT = {"int8": "Int8", "int16": "Int16", "int32": "Int32",
                 "int64": "Int64", "uint8": "UInt8", "uint16": "UInt16",
                 "uint32": "UInt32", "uint64": "UInt64"}


def _int_np_dtype(typ):
    """Numpy integer dtype of a schema entry (Arrow type or numpy dtype),
    or None if the column is not integer-typed."""
    import pyarrow as _pa

    if isinstance(typ, _pa.DataType):
        return (np.dtype(typ.to_pandas_dtype())
                if _pa.types.is_integer(typ) else None)
    try:
        return np.dtype(typ) if np.issubdtype(typ, np.integer) else None
    except TypeError:
        return None


def _key_kind(typ) -> str:
    """Normalized join-key dtype label across Arrow-block and pandas-block
    schema flavors: any string representation → "str", numerics → their
    numpy dtype string — so an Arrow `string` left side and an
    object-dtype pandas right side compare equal, while float32 vs
    float64 (whose bucket hashes differ) do not."""
    import pyarrow as _pa

    if isinstance(typ, _pa.DataType):
        if _pa.types.is_string(typ) or _pa.types.is_large_string(typ):
            return "str"
        try:
            return str(np.dtype(typ.to_pandas_dtype()))
        except TypeError:
            return str(typ)
    try:
        dt = np.dtype(typ)
    except TypeError:
        return str(typ)
    return "str" if dt.kind in ("O", "U", "S") else str(dt)


def _nullable_int_casts(schemas, cols: set[str]):
    """(numpy_casts, pandas_nullable_casts) for every integer column in
    ``cols`` across ``schemas`` — the tagged-union dtype armor: a numpy
    int64 column null-filled on the other side's rows promotes the WHOLE
    block to float64, silently rounding ids above 2^53, so integer
    columns ride the union as pandas NULLABLE Int dtypes and cast back on
    the way out (inner-join outputs are never null there)."""
    int_casts = {}
    for sch in schemas:
        for name, typ in zip(sch.names, sch.types):
            dt = _int_np_dtype(typ)
            if dt is not None and name in cols:
                int_casts[name] = dt
    return int_casts, {c: _NULLABLE_INT[str(dt)] for c, dt in int_casts.items()}


def bucketed_equi_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                       on: str | Sequence[str],
                       right_on: str | Sequence[str] | None = None,
                       num_buckets: int = 1024) -> "ray.data.Dataset":
    """INNER equi-join via tagged union + ONE key-hash-bucket shuffle +
    per-bucket C-level ``pandas.merge`` — the alternative to
    ``Dataset.join`` when Ray's hash-shuffle aggregator spin-up dominates
    (measured: two chained 2M⨝1M ``Dataset.join``s cost 14 s of mostly
    infra at 32 CPUs; the same joins bucketed run in ~5 s).  Supports
    multi-column keys; ``right_on`` columns are renamed onto ``on``.
    Null keys match nothing (inner semantics).  Same bucket-count sizing
    rule as :func:`with_hash_bucket`; assumes one bucket's rows fit one
    task (both sides land in the same pandas group).

    Prefer ``Dataset.join`` when either side is so large that a single
    bucket would blow a worker's heap AND the key is near-unique (its
    partition-sized aggregation has no per-group cliff); prefer this for
    the mid-scale entity joins that dominate these pipelines."""
    on = [on] if isinstance(on, str) else list(on)
    right_on = (on if right_on is None
                else [right_on] if isinstance(right_on, str)
                else list(right_on))
    if len(on) != len(right_on):
        raise ValueError("bucketed_equi_join: on/right_on length mismatch")
    lschema, rschema = left.schema(), right.schema()
    lcols = list(lschema.names)
    missing = [c for c in on if c not in lcols] + \
        [c for c in right_on if c not in rschema.names]
    if missing:
        raise ValueError(f"bucketed_equi_join: key columns {missing} "
                         "not present in their side")
    reserved = {"_side", "_bucket"} & (set(lcols) | set(rschema.names))
    if reserved:
        raise ValueError(f"bucketed_equi_join: columns {sorted(reserved)} "
                         "are reserved internal names — rename first")
    rename = dict(zip(right_on, on))
    r_out = [rename.get(c, c) for c in rschema.names]
    collide = [c for c in r_out if c not in on and c in lcols]
    if collide:
        raise ValueError(f"bucketed_equi_join: right columns {collide} "
                         "collide with left columns — rename first")
    r_keep = on + [c for c in r_out if c not in on]
    out_cols = lcols + [c for c in r_out if c not in on]
    int_casts, nullable_casts = _nullable_int_casts(
        (lschema, rschema), set(out_cols))
    # Key-dtype harmonization: the bucket hash is dtype-sensitive, so a
    # float key on one side and an int key on the other would hash the
    # SAME value into DIFFERENT buckets and silently drop every match —
    # reject mismatched key kinds outright, and widen int-int pairs of
    # different widths to one nullable dtype on both sides.
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = {rename.get(n, n): t for n, t in zip(rschema.names,
                                                  rschema.types)}
    for kcol in on:
        li, ri = _int_np_dtype(ltypes[kcol]), _int_np_dtype(rtypes[kcol])
        if (li is None) != (ri is None):
            raise ValueError(
                f"bucketed_equi_join: key {kcol!r} is integer on one side "
                f"({ltypes[kcol]} vs {rtypes[kcol]}) — same values would "
                "hash to different buckets; cast the sides to one dtype")
        if li is not None:
            wide = li if li.itemsize >= ri.itemsize else ri
            int_casts[kcol] = wide
            nullable_casts[kcol] = _NULLABLE_INT[str(wide)]
        elif _key_kind(ltypes[kcol]) != _key_kind(rtypes[kcol]):
            raise ValueError(
                f"bucketed_equi_join: key {kcol!r} dtype differs across "
                f"sides ({ltypes[kcol]} vs {rtypes[kcol]}); cast first")

    def tag(side: str, ren: dict | None):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.rename(columns=ren) if ren else batch.copy()
            for c in batch.columns:
                dt = nullable_casts.get(c)
                if dt:
                    batch[c] = batch[c].astype(dt)
            batch["_side"] = side
            return batch

        return f

    both = left.map_batches(tag("L", None), batch_format="pandas",
                            batch_size=None) \
        .union(right.map_batches(tag("R", rename), batch_format="pandas",
                                 batch_size=None))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group.loc[group["_side"] == "L",
                       [c for c in lcols if c in group.columns]]
        rg = group.loc[group["_side"] == "R",
                       [c for c in r_keep if c in group.columns]]
        if lg.empty or rg.empty:       # single-sided bucket: no matches
            return pd.DataFrame(columns=out_cols).astype(int_casts)
        lg = lg.dropna(subset=on)
        rg = rg.dropna(subset=on)
        if lg.empty or rg.empty:
            return pd.DataFrame(columns=out_cols).astype(int_casts)
        m = lg.merge(rg, on=on, how="inner")
        return m[out_cols].astype(int_casts)

    return with_hash_bucket(both, on, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def bucketed_semi_anti_join(left: "ray.data.Dataset",
                            right: "ray.data.Dataset",
                            on: str | Sequence[str],
                            right_on: str | Sequence[str] | None = None,
                            anti: bool = False,
                            num_buckets: int = 1024) -> "ray.data.Dataset":
    """SEMI (``anti=False``) / ANTI (``anti=True``) equi-join: keep each
    ``left`` row iff its key tuple is present / absent in ``right``.

    Output is the LEFT columns unchanged and never more rows than
    ``left`` — the existence test dedups the right side, so unlike an
    inner join a hot right key cannot fan rows out.  NOT-EXISTS null
    semantics: a null key matches nothing (kept by anti, dropped by
    semi), which is what ``WHERE [NOT] EXISTS`` — not ``NOT IN`` —
    computes.

    Scale shape: the right side is reduced to per-batch DISTINCT key
    tuples BEFORE the exchange (key-shaped, not row-shaped), then both
    sides take ONE key-hash-bucket shuffle and the per-bucket test is a
    C-level indicator merge.  This is the big-right-side complement to
    the broadcast tiers (``bloom_semi_filter``, the driver-set anti in
    queries.customers_without_orders): broadcast when the key set fits a
    worker's heap, bucket when it doesn't.  Same dtype-harmonization
    rules as :func:`bucketed_equi_join` (mismatched key kinds would hash
    the same value into different buckets — rejected outright)."""
    on = [on] if isinstance(on, str) else list(on)
    right_on = (on if right_on is None
                else [right_on] if isinstance(right_on, str)
                else list(right_on))
    if len(on) != len(right_on):
        raise ValueError("bucketed_semi_anti_join: on/right_on length "
                         "mismatch")
    lschema, rschema = left.schema(), right.schema()
    # empty-side degenerate cases (schema unresolvable): an empty left has
    # nothing to keep; an empty right matches nothing — semi keeps nothing,
    # anti keeps everything
    if lschema is None:
        return left
    if rschema is None:
        return left if anti else left.limit(0)
    lcols = list(lschema.names)
    missing = [c for c in on if c not in lcols] + \
        [c for c in right_on if c not in rschema.names]
    if missing:
        raise ValueError(f"bucketed_semi_anti_join: key columns {missing} "
                         "not present in their side")
    reserved = {"_side", "_bucket", "_m"} & set(lcols)
    if reserved:
        raise ValueError(f"bucketed_semi_anti_join: columns "
                         f"{sorted(reserved)} are reserved internal names "
                         "— rename first")
    rename = dict(zip(right_on, on))
    int_casts, nullable_casts = _nullable_int_casts((lschema,), set(lcols))
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = {rename.get(n, n): t for n, t in zip(rschema.names,
                                                  rschema.types)}
    for kcol in on:
        li, ri = _int_np_dtype(ltypes[kcol]), _int_np_dtype(rtypes[kcol])
        if (li is None) != (ri is None):
            raise ValueError(
                f"bucketed_semi_anti_join: key {kcol!r} is integer on one "
                f"side ({ltypes[kcol]} vs {rtypes[kcol]}) — same values "
                "would hash to different buckets; cast the sides to one "
                "dtype")
        if li is not None:
            wide = li if li.itemsize >= ri.itemsize else ri
            int_casts[kcol] = wide
            nullable_casts[kcol] = _NULLABLE_INT[str(wide)]
        elif _key_kind(ltypes[kcol]) != _key_kind(rtypes[kcol]):
            raise ValueError(
                f"bucketed_semi_anti_join: key {kcol!r} dtype differs "
                f"across sides ({ltypes[kcol]} vs {rtypes[kcol]}); cast "
                "first")

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        for c in batch.columns:
            dt = nullable_casts.get(c)
            if dt:
                batch[c] = batch[c].astype(dt)
        batch["_side"] = "L"
        return batch

    def keys_right(batch: pd.DataFrame) -> pd.DataFrame:
        # key-shaped exchange: distinct non-null key tuples per batch
        # (cross-batch dups collapse inside the bucket's merge — a full
        # pre-distinct would cost a second shuffle for nothing)
        kb = batch.rename(columns=rename)[on].dropna().drop_duplicates()
        for c in on:
            dt = nullable_casts.get(c)
            if dt:
                kb[c] = kb[c].astype(dt)
        kb["_side"] = "R"
        return kb

    both = left.map_batches(tag_left, batch_format="pandas",
                            batch_size=None) \
        .union(right.map_batches(keys_right, batch_format="pandas",
                                 batch_size=None))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group.loc[group["_side"] == "L",
                       [c for c in lcols if c in group.columns]]
        if lg.empty:
            return pd.DataFrame(columns=lcols).astype(int_casts)
        rg = group.loc[group["_side"] == "R", on].dropna() \
            .drop_duplicates()
        if rg.empty:
            out = lg if anti else lg.iloc[0:0]
            return out[lcols].astype(int_casts)
        null_keys = lg[on].isna().any(axis=1)
        probe = lg.loc[~null_keys]
        hit = probe.merge(rg, on=on, how="left",
                          indicator="_m")["_m"].to_numpy() == "both"
        kept = probe.loc[~hit if anti else hit]
        if anti and null_keys.any():
            kept = pd.concat([kept, lg.loc[null_keys]])
        return kept[lcols].astype(int_casts)

    return with_hash_bucket(both, on, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def key_skew_profile(ds: "ray.data.Dataset", key: str,
                     num_buckets: int = 1024) -> pd.DataFrame:
    """Single-row skew diagnostic of a grouping key — the first question
    to ask before hash-partitioning 100 TB by it: total rows, distinct
    keys, the hottest key's row count and ppm share, and the p50/p99
    per-key row counts.

    Shape: one entity-shaped bucketed count (only (key, partial-count)
    rows shuffle), then the count DISTRIBUTION collapses to a value
    histogram (`ops.sketch.exact_quantiles` — |distinct count values|
    rows on the driver, tiny even at 10^9 keys) plus per-block extrema
    partials.  All integer-exact; ``max_share_ppm`` uses truncating
    division to match SQL ``//``.  Null keys count as one key, matching
    SQL GROUP BY."""
    from zeeklog_ray.ops.sketch import exact_quantiles

    counts = grouped_sum_bucketed(ds.select_columns([key]), [key],
                                  count_as="n_k",
                                  num_buckets=num_buckets).materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"rows": [int(df["n_k"].sum())],
                             "keys": [len(df)],
                             "mx": [int(df["n_k"].max()) if len(df) else 0]})

    parts = counts.map_batches(partial, batch_format="pandas",
                               batch_size=None).to_pandas()
    n_rows = int(parts["rows"].sum()) if "rows" in parts.columns else 0
    if n_rows == 0:         # before the quantile pass: an empty Dataset's
        raise ValueError("key_skew_profile: empty input")  # to_pandas()
    n_keys = int(parts["keys"].sum())                      # loses columns
    mx = int(parts["mx"].max())
    q = exact_quantiles(counts, "n_k", [0.5, 0.99])
    qv = q.set_index("q")["value"]
    return pd.DataFrame({
        "n_rows": pd.array([n_rows], dtype="int64"),
        "n_keys": pd.array([n_keys], dtype="int64"),
        "max_key_rows": pd.array([mx], dtype="int64"),
        "max_share_ppm": pd.array([mx * 1_000_000 // n_rows], dtype="int64"),
        "p50_key_rows": pd.array([int(qv.loc[0.5])], dtype="int64"),
        "p99_key_rows": pd.array([int(qv.loc[0.99])], dtype="int64"),
    })


def retention_cohorts(events: "ray.data.Dataset", user_col: str = "user_id",
                      ts_col: str = "ts",
                      num_buckets: int = 1024) -> "ray.data.Dataset":
    """Cohort retention over an event stream: distinct users per
    (first-seen epoch-week, week-offset).  Weeks are integer epoch-day
    // 7 so a SQL replay truncates identically.  Output: (cohort_week,
    week_offset, n_users).

    ONE user-hash-bucket shuffle does all the entity work: the row-local
    map dedups (user, week) per batch (bounding the exchange at
    |users-per-batch| × |weeks|), then each bucket — which holds every
    row of its users — dedups exactly, derives the per-user min via a
    C-level transform, and emits (cohort, offset, user) triples that are
    unique by construction.  The earlier formulation (entity MIN +
    equi-join + triple-dedup) cost three shuffles of the same rows;
    measured at 5M events / 100k users: 16.1 s → 3.0 s."""

    def to_weeks(batch: pd.DataFrame) -> pd.DataFrame:
        days = batch[ts_col].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        out = pd.DataFrame({user_col: batch[user_col].to_numpy(),
                            "w": days // 7})
        # null users match nothing (the SQL replay's inner join on
        # user_id) — dropping them here also keeps the week columns
        # int64 (a NaN min would float-promote whole buckets)
        out = out.dropna(subset=[user_col])
        return out.drop_duplicates()      # partial dedup pre-shuffle

    weeks = events.select_columns([user_col, ts_col]).map_batches(
        to_weeks, batch_format="pandas", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([user_col, "w"])
        cw = g.groupby(user_col, sort=False)["w"].transform("min")
        return pd.DataFrame({
            "cohort_week": cw.to_numpy(),
            "week_offset": (g["w"] - cw).to_numpy(),
            user_col: g[user_col].to_numpy()})

    trip = with_hash_bucket(weeks, user_col, num_buckets) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
    return grouped_sum(trip, ["cohort_week", "week_offset"],
                       count_as="n_users")


def sampled_range_boundaries(proj: "ray.data.Dataset", col: str,
                             num_buckets: int, sample_n: int = 8192,
                             seed: int = 7,
                             ctx: str = "sampled_range_boundaries") -> np.ndarray:
    """Deterministic range-bucket boundaries for ``col``: sample ~sample_n
    values (bernoulli over every block — never ``limit``, which biases
    toward the first blocks), sort, take ``num_buckets - 1`` evenly spaced
    order statistics, dedupe.  Shared by :func:`global_rank` and
    ``partitioned.write_sorted_zonemap`` — rows with equal values always
    land in the same bucket (callers assign with ``searchsorted
    side='right'``).  Null sort keys are rejected (SQL null-ordering
    varies by dialect — make the policy explicit upstream)."""
    n_rows = proj.count()
    if n_rows == 0:
        return np.array([])
    frac = min(1.0, 1.25 * sample_n / n_rows)
    samp = proj.select_columns([col]).random_sample(frac, seed=seed) \
        .to_pandas()
    if len(samp) == 0:
        samp = proj.select_columns([col]).limit(sample_n).to_pandas()
    if samp[col].isna().any():
        raise ValueError(f"{ctx}: null values in sort key {col!r}")
    vals = np.sort(samp[col].to_numpy())
    qs = (np.arange(1, num_buckets) * len(vals)) // num_buckets
    return np.unique(vals[qs]) if len(vals) else np.array([])


def global_rank(ds: "ray.data.Dataset", by: str, tie: str,
                num_buckets: int = 64, sample_n: int = 8192,
                seed: int = 7) -> "ray.data.Dataset":
    """Distributed global ROW_NUMBER ordered by ``(by, tie)`` ascending —
    the range-partitioned sort-rank: sample the sort key for bucket
    boundaries (deterministic seed), assign each row its range bucket
    row-locally, count per bucket (≤ ``num_buckets`` rows to the
    driver), then one bucketed pass sorts each range and adds its prefix
    offset — rank is 1-based, dense across the whole dataset, and ties
    break by ``tie`` so the result is total and replayable as SQL
    ``ROW_NUMBER() OVER (ORDER BY by, tie)``.

    Equal ``by`` values always land in the SAME range bucket
    (searchsorted on value), so a pathologically hot value makes one
    bucket large — inherent to rank semantics (equal values need
    contiguous ranks); rank on a finer composite key if that bites.
    Null sort keys are rejected (SQL null-ordering varies by dialect —
    make the policy explicit upstream)."""
    proj = ds.select_columns([by, tie]).materialize()
    if proj.count() == 0:
        return proj.map_batches(
            lambda df: df.assign(rank=pd.array([], dtype="int64")),
            batch_format="pandas", batch_size=None)
    boundaries = sampled_range_boundaries(proj, by, num_buckets, sample_n,
                                          seed, ctx="global_rank")
    bref = ray.put(boundaries)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        if batch[by].isna().any():
            raise ValueError(f"global_rank: null values in sort key {by!r}")
        bounds = ray.get(bref)
        batch = batch.copy()
        batch["_rb"] = np.searchsorted(bounds, batch[by].to_numpy(),
                                       side="right").astype(np.int64)
        return batch

    assigned = proj.map_batches(assign, batch_format="pandas",
                                batch_size=None).materialize()
    counts = grouped_sum(assigned.select_columns(["_rb"]), ["_rb"],
                         count_as="m").to_pandas().sort_values("_rb")
    offsets = dict(zip(counts["_rb"],
                       counts["m"].cumsum() - counts["m"]))
    oref = ray.put(offsets)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(oref)
        g = group.sort_values([by, tie], kind="mergesort")
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64) \
            + np.int64(offs[int(g["_rb"].iloc[0])])
        return g.drop(columns=["_rb"])

    return assigned.groupby("_rb").map_groups(per_bucket,
                                              batch_format="pandas")
