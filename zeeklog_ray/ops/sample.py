"""Deterministic hash-based sampling and mixture re-weighting.

The sampling a training-data pipeline needs is REPRODUCIBLE and
PARTITION-INDEPENDENT: the same rows are selected no matter how the input
is sharded, how many workers run, or in which order blocks arrive —
``Dataset.random_sample`` gives none of that.  Both operators here decide
per-row from a 64-bit mix of a stable integer key (splitmix64,
``relational._mix64`` — one mixer definition engine-wide), so they are pure
row-local ``map_batches`` filters: ZERO shuffle, embarrassingly parallel,
and the 100 TB cost is exactly one streaming pass.

Down-sampling:  keep row  ⇔  mix64(key) < rate·2^64.
Mixture re-sampling (rates may exceed 1 — epoch oversampling, the
Pile/Dolma-style source weighting): emit ``floor(rate)`` copies of every
row plus one extra  ⇔  mix64(key + EPOCH_SALT) < frac(rate)·2^64, with an
``epoch`` column numbering the copies.  The extra-copy hash is salted so
it is independent of any down-sampling decision on the same key.

Thresholds are computed ONCE in Python as exact integers
(``_rate_threshold``) and embedded as literals in the DuckDB oracle
(``sample_sql_parts``), which replays splitmix64 bit-exactly in HUGEINT
arithmetic (32-bit split multiplication keeps products under 2^127).

Reference tie-in: the reference samples nothing (it scans everything,
zeek_log.rs:236-266); this family is part of the LLM-pipeline operator
set the brief adds on top.
"""

from __future__ import annotations

import math
from collections.abc import Mapping

import numpy as np
import pandas as pd

import ray.data

from zeeklog_ray.relational import _mix64

# Salt for the fractional-epoch hash: an arbitrary odd 64-bit constant.
# Adding it before mixing decorrelates the oversample decision from the
# plain mix64(key) used by hash_sample on the same key column.
EPOCH_SALT = np.uint64(0xA24BAED4963EE407)

_M64 = 1 << 64


def _rate_threshold(rate: float) -> int:
    """rate ∈ [0,1] → exact integer threshold in [0, 2^64].

    Computed once on the driver; the float product is deterministic and the
    SAME literal is embedded in the SQL oracle, so Ray and DuckDB compare
    against identical integers.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return min(_M64, int(rate * _M64))


def hash_sample(ds: "ray.data.Dataset", key_col: str,
                rate: float | None = None,
                by: str | None = None,
                rates: Mapping[str, float] | None = None,
                default_rate: float = 0.0) -> "ray.data.Dataset":
    """Deterministic down-sample: keep a row iff mix64(key) < rate·2^64.

    * ``rate`` — one global rate, or
    * ``by`` + ``rates`` — per-group rates keyed by the value of column
      ``by`` (the mixture-weighting shape: different keep-rates per
      ``source``), with ``default_rate`` for unlisted groups.

    Row-local filter — no shuffle, no state; at 10^12 rows this is one
    streaming pass whose output is immediately pipelined into the next
    stage.  ``key_col`` must be integer-typed and stable across runs
    (doc_id); float keys are refused (bit-pattern hashing would be
    dtype-fragile).
    """
    if (rate is None) == (rates is None):
        raise ValueError("pass exactly one of rate= or rates=")
    if rates is not None and by is None:
        raise ValueError("rates= needs by=<group column>")

    if rate is not None:
        thr = _rate_threshold(rate)

        def keep_global(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return batch
            keys = batch[key_col].to_numpy()
            if not np.issubdtype(keys.dtype, np.integer):
                raise TypeError(f"{key_col} must be integer, got {keys.dtype}")
            if thr >= _M64:
                return batch
            mask = _mix64(keys.astype(np.uint64, copy=False)) < np.uint64(thr)
            return batch[mask]

        return ds.map_batches(keep_global, batch_format="pandas",
                              batch_size=None)

    thr_map = {s: _rate_threshold(r) for s, r in rates.items()}
    dflt_thr = _rate_threshold(default_rate)

    def keep_grouped(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        keys = batch[key_col].to_numpy()
        if not np.issubdtype(keys.dtype, np.integer):
            raise TypeError(f"{key_col} must be integer, got {keys.dtype}")
        h = _mix64(keys.astype(np.uint64, copy=False))
        # factorize → per-UNIQUE-source thresholds → np.take: the Python
        # dict probes run once per distinct source, not once per row
        codes, uniq = pd.factorize(batch[by], use_na_sentinel=False)
        u_thr = [thr_map.get(s, dflt_thr) for s in uniq]
        # rate=1.0 (threshold 2^64) doesn't fit uint64: strict-< against
        # the clamped value plus an explicit keep-all mask for exactness
        full = np.array([t >= _M64 for t in u_thr], dtype=bool)[codes]
        thr_exact = np.array([min(t, _M64 - 1) for t in u_thr],
                             dtype=np.uint64)[codes]
        mask = (h < thr_exact) | full
        return batch[mask]

    return ds.map_batches(keep_grouped, batch_format="pandas",
                          batch_size=None)


def mixture_resample(ds: "ray.data.Dataset", key_col: str, by: str,
                     rates: Mapping[str, float],
                     default_rate: float = 1.0,
                     epoch_col: str = "epoch") -> "ray.data.Dataset":
    """Source-mixture re-weighting with rates that may EXCEED 1.

    Every row is emitted ``floor(rate)`` times, plus one extra copy iff
    mix64(key + EPOCH_SALT) < frac(rate)·2^64; copies are numbered in
    ``epoch_col`` (0-based).  rate=2.3 ⇒ every row appears twice and a
    deterministic 30% of rows a third time — the standard way to hit a
    target token mixture (oversample small high-quality sources, keep big
    ones at <1) without a shuffle: the expansion is ``np.repeat`` inside
    one ``map_batches``, row-local and streaming.

    Epoch numbering exists so downstream shuffles / packing can treat each
    copy as a distinct row (doc_id, epoch) while lineage still points at
    the original doc.
    """
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("rates must be >= 0")
    whole = {s: int(math.floor(r)) for s, r in rates.items()}
    frac_thr = {s: _rate_threshold(r - math.floor(r))
                for s, r in rates.items()}
    dflt_whole = int(math.floor(default_rate))
    dflt_frac = _rate_threshold(default_rate - math.floor(default_rate))

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            out = batch.copy()
            out[epoch_col] = pd.Series([], dtype="int64")
            return out
        keys = batch[key_col].to_numpy()
        if not np.issubdtype(keys.dtype, np.integer):
            raise TypeError(f"{key_col} must be integer, got {keys.dtype}")
        h = _mix64(keys.astype(np.uint64, copy=False) + EPOCH_SALT)
        # factorize → per-UNIQUE-source rates → np.take (dict probes once
        # per distinct source, not once per row)
        codes, uniq = pd.factorize(batch[by], use_na_sentinel=False)
        base = np.array([whole.get(s, dflt_whole) for s in uniq],
                        dtype=np.int64)[codes]
        u_frac = [frac_thr.get(s, dflt_frac) for s in uniq]
        fthr = np.array([min(t, _M64 - 1) for t in u_frac],
                        dtype=np.uint64)[codes]
        full = np.array([t >= _M64 for t in u_frac], dtype=bool)[codes]
        extra = ((h < fthr) | full).astype(np.int64)
        copies = base + extra
        out = batch.iloc[np.repeat(np.arange(len(batch)), copies)].copy()
        # epoch = 0..copies-1 per row: global arange minus each row's start
        starts = np.repeat(np.cumsum(copies) - copies, copies)
        out[epoch_col] = np.arange(copies.sum()) - starts
        return out.reset_index(drop=True)

    return ds.map_batches(expand, batch_format="pandas", batch_size=None)


# --------------------------------------------------------------------------
# DuckDB oracle construction: bit-exact splitmix64 in HUGEINT
# --------------------------------------------------------------------------

def _mulmod_sql(z: str, c: int) -> str:
    """(z·c) mod 2^64 in HUGEINT via 32-bit split — z·c can reach 2^128
    which overflows HUGEINT (max 2^127−1); lo·c and hi·c stay < 2^96."""
    m32 = 1 << 32
    return (f"((({z}) % {m32}::HUGEINT) * {c}::HUGEINT + "
            f"(((({z}) // {m32}::HUGEINT) * {c}::HUGEINT) % {m32}::HUGEINT)"
            f" * {m32}::HUGEINT) % {_M64}::HUGEINT")


def mix64_sql(key_expr: str, salt: int = 0) -> tuple[list[str], str]:
    """SQL replay of ``relational._mix64`` (splitmix64 finalizer).

    Returns (cte_selects, final_col): three chained SELECT bodies to wrap
    as CTE steps ``_m0 → _m1 → _m2`` plus the final expression over
    ``_m2.z2``.  xor works on HUGEINT natively; ``//`` is the unsigned
    right shift because z stays in [0, 2^64).  Verified bit-exact against
    the numpy mixer in tests/test_ops_sample.py.
    """
    x = f"(({key_expr})::HUGEINT + {salt}::HUGEINT) % {_M64}::HUGEINT"
    s0 = f"({x} + 11400714819323198485::HUGEINT) % {_M64}::HUGEINT"
    s1 = _mulmod_sql(f"xor(z0, z0 // {1 << 30}::HUGEINT)",
                     0xBF58476D1CE4E5B9)
    s2 = _mulmod_sql(f"xor(z1, z1 // {1 << 27}::HUGEINT)",
                     0x94D049BB133111EB)
    final = f"xor(z2, z2 // {1 << 31}::HUGEINT)"
    return [s0, s1, s2], final


def hash_sample_sql(table_sql: str, key_col: str, select_cols: str,
                    by: str | None, rates: Mapping[str, float] | None,
                    rate: float | None = None,
                    default_rate: float = 0.0) -> str:
    """Oracle SQL equivalent of :func:`hash_sample` over ``table_sql``."""
    steps, final = mix64_sql(key_col)
    if rate is not None:
        thr = f"{_rate_threshold(rate)}::HUGEINT"
    else:
        cases = " ".join(
            f"WHEN '{s}' THEN {_rate_threshold(r)}::HUGEINT"
            for s, r in rates.items())
        thr = (f"CASE {by} {cases} ELSE "
               f"{_rate_threshold(default_rate)}::HUGEINT END")
    return (
        f"WITH _m0 AS (SELECT *, {steps[0]} AS z0 FROM {table_sql}), "
        f"_m1 AS (SELECT *, {steps[1]} AS z1 FROM _m0), "
        f"_m2 AS (SELECT *, {steps[2]} AS z2 FROM _m1) "
        f"SELECT {select_cols} FROM _m2 WHERE {final} < {thr}")


def mixture_resample_sql(table_sql: str, key_col: str, select_cols: str,
                         by: str, rates: Mapping[str, float],
                         default_rate: float = 1.0) -> str:
    """Oracle SQL equivalent of :func:`mixture_resample` (epoch column
    included via generate_series)."""
    steps, final = mix64_sql(key_col, salt=int(EPOCH_SALT))
    max_copies = max(int(math.floor(r)) + 1 for r in
                     list(rates.values()) + [default_rate])
    whole_cases = " ".join(
        f"WHEN '{s}' THEN {int(math.floor(r))}" for s, r in rates.items())
    whole = (f"CASE {by} {whole_cases} ELSE "
             f"{int(math.floor(default_rate))} END")
    frac_cases = " ".join(
        f"WHEN '{s}' THEN {_rate_threshold(r - math.floor(r))}::HUGEINT"
        for s, r in rates.items())
    frac = (f"CASE {by} {frac_cases} ELSE "
            f"{_rate_threshold(default_rate - math.floor(default_rate))}"
            f"::HUGEINT END")
    return (
        f"WITH _m0 AS (SELECT *, {steps[0]} AS z0 FROM {table_sql}), "
        f"_m1 AS (SELECT *, {steps[1]} AS z1 FROM _m0), "
        f"_m2 AS (SELECT *, {steps[2]} AS z2 FROM _m1), "
        f"_cnt AS (SELECT *, {whole} + (CASE WHEN {final} < {frac} "
        f"THEN 1 ELSE 0 END) AS _copies FROM _m2) "
        f"SELECT {select_cols}, gs.epoch AS epoch FROM _cnt, "
        f"generate_series(0, {max_copies - 1}) gs(epoch) "
        f"WHERE gs.epoch < _copies")


# Salt for shuffle_rank's order hash — decorrelated from hash_sample's
# unsalted draw and cap_per_key's CAP_SALT so sampling, capping and
# shuffling the same id column are independent decisions.
SHUFFLE_SALT = 0xD1B54A32D192ED03


def shuffle_rank(ds: "ray.data.Dataset", id_col: str = "doc_id",
                 salt: int = SHUFFLE_SALT, prefix_bits: int = 12,
                 out: str = "shuffle_pos") -> "ray.data.Dataset":
    """Deterministic GLOBAL shuffle with an explicit training order:
    ``out`` = the row's position when all rows are sorted by
    ``(mix64(id + salt), id)`` — the reproducible, partition-independent
    "shuffle the corpus once before training" every run needs (the same
    order on any cluster layout; ``Dataset.random_shuffle`` is neither
    deterministic nor rank-producing).

    No global sort operator and nothing materializes on the driver.
    Two-level prefix sum over the hash's TOP ``prefix_bits`` bits (bucket
    order == hash order, so ranks are globally consistent):

      pass 1  per-batch ``np.bincount`` of hash-prefix buckets →
              combiner-first sum (≤ 2^prefix_bits rows cross the wire) →
              driver exclusive-cumsum → broadcast via ``ray.put``;
      pass 2  rows shuffle ONCE bucketed by the prefix; each bucket
              C-sorts by (hash, id) and adds base + arange.

    mix64 output is uniform, so buckets are balanced regardless of input
    skew.  Size ``prefix_bits`` ≈ log2(n_rows / rows_per_task): 12 bits
    (4096 buckets) keeps 10^10 rows at ~2.4M rows/task; use 16-20 bits at
    10^12.  The input is scanned twice (counts, then shuffle) — feed a
    column-pruned read or a persisted intermediate, not an expensive
    upstream pipeline.  SQL replay: ``ROW_NUMBER() OVER (ORDER BY
    mix64(id+salt), id) - 1`` (:func:`shuffle_rank_sql`)."""
    import ray

    from zeeklog_ray.relational import grouped_sum

    if not 1 <= prefix_bits <= 24:
        raise ValueError(f"prefix_bits must be in [1, 24], got {prefix_bits}")
    nb = 1 << prefix_bits
    shift = np.uint64(64 - prefix_bits)
    salt64 = np.uint64(salt % _M64)

    def hash_ids(batch: pd.DataFrame) -> np.ndarray:
        ids = batch[id_col].to_numpy()
        if not np.issubdtype(ids.dtype, np.integer):
            raise TypeError(f"{id_col} must be integer, got {ids.dtype}")
        if len(ids) and ids.min() < 0:
            raise ValueError(f"shuffle_rank: {id_col} must be "
                             f"non-negative, saw {ids.min()}")
        return _mix64(ids.astype(np.uint64, copy=False) + salt64)

    def bucket_counts(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"_b": pd.Series([], dtype="int64"),
                                 "_n": pd.Series([], dtype="int64")})
        cnt = np.bincount((hash_ids(batch) >> shift).astype(np.int64),
                          minlength=nb)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"_b": nz.astype(np.int64), "_n": cnt[nz]})

    counts = grouped_sum(
        ds.map_batches(bucket_counts, batch_format="pandas",
                       batch_size=None),
        ["_b"], sums={"_n": "_n"}).to_pandas()
    full = np.zeros(nb, dtype=np.int64)
    if len(counts):
        full[counts["_b"].to_numpy()] = counts["_n"].to_numpy()
    base_ref = ray.put(np.cumsum(full) - full)      # exclusive prefix

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = hash_ids(batch)
        batch["_h"] = h
        batch["_bucket"] = (h >> shift).astype(np.int64)
        return batch

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(base_ref)
        b = int(group["_bucket"].iat[0])
        g = group.sort_values(["_h", id_col], kind="mergesort") \
            .drop(columns=["_bucket", "_h"])
        g[out] = base[b] + np.arange(len(g), dtype=np.int64)
        return g

    bucketed = ds.map_batches(add_bucket, batch_format="pandas",
                              batch_size=None)
    return bucketed.groupby("_bucket").map_groups(per_bucket,
                                                  batch_format="pandas")


def shuffle_rank_sql(table_sql: str, id_col: str, select_cols: str,
                     salt: int = SHUFFLE_SALT,
                     out: str = "shuffle_pos") -> str:
    """Oracle SQL equivalent of :func:`shuffle_rank` (bit-exact
    splitmix64 in HUGEINT)."""
    steps, final = mix64_sql(id_col, salt=salt)
    return (
        f"WITH _m0 AS (SELECT *, {steps[0]} AS z0 FROM {table_sql}), "
        f"_m1 AS (SELECT *, {steps[1]} AS z1 FROM _m0), "
        f"_m2 AS (SELECT *, {steps[2]} AS z2 FROM _m1) "
        f"SELECT {select_cols}, ROW_NUMBER() OVER "
        f"(ORDER BY {final}, {id_col}) - 1 AS {out} FROM _m2")


def cap_per_key_sql(table_sql: str, key_cols: str, id_col: str,
                    select_cols: str, n: int, salt: int) -> str:
    """Oracle SQL equivalent of :func:`relational.cap_per_key`:
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY mix64(id+salt), id)``
    kept while ≤ n — the splitmix64 draw replayed bit-exact in HUGEINT."""
    steps, final = mix64_sql(id_col, salt=salt)
    return (
        f"WITH _m0 AS (SELECT *, {steps[0]} AS z0 FROM {table_sql}), "
        f"_m1 AS (SELECT *, {steps[1]} AS z1 FROM _m0), "
        f"_m2 AS (SELECT *, {steps[2]} AS z2 FROM _m1), "
        f"_r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY {key_cols} "
        f"ORDER BY {final}, {id_col}) AS rn FROM _m2) "
        f"SELECT {select_cols} FROM _r WHERE rn <= {n}")


# Salt for train/val/test assignment — a public xorshift* constant,
# decorrelated from the sampling / shuffle / cap salts above so splitting
# is independent of every other per-id decision on the same key column.
SPLIT_SALT = 0x2545F4914F6CDD1D


def _split_thresholds(fractions: Mapping[str, float]) -> list[tuple[str, int]]:
    """(label, exclusive upper threshold) in declaration order; the LAST
    label absorbs the full remainder (threshold 2^64) so float rounding in
    the cumulative sum can never orphan a hash value."""
    if len(fractions) < 2:
        raise ValueError("split_assign: need at least two splits")
    total = math.fsum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split_assign: fractions must sum to 1, "
                         f"got {total!r}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("split_assign: fractions must be non-negative")
    labels = list(fractions)
    out, cum = [], 0.0
    for lab in labels[:-1]:
        cum += fractions[lab]
        out.append((lab, _rate_threshold(cum)))
    out.append((labels[-1], _M64))
    # a non-last band whose cumulative threshold saturates 2^64 (e.g. a
    # trailing zero fraction) absorbs EVERY hash, so later bands are
    # unreachable — truncate there.  Matches the SQL CASE exactly (its
    # first `final < 2^64` WHEN always fires) and keeps every retained
    # non-terminal threshold < 2^64, which is what lets split_assign hold
    # them in a uint64 array (hash_sample handles the same saturation with
    # a keep-all mask, ops/sample.py:115-120)
    for p, (_, thr) in enumerate(out):
        if thr >= _M64:
            return out[:p + 1]
    return out


def split_assign(ds: "ray.data.Dataset", key_col: str,
                 fractions: Mapping[str, float],
                 salt: int = SPLIT_SALT,
                 out: str = "split") -> "ray.data.Dataset":
    """Deterministic train/val/test assignment: label by which cumulative
    band ``mix64(key + salt)`` falls into.

    Row-local — no shuffle, no state, stable across runs/nodes/block
    splits: the SAME doc always lands in the SAME split, which is the
    property that keeps eval sets leak-free as the corpus regenerates.
    ``fractions`` is an ordered mapping (e.g. ``{"train": .8, "val": .1,
    "test": .1}``) summing to 1; the hash bands replay bit-exactly in SQL
    via :func:`split_assign_sql`.  Integer key column required (same
    contract as :func:`hash_sample`)."""
    bands = _split_thresholds(fractions)
    thrs = np.array([t for _, t in bands[:-1]], dtype=np.uint64)
    labs = np.array([lab for lab, _ in bands])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch.assign(**{out: pd.Series([], dtype=object)})
        keys = batch[key_col].to_numpy()
        if not np.issubdtype(keys.dtype, np.integer):
            raise TypeError(f"{key_col} must be integer, got {keys.dtype}")
        # uint64 addition wraps mod 2^64 — exactly the SQL replay's
        # (key + salt) % 2^64
        h = _mix64(keys.astype(np.uint64, copy=False) + np.uint64(salt))
        idx = np.searchsorted(thrs, h, side="right")
        batch = batch.copy()
        batch[out] = labs[idx]
        return batch

    return ds.map_batches(tag, batch_format="pandas", batch_size=None)


def split_assign_sql(table_sql: str, key_col: str, select_cols: str,
                     fractions: Mapping[str, float],
                     salt: int = SPLIT_SALT, out: str = "split") -> str:
    """Oracle SQL equivalent of :func:`split_assign` (bit-exact splitmix64
    in HUGEINT; identical cumulative thresholds)."""
    bands = _split_thresholds(fractions)
    steps, final = mix64_sql(key_col, salt=salt)
    whens = " ".join(f"WHEN {final} < {thr}::HUGEINT THEN '{lab}'"
                     for lab, thr in bands[:-1])
    # a saturated first band truncates to a single label — CASE needs ≥1
    # WHEN arm, so emit the constant directly
    case = (f"CASE {whens} ELSE '{bands[-1][0]}' END" if whens
            else f"'{bands[-1][0]}'")
    return (
        f"WITH _m0 AS (SELECT *, {steps[0]} AS z0 FROM {table_sql}), "
        f"_m1 AS (SELECT *, {steps[1]} AS z1 FROM _m0), "
        f"_m2 AS (SELECT *, {steps[2]} AS z2 FROM _m1) "
        f"SELECT {select_cols}, {case} AS {out} FROM _m2")


# Salt for the stratified-sample draw — decorrelated from hash_sample's
# unsalted mix, the epoch/shuffle/split/cap salts, so stratifying the same
# id column is an independent decision.
STRATA_SALT = 0x9E3779B97F4A7C15


def stratified_sample(ds: "ray.data.Dataset", key_col: str, by: str,
                      target_per_group: int) -> "ray.data.Dataset":
    """Balanced stratified sample: keep ~``target_per_group`` rows per
    value of ``by``, deterministically, by deriving each stratum's
    keep-rate from its actual size (two passes: count → row-local hash
    filter).  The threshold is the EXACT integer
    ``target · 2^64 // n_group`` (no float rate), so the HUGEINT SQL
    replay matches bit-for-bit; groups at or under target keep
    everything.

    Scale shape: pass 1 is a report-shaped grouped count (strata are
    bounded: languages, sources, buckets — for entity-shaped strata use
    cap_per_key instead, which needs no global counts); pass 2 is a
    row-local shuffle-free filter, the hash_sample property.  Expected
    kept per group is target ± binomial noise; for an EXACTLY-target
    sample use cap_per_key (rank-based) at the cost of a shuffle.
    """
    from zeeklog_ray.relational import grouped_sum

    counts = grouped_sum(ds.select_columns([by]), [by],
                         count_as="n").to_pandas()
    thr_map = {g: (int(target_per_group) << 64) // int(n)
               for g, n in zip(counts[by], counts["n"])}
    salt = np.uint64(STRATA_SALT)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        keys = batch[key_col].to_numpy()
        if not np.issubdtype(keys.dtype, np.integer):
            raise TypeError(f"{key_col} must be integer, got {keys.dtype}")
        h = _mix64(keys.astype(np.uint64, copy=False) + salt)
        codes, uniq = pd.factorize(batch[by], use_na_sentinel=False)
        u_thr = [thr_map.get(g, 0) for g in uniq]
        full = np.array([t >= _M64 for t in u_thr], dtype=bool)[codes]
        thr_exact = np.array([min(t, _M64 - 1) for t in u_thr],
                             dtype=np.uint64)[codes]
        return batch[(h < thr_exact) | full]

    return ds.map_batches(keep, batch_format="pandas", batch_size=None)


def stratified_sample_sql(table_sql: str, key_col: str, select_cols: str,
                          by: str, target_per_group: int) -> str:
    """Oracle SQL equivalent of :func:`stratified_sample` — the group
    counts and the exact integer threshold recomputed in HUGEINT."""
    steps, final = mix64_sql(key_col, salt=STRATA_SALT)
    return (
        f"WITH _c AS (SELECT {by}, COUNT(*) AS n FROM {table_sql} "
        f"GROUP BY 1), "
        f"_m0 AS (SELECT t.*, _c.n AS _n, {steps[0]} AS z0 "
        f"FROM {table_sql} t JOIN _c USING ({by})), "
        f"_m1 AS (SELECT *, {steps[1]} AS z1 FROM _m0), "
        f"_m2 AS (SELECT *, {steps[2]} AS z2 FROM _m1) "
        f"SELECT {select_cols} FROM _m2 WHERE {final} < "
        f"({target_per_group}::HUGEINT * 18446744073709551616::HUGEINT) "
        f"// _n::HUGEINT")
