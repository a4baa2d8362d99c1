"""Deterministic hash sampling / mixture resampling (ops/sample.py):
partition independence, exact rate semantics, epoch numbering, and the
bit-exact DuckDB splitmix64 replay the oracles rely on."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from zeeklog_ray.ops.sample import (
    EPOCH_SALT,
    _rate_threshold,
    hash_sample,
    hash_sample_sql,
    mix64_sql,
    mixture_resample,
    mixture_resample_sql,
)
from zeeklog_ray.relational import _mix64


def _docs(n=4_000, n_src=4):
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "source": [f"s{i % n_src}" for i in range(n)],
        "val": np.arange(n, dtype="int64") * 7,
    })


def test_mix64_sql_replay_bit_exact():
    """The HUGEINT CTE produces exactly relational._mix64 — including the
    wraparound edges (0, 2^63, 2^64-1) and a salted variant."""
    xs = np.array([0, 1, 2, 12345, 2**63, 2**64 - 1, 987654321987654321],
                  dtype=np.uint64)
    con = duckdb.connect()
    con.sql("CREATE TABLE t(x HUGEINT)")
    for v in xs.tolist():
        con.sql(f"INSERT INTO t VALUES ({int(v)})")
    for salt in (0, int(EPOCH_SALT)):
        steps, final = mix64_sql("x", salt=salt)
        sql = (f"WITH _m0 AS (SELECT x, {steps[0]} AS z0 FROM t), "
               f"_m1 AS (SELECT x, {steps[1]} AS z1 FROM _m0), "
               f"_m2 AS (SELECT x, {steps[2]} AS z2 FROM _m1) "
               f"SELECT CAST(x AS VARCHAR), CAST({final} AS VARCHAR) FROM _m2")
        got = {r[0]: int(r[1]) for r in con.sql(sql).fetchall()}
        want = {str(int(x)): int(h)
                for x, h in zip(xs, _mix64(xs + np.uint64(salt)))}
        assert got == want


def test_hash_sample_partition_independent(ray_session):
    """Same rows selected regardless of block layout — the property that
    makes the sample reproducible on any cluster shape."""
    df = _docs()
    picked = []
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = hash_sample(ds, "doc_id", rate=0.3).to_pandas()
        picked.append(set(out["doc_id"]))
    assert picked[0] == picked[1]
    # rate is honored statistically (binomial 3σ at n=4000, p=.3: ±87)
    assert abs(len(picked[0]) - 1200) < 90


def test_hash_sample_rate_edges(ray_session):
    df = _docs(500)
    ds = ray.data.from_pandas(df)
    assert hash_sample(ds, "doc_id", rate=1.0).count() == 500
    assert hash_sample(ds, "doc_id", rate=0.0).count() == 0
    with pytest.raises(ValueError):
        hash_sample(ds, "doc_id", rate=1.5)
    with pytest.raises(ValueError):
        hash_sample(ds, "doc_id")  # neither rate nor rates


def test_hash_sample_per_source_rates(ray_session):
    df = _docs(4_000, n_src=4)
    ds = ray.data.from_pandas(df)
    out = hash_sample(ds, "doc_id", by="source",
                      rates={"s0": 1.0, "s1": 0.0, "s2": 0.5},
                      default_rate=0.25).to_pandas()
    by = out.groupby("source").size()
    assert by.get("s0", 0) == 1000          # rate 1.0: every row
    assert by.get("s1", 0) == 0             # rate 0.0: none
    assert abs(by.get("s2", 0) - 500) < 60  # ~3σ
    assert abs(by.get("s3", 0) - 250) < 50  # default rate


def test_hash_sample_rejects_float_keys(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"k": [1.5, 2.5]}))
    with pytest.raises(Exception, match="integer"):
        hash_sample(ds, "k", rate=0.5).materialize()


def test_mixture_resample_copy_counts_and_epochs(ray_session):
    df = _docs(3_000, n_src=3)
    ds = ray.data.from_pandas(df).repartition(5)
    out = mixture_resample(ds, "doc_id", "source",
                           {"s0": 2.25, "s1": 1.0, "s2": 0.5}).to_pandas()
    per_doc = out.groupby("doc_id").agg(n=("epoch", "size"),
                                        mx=("epoch", "max"),
                                        src=("source", "first"))
    # epochs number 0..n-1 per doc
    assert (per_doc["mx"] == per_doc["n"] - 1).all()
    s0 = per_doc[per_doc["src"] == "s0"]["n"]
    assert set(s0.unique()) <= {2, 3}
    assert abs(s0.mean() - 2.25) < 0.1
    assert (per_doc[per_doc["src"] == "s1"]["n"] == 1).all()
    # rate<1 inside mixture: some docs absent entirely
    n_s2 = per_doc[per_doc["src"] == "s2"]["n"]
    assert (n_s2 == 1).all() and abs(len(n_s2) - 500) < 60
    # value columns ride along unchanged
    one = out[out["doc_id"] == int(s0.index[0])]
    assert (one["val"] == one["doc_id"] * 7).all()


def test_mixture_resample_fractional_independent_of_hash_sample():
    """The salted epoch hash must not correlate with the plain sampling
    hash: a doc kept by hash_sample(rate=r) is not systematically the doc
    that gets the extra epoch copy."""
    keys = np.arange(20_000, dtype=np.uint64)
    kept = _mix64(keys) < np.uint64(_rate_threshold(0.5))
    extra = _mix64(keys + EPOCH_SALT) < np.uint64(_rate_threshold(0.5))
    joint = (kept & extra).mean()
    assert abs(joint - 0.25) < 0.01  # independent ⇒ p·q


def test_sample_sql_matches_ray_on_frame(ray_session):
    """End-to-end parity on a synthetic frame (the registry queries cover
    the documents table; this pins the generic SQL builders)."""
    df = _docs(2_000, n_src=3)
    con = duckdb.connect()
    con.register("t", df)
    rates = {"s0": 0.8, "s1": 0.2}
    ds = ray.data.from_pandas(df)
    mine = hash_sample(ds, "doc_id", by="source", rates=rates,
                       default_rate=0.5).to_pandas()
    orc = con.sql(hash_sample_sql("t", "doc_id", "doc_id, source, val",
                                  "source", rates, default_rate=0.5)).df()
    assert sorted(map(tuple, mine[["doc_id", "source", "val"]].values.tolist())) == \
        sorted(map(tuple, orc.values.tolist()))

    mrates = {"s0": 1.9, "s1": 3.0}
    mine2 = mixture_resample(ds, "doc_id", "source", mrates,
                             default_rate=0.25).to_pandas()
    orc2 = con.sql(mixture_resample_sql("t", "doc_id", "doc_id, source, val",
                                        "source", mrates,
                                        default_rate=0.25)).df()
    key = ["doc_id", "epoch"]
    assert sorted(map(tuple, mine2[key].values.tolist())) == \
        sorted(map(tuple, orc2[key].values.tolist()))


def test_shuffle_rank_is_permutation_and_replay(ray_session):
    from zeeklog_ray.ops.sample import SHUFFLE_SALT, shuffle_rank

    rng = np.random.default_rng(11)
    ids = rng.permutation(3000).astype(np.int64)
    df = pd.DataFrame({"doc_id": ids, "v": np.arange(3000)})
    out = shuffle_rank(ray.data.from_pandas(df), "doc_id",
                       prefix_bits=6).to_pandas()
    # positions are exactly 0..n-1 (a permutation, no gaps/dups)
    assert sorted(out["shuffle_pos"]) == list(range(3000))
    # matches the driver-side replay of the same (mix64(id+salt), id) sort
    h = _mix64(df["doc_id"].to_numpy(np.uint64)
               + np.uint64(SHUFFLE_SALT % (1 << 64)))
    exp = df.assign(_h=h).sort_values(["_h", "doc_id"]) \
        .reset_index(drop=True)
    got = out.sort_values("shuffle_pos").reset_index(drop=True)
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    assert (got["v"].to_numpy() == exp["v"].to_numpy()).all()


def test_shuffle_rank_partition_independent(ray_session):
    from zeeklog_ray.ops.sample import shuffle_rank

    df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64)})
    one = shuffle_rank(ray.data.from_pandas(df), "doc_id") \
        .to_pandas().sort_values("doc_id")
    many = shuffle_rank(ray.data.from_pandas(
        [df.iloc[i:i + 50] for i in range(0, 500, 50)]), "doc_id") \
        .to_pandas().sort_values("doc_id")
    assert (one["shuffle_pos"].to_numpy()
            == many["shuffle_pos"].to_numpy()).all()


def test_shuffle_rank_guards(ray_session):
    from zeeklog_ray.ops.sample import shuffle_rank

    with pytest.raises(ValueError):
        shuffle_rank(ray.data.from_pandas(
            pd.DataFrame({"doc_id": [1]})), "doc_id", prefix_bits=0)
    with pytest.raises(Exception):    # negative ids refused inside task
        shuffle_rank(ray.data.from_pandas(
            pd.DataFrame({"doc_id": [-1]})), "doc_id").count()


# ---- split_assign ---------------------------------------------------------


def test_split_assign_covers_all_rows_with_stable_labels(ray_session):
    from zeeklog_ray.ops.sample import split_assign

    df = _docs(6_000)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = split_assign(ray.data.from_pandas(df, override_num_blocks=1),
                     "doc_id", fr).to_pandas()
    b = split_assign(ray.data.from_pandas(df, override_num_blocks=13),
                     "doc_id", fr).to_pandas()
    assert len(a) == len(df)
    # block-split invariant (row-local, deterministic)
    a_s = a.sort_values("doc_id").reset_index(drop=True)
    b_s = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_series_equal(a_s["split"], b_s["split"])
    # fractions approximately honored (mix64 is uniform)
    share = a["split"].value_counts(normalize=True)
    assert abs(share["train"] - 0.8) < 0.03
    assert abs(share["val"] - 0.1) < 0.02
    assert abs(share["test"] - 0.1) < 0.02
    # subset stability: dropping rows never moves a surviving doc's split
    sub = split_assign(
        ray.data.from_pandas(df.iloc[::7].reset_index(drop=True)),
        "doc_id", fr).to_pandas().set_index("doc_id")["split"]
    full = a.set_index("doc_id")["split"]
    assert (full.loc[sub.index] == sub).all()


def test_split_assign_sql_replay_bit_exact(ray_session):
    from zeeklog_ray.ops.sample import split_assign, split_assign_sql

    df = _docs(3_000)
    fr = {"train": 0.7, "val": 0.2, "test": 0.1}
    got = split_assign(ray.data.from_pandas(df), "doc_id", fr).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.sql(split_assign_sql("documents", "doc_id",
                                   "doc_id, source", fr)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (got["split"].to_numpy() == exp["split"].to_numpy()).all()


def test_split_assign_validation(ray_session):
    from zeeklog_ray.ops.sample import split_assign

    ds = ray.data.from_pandas(_docs(10))
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(ds, "doc_id", {"a": 0.5, "b": 0.4}).to_pandas()
    with pytest.raises(ValueError, match="at least two"):
        split_assign(ds, "doc_id", {"a": 1.0}).to_pandas()
    with pytest.raises(Exception, match="must be integer"):
        df = _docs(10).assign(fk=np.linspace(0, 1, 10))
        split_assign(ray.data.from_pandas(df), "fk",
                     {"a": 0.5, "b": 0.5}).to_pandas()


def test_split_assign_saturated_band_truncates_not_crashes(ray_session):
    """A trailing zero fraction saturates a non-last cumulative threshold
    at 2^64 — must truncate to the reachable bands (matching the SQL CASE,
    whose first `< 2^64` arm always fires), not overflow uint64."""
    from zeeklog_ray.ops.sample import split_assign, split_assign_sql

    df = _docs(500)
    for fr in ({"train": 1.0, "test": 0.0},
               {"a": 0.5, "b": 0.5, "c": 0.0}):
        got = split_assign(ray.data.from_pandas(df), "doc_id",
                           fr).to_pandas().sort_values("doc_id")
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.sql(split_assign_sql("documents", "doc_id",
                                       "doc_id, source", fr)).df() \
            .sort_values("doc_id")
        assert (got["split"].to_numpy() == exp["split"].to_numpy()).all()
    # the saturating label absorbs everything; later labels are unreachable
    assert set(got["split"]) <= {"a", "b"}


def test_stratified_sample_balance_and_determinism(ray_session):
    from zeeklog_ray.ops.sample import stratified_sample

    df = pd.DataFrame({
        "doc_id": np.arange(3000),
        "lang": np.repeat(["en", "de", "fr"], [2000, 940, 60]),
    })
    a = stratified_sample(ray.data.from_pandas(df), "doc_id", "lang", 80) \
        .to_pandas()
    b = stratified_sample(ray.data.from_pandas(df).repartition(17),
                          "doc_id", "lang", 80).to_pandas()
    # partition-independent: identical kept set
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    per = a.groupby("lang").size()
    # binomial noise around the target for sampled groups
    assert 40 <= per["en"] <= 120 and 40 <= per["de"] <= 120
    # group below target keeps everything (threshold >= 2^64)
    assert per["fr"] == 60


def test_stratified_sample_rejects_float_keys(ray_session):
    from zeeklog_ray.ops.sample import stratified_sample

    df = pd.DataFrame({"doc_id": [1.5, 2.5], "lang": ["en", "en"]})
    with pytest.raises(Exception):
        stratified_sample(ray.data.from_pandas(df), "doc_id", "lang", 1) \
            .to_pandas()
