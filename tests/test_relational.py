"""Bucketed-groupby relational helpers: distinct / grouped min over a
key-hash bucket — the scale substitutes for Dataset.groupby aggregates."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from zeeklog_ray.relational import (
    bucketed_distinct,
    bucketed_group_min,
    with_hash_bucket,
)


@pytest.fixture()
def pairs_df():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 40, 500)
    b = a + rng.integers(1, 5, 500)
    return pd.DataFrame({"doc_a": a, "doc_b": b})


@pytest.mark.parametrize("nb", [1, 64])   # nb=1 forces multi-key buckets
def test_bucketed_distinct_matches_pandas(ray_session, pairs_df, nb):
    out = bucketed_distinct(ray.data.from_pandas(pairs_df),
                            ["doc_a", "doc_b"], num_buckets=nb).to_pandas()
    exp = pairs_df.drop_duplicates()
    assert len(out) == len(out.drop_duplicates())          # actually distinct
    assert (set(map(tuple, out.to_numpy()))
            == set(map(tuple, exp.to_numpy())))


@pytest.mark.parametrize("nb", [1, 64])
def test_bucketed_group_min_matches_pandas(ray_session, nb):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"node": rng.integers(0, 30, 400),
                       "label": rng.integers(0, 1000, 400)})
    out = bucketed_group_min(ray.data.from_pandas(df), "node", "label",
                             num_buckets=nb).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    exp = df.groupby("node", sort=True)["label"].min().reset_index()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_with_hash_bucket_multikey_colocates(ray_session, pairs_df):
    out = with_hash_bucket(ray.data.from_pandas(pairs_df),
                           ["doc_a", "doc_b"], num_buckets=16).to_pandas()
    # same (doc_a, doc_b) tuple ⇒ same bucket, always
    n_buckets_per_key = out.groupby(["doc_a", "doc_b"])["_bucket"].nunique()
    assert (n_buckets_per_key == 1).all()
    assert out["_bucket"].between(0, 15).all()


def test_pivot_sum_semantics(ray_session):
    """PIVOT: zero-fill, out-of-list values count toward count_as but no
    column, duplicate categories rejected."""
    from zeeklog_ray.relational import pivot_sum

    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2],
        "t": ["a", "a", "b", "b", "zzz"],   # 'zzz' not in the IN-list
        "v": [10, 5, 7, 3, 100],
    })
    out = pivot_sum(ray.data.from_pandas(df), "u", "t", "v", ["a", "b"],
                    prefix="s_", count_as="n").to_pandas() \
        .sort_values("u").reset_index(drop=True)
    assert out.columns.tolist() == ["u", "n", "s_a", "s_b"]
    assert out.loc[0].tolist() == [1, 3, 15, 7]
    assert out.loc[1].tolist() == [2, 2, 0, 3]    # zzz in n, not in columns

    with pytest.raises(ValueError, match="duplicate"):
        pivot_sum(ray.data.from_pandas(df), "u", "t", "v", ["a", "a"])


def test_set_op_intersect_except(ray_session):
    from zeeklog_ray.relational import set_op

    a = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3, 3, 4],
                                           "s": list("aabbc")}))
    b = ray.data.from_pandas(pd.DataFrame({"k": [3, 4, 5],
                                           "s": list("bcd")}))
    inter = set_op(a, b, ["k", "s"], "intersect").to_pandas()
    assert sorted(map(tuple, inter.itertuples(index=False))) == [(3, "b"), (4, "c")]
    exc = set_op(a, b, ["k", "s"], "except").to_pandas()
    assert sorted(map(tuple, exc.itertuples(index=False))) == [(1, "a"), (2, "a")]
    with pytest.raises(ValueError, match="intersect"):
        set_op(a, b, ["k"], "union")


def test_rollup_sum(ray_session):
    from zeeklog_ray.relational import rollup_sum

    df = pd.DataFrame({
        "r": ["eu", "eu", "us"],
        "n": ["de", "fr", "ny"],
        "v": [1, 2, 4],
    })
    out = rollup_sum(ray.data.from_pandas(df).repartition(2), ["r", "n"],
                     sums={"v": "v"}, count_as="c")
    # levels: (r,n) finest ×3, (r) ×2, grand total ×1
    assert len(out) == 6
    fine = out[out["n"].notna()].set_index(["r", "n"])
    assert fine.loc[("eu", "de"), "v"] == 1
    sub = out[out["n"].isna() & out["r"].notna()].set_index("r")
    assert sub.loc["eu", "v"] == 3 and sub.loc["eu", "c"] == 2
    assert sub.loc["us", "v"] == 4
    total = out[out["r"].isna()]
    assert len(total) == 1
    assert total["v"].iloc[0] == 7 and total["c"].iloc[0] == 3
    assert out["v"].dtype == "int64" and out["c"].dtype == "int64"


def test_hash_join_full_outer(ray_session):
    from zeeklog_ray.relational import hash_join

    l = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "x": [10, 20]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [2, 3], "y": [200, 300]}))
    out = hash_join(l, r, on="k", how="full_outer").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    # key coalesced into one column; unmatched sides null-filled
    assert out["k"].tolist() == [1, 2, 3]
    assert out["x"].fillna(-1).tolist() == [10, 20, -1]
    assert out["y"].fillna(-1).tolist() == [-1, 200, 300]


def test_hash_join_empty_side_and_empty_first_block(ray_session):
    """Regression for the Ray 2.49 hash-shuffle schema-broadcast defect
    (raypatch.py): a join side that is entirely empty, or whose first
    bundle is an empty block, must not crash the aggregator with
    ``KeyError: <key>`` when sparse partitions finalize."""
    import pyarrow as pa

    from zeeklog_ray.relational import grouped_sum, hash_join

    # side B matches NOTHING -> entirely empty aggregate; the schema seed
    # keeps it joinable
    ev = ray.data.from_pandas(pd.DataFrame({
        "user_id": [1, 2, 3], "kind": ["a", "a", "b"]}))

    def pick(kind, out):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return b.loc[b["kind"] == kind, ["user_id"]]
        seed = pa.schema([("user_id", pa.int64()), (out, pa.int64())])
        return grouped_sum(ev.map_batches(f, batch_format="pandas",
                                          batch_size=None),
                           ["user_id"], count_as=out, empty_schema=seed)

    out = hash_join(pick("a", "n_a"), pick("zzz", "n_z"),
                    on="user_id", how="full_outer").to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)
    assert out["user_id"].tolist() == [1, 2]
    assert out["n_a"].tolist() == [1, 1]
    assert out["n_z"].isna().all()

    # empty FIRST block on one side (repartition manufactures zero-column
    # empties when rows < partitions) must not eat the schema broadcast
    sparse = ray.data.from_pandas(
        pd.DataFrame({"user_id": [7], "m": [70]})).repartition(4)
    dense = ray.data.from_pandas(
        pd.DataFrame({"user_id": [1, 7], "x": [10, 20]}))
    j = hash_join(dense, sparse, on="user_id", how="left_outer").to_pandas()
    j = j.sort_values("user_id").reset_index(drop=True)
    assert j["user_id"].tolist() == [1, 7]
    assert j["m"].fillna(-1).tolist() == [-1, 70]


def test_cube_sum(ray_session):
    from zeeklog_ray.relational import cube_sum

    ds = ray.data.from_pandas(pd.DataFrame({
        "a": ["x", "x", "y"], "b": ["p", "q", "p"], "v": [1, 2, 4]}))
    out = cube_sum(ds, ["a", "b"], sums={"v": "v"}, count_as="c")
    # 3 finest + 2 (a) + 2 (b) + 1 grand total = 8 rows
    assert len(out) == 8
    grand = out[out["a"].isna() & out["b"].isna()]
    assert grand["v"].iloc[0] == 7 and grand["c"].iloc[0] == 3
    only_b = out[out["a"].isna() & out["b"].notna()].set_index("b")
    assert only_b.loc["p", "v"] == 5 and only_b.loc["q", "v"] == 2
    only_a = out[out["b"].isna() & out["a"].notna()].set_index("a")
    assert only_a.loc["x", "c"] == 2 and only_a.loc["y", "v"] == 4


def test_latest_per_key_and_seq_index(ray_session):
    from zeeklog_ray.relational import latest_per_key, seq_index_per_key

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2],
        "ts": [10, 30, 20, 5, 5],
        "id": [100, 101, 102, 200, 201],
        "payload": list("abcde")})
    ds = ray.data.from_pandas([df.iloc[:2], df.iloc[2:]])  # multi-block

    latest = latest_per_key(ds, ["k"], ["ts", "id"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    # k=1 -> ts 30 (id 101); k=2 -> ts tie 5, max id 201
    assert latest["id"].tolist() == [101, 201]
    assert latest["payload"].tolist() == ["b", "e"]

    seq = seq_index_per_key(ds, "k", ["ts", "id"]).to_pandas() \
        .sort_values(["k", "seq"]).reset_index(drop=True)
    assert seq[seq["k"] == 1]["id"].tolist() == [100, 102, 101]
    assert seq[seq["k"] == 1]["seq"].tolist() == [1, 2, 3]
    assert seq[seq["k"] == 2]["id"].tolist() == [200, 201]


def test_grouped_var_exact(ray_session):
    from zeeklog_ray.relational import grouped_var_exact

    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 2 + ["c"],
                       "x": [1, 2, 3, 4, 10, 10, 99]})
    out = grouped_var_exact(ray.data.from_pandas(df), ["g"], "x") \
        .sort_values("g").reset_index(drop=True)
    # group c has n=1 -> dropped
    assert out["g"].tolist() == ["a", "b"]
    # var([1,2,3,4]) = 5/3 -> floor(5e6/3); var([10,10]) = 0
    assert out["var_scaled"].tolist() == [5 * 10**6 // 3, 0]
    assert out["n"].tolist() == [4, 2]


def test_grouped_cov_exact(ray_session):
    """Exact covariance/slope with TRUNCATING division: group 'b' has a
    NEGATIVE covariance, where Python's floor // would differ from the
    DuckDB-// semantics the oracle uses; group 'c' (n=1) and group 'd'
    (zero x-variance) are dropped."""
    from zeeklog_ray.relational import grouped_cov_exact

    df = pd.DataFrame({
        "g": ["a"] * 3 + ["b"] * 3 + ["c"] + ["d"] * 2,
        "x": [1, 2, 3, 1, 2, 3, 5, 7, 7],
        "y": [2, 4, 6, 6, 4, 2, 1, 1, 2]})
    out = grouped_cov_exact(ray.data.from_pandas(df), ["g"], "x", "y",
                            scale=10) \
        .sort_values("g").reset_index(drop=True)
    assert out["g"].tolist() == ["a", "b"]
    # a: cov=2, slope=2 -> scaled 20/20.  b: cov=-2, slope=-2:
    # numerator n·Σxy−Σx·Σy = 3·20−6·12 = -12; ÷ n(n−1)=6 → -2 exactly
    assert out["cov_scaled"].tolist() == [20, -20]
    assert out["slope_scaled"].tolist() == [20, -20]
    # truncation sign check: scale=3 → (-12·3)/6 = -6 exact; use an
    # inexact case via direct helper
    from zeeklog_ray.relational import _trunc_div
    assert _trunc_div(-7, 2) == -3        # DuckDB -7//2; Python floor = -4
    assert _trunc_div(7, 2) == 3


def test_grouped_cov_exact_corr2(ray_session):
    """corr2_scale emits squared Pearson r in fixed point (both perfectly
    correlated groups → exactly scale, sign-independent) and drops
    zero-y-variance groups — which survive without corr2_scale."""
    from zeeklog_ray.relational import grouped_cov_exact

    df = pd.DataFrame({
        "g": ["a"] * 3 + ["b"] * 3 + ["e"] * 2,
        "x": [1, 2, 3, 1, 2, 3, 1, 2],
        "y": [2, 4, 6, 6, 4, 2, 5, 5]})
    out = grouped_cov_exact(ray.data.from_pandas(df), ["g"], "x", "y",
                            scale=10, corr2_scale=100) \
        .sort_values("g").reset_index(drop=True)
    assert out["g"].tolist() == ["a", "b"]     # e: zero y-variance dropped
    assert out["corr2_scaled"].tolist() == [100, 100]

    no_corr = grouped_cov_exact(ray.data.from_pandas(df), ["g"], "x", "y",
                                scale=10)
    assert sorted(no_corr["g"]) == ["a", "b", "e"]
    assert "corr2_scaled" not in no_corr.columns


def test_ranks_per_key_matches_sql_semantics(ray_session):
    """RANK leaves gaps after ties, DENSE_RANK doesn't, NTILE splits the
    segment into balanced position-based tiles; tie_cols must be a prefix
    of order_cols."""
    import pytest
    from zeeklog_ray.relational import ranks_per_key

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 2,
        "v": [10, 10, 20, 20, 30, 7, 7],
        "id": [1, 2, 3, 4, 5, 6, 7]})
    out = ranks_per_key(ray.data.from_pandas([df.iloc[:3], df.iloc[3:]]),
                        "k", ["v", "id"], tie_cols=["v"], ntile=2,
                        percent_scale=100, num_buckets=4).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert out["rnk"].tolist() == [1, 1, 3, 3, 5, 1, 1]
    assert out["drnk"].tolist() == [1, 1, 2, 2, 3, 1, 1]
    # NTILE(2) over 5 rows -> tiles of 3 and 2 by position; over 2 -> 1,1
    assert out["tile"].tolist() == [1, 1, 1, 2, 2, 1, 2]
    # percent_rank = (rnk-1)*100 // (m-1); cume = tie-group-end count *100 // m
    assert out["pr_scaled"].tolist() == [0, 0, 50, 50, 100, 0, 0]
    assert out["cume_scaled"].tolist() == [40, 40, 80, 80, 100, 100, 100]

    with pytest.raises(ValueError, match="prefix"):
        ranks_per_key(ray.data.from_pandas(df), "k", ["v", "id"],
                      tie_cols=["id"])


def test_ranks_per_key_ntile_small_segments(ray_session):
    """m < ntile: every row its own tile 1..m (the base==0 branch)."""
    from zeeklog_ray.relational import ranks_per_key

    df = pd.DataFrame({"k": ["a", "a", "b"], "id": [1, 2, 3]})
    out = ranks_per_key(ray.data.from_pandas(df), "k", ["id"], ntile=4) \
        .to_pandas().sort_values("id")
    assert out["tile"].tolist() == [1, 2, 1]
    assert out["rnk"].tolist() == [1, 2, 1]


def test_mode_per_key(ray_session):
    """Mode merges partial counts across blocks; ties pick the smallest
    value; null values are countable like SQL GROUP BY (dropna=False)."""
    from zeeklog_ray.relational import mode_per_key

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 4 + ["c"] * 2,
        "v": ["x", "y", "x", "y", "x",      # a: x=3 > y=2
              "q", "p", "q", "p",           # b: tie 2-2 -> p
              None, None]})                 # c: mode is null, count 2
    # split so a's counts straddle blocks (forces the merge path)
    ds = ray.data.from_pandas([df.iloc[:3], df.iloc[3:]])
    out = mode_per_key(ds, "k", "v", num_buckets=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out["mode_v"].tolist()[:2] == ["x", "p"]
    assert out["mode_v"].isna().tolist() == [False, False, True]
    assert out["n_mode"].tolist() == [3, 2, 2]


def test_string_agg_per_key(ray_session):
    from zeeklog_ray.relational import string_agg_per_key

    df = pd.DataFrame({"k": ["u", "u", "u", "w"],
                       "ts": [3, 1, 2, 9],
                       "id": [30, 10, 20, 90],
                       "e": ["c", "a", "b", "z"]})
    out = string_agg_per_key(
        ray.data.from_pandas([df.iloc[:2], df.iloc[2:]]), "k", "e",
        ["ts", "id"], sep=">", out="j", num_buckets=4).to_pandas() \
        .sort_values("k")
    assert out["j"].tolist() == ["a>b>c", "z"]


def test_seq_index_null_keys_numbered(ray_session):
    from zeeklog_ray.relational import seq_index_per_key

    df = pd.DataFrame({"k": [1.0, None, None, 1.0],
                       "ts": [1, 2, 3, 4],
                       "id": [10, 20, 30, 40]})
    out = seq_index_per_key(ray.data.from_pandas(df), "k", ["ts", "id"]) \
        .to_pandas()
    # null keys form ONE partition numbered 1..n (SQL ROW_NUMBER), and
    # seq stays integral
    nulls = out[out["k"].isna()].sort_values("seq")
    assert nulls["seq"].tolist() == [1, 2]
    assert not out["seq"].isna().any()


def test_grouped_sum_bucketed_matches_pandas(ray_session):
    from zeeklog_ray.relational import grouped_sum_bucketed

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 500, 5000),
                       "v": rng.integers(-10, 100, 5000)})
    ds = ray.data.from_pandas([df.iloc[:2500], df.iloc[2500:]])
    got = grouped_sum_bucketed(ds, ["k"], sums={"v": "s"}, count_as="c") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = df.groupby("k")["v"].agg(["sum", "size"]).reset_index()
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["s"].tolist() == exp["sum"].tolist()
    assert got["c"].tolist() == exp["size"].tolist()


def test_melt_inverts_pivot(ray_session):
    from zeeklog_ray.relational import melt

    df = pd.DataFrame({"id": [1, 2], "a": [10, 30], "b": [20, 40]})
    out = melt(ray.data.from_pandas(df), ["id"], ["a", "b"]).to_pandas() \
        .sort_values(["id", "variable"]).reset_index(drop=True)
    assert len(out) == 4
    assert out["value"].tolist() == [10, 20, 30, 40]
    assert out["variable"].tolist() == ["a", "b", "a", "b"]


def test_partitioned_write_prune_roundtrip(ray_session, tmp_path):
    from zeeklog_ray.partitioned import read_partition, write_partitioned

    df = pd.DataFrame({"t": ["a", "b", "a", "c"] * 50,
                       "v": np.arange(200, dtype="int64")})
    root = str(tmp_path / "part")
    write_partitioned(ray.data.from_pandas(df), root, ["t"])
    back = read_partition(root, "t", "a").to_pandas()
    exp = df[df["t"] == "a"]
    assert len(back) == len(exp)
    assert sorted(back["v"]) == sorted(exp["v"])
    assert (back["t"] == "a").all()   # hive scheme restores the column


@pytest.mark.parametrize("nb", [1, 16])
def test_cap_per_key_matches_pandas_replay(ray_session, nb):
    from zeeklog_ray.relational import CAP_SALT, _mix64, cap_per_key

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.integers(0, 5, 300),
                       "id": np.arange(300, dtype=np.int64),
                       "v": rng.integers(0, 9, 300)})
    ds = ray.data.from_pandas([df.iloc[:100], df.iloc[100:]])  # multi-block
    out = cap_per_key(ds, "k", 4, "id", num_buckets=nb).to_pandas()

    h = _mix64(df["id"].to_numpy(np.uint64)
               + np.uint64(CAP_SALT % (1 << 64)))
    exp = df.assign(_h=h).sort_values(["_h", "id"]) \
        .groupby("k", sort=False).head(4)
    assert sorted(out["id"]) == sorted(exp["id"])
    assert (out.groupby("k").size() <= 4).all()
    assert list(out.columns) == ["k", "id", "v"]          # _h/_bucket gone


def test_cap_per_key_edges(ray_session):
    from zeeklog_ray.relational import cap_per_key

    df = pd.DataFrame({"k": ["a"] * 3 + ["b"],
                       "id": np.arange(4, dtype=np.int64)})
    ds = ray.data.from_pandas(df)
    # n >= every group size keeps all rows
    assert cap_per_key(ds, "k", 10, "id").count() == 4
    # under-n keys keep all their rows
    out = cap_per_key(ds, "k", 2, "id").to_pandas()
    assert (out["k"] == "b").sum() == 1
    with pytest.raises(ValueError):
        cap_per_key(ds, "k", 0, "id")
    with pytest.raises(Exception):      # float ids refused (TypeError in task)
        cap_per_key(ray.data.from_pandas(
            pd.DataFrame({"k": ["a"], "id": [1.5]})), "k", 1, "id").count()


def test_cap_per_key_partition_independent(ray_session):
    """Same winners regardless of block layout — the reproducibility
    contract a training-data cap needs."""
    from zeeklog_ray.relational import cap_per_key

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"k": rng.integers(0, 7, 200),
                       "id": rng.permutation(200).astype(np.int64)})
    one = cap_per_key(ray.data.from_pandas(df), "k", 3, "id").to_pandas()
    many = cap_per_key(ray.data.from_pandas(
        [df.iloc[i:i + 20] for i in range(0, 200, 20)]),
        "k", 3, "id").to_pandas()
    assert sorted(one["id"]) == sorted(many["id"])


def test_hash_join_map_produced_empty_side(ray_session):
    """Regression (raypatch patch A, empty-pandas conversion): a join side
    produced by a map stage that filtered out every row used to broadcast
    a NULL-typed schema shard — pyarrow then rejected the join key
    ('Data type null is not supported in join key field').  The patched
    shard conversion preserves numeric dtypes."""
    ev = ray.data.from_pandas(pd.DataFrame({"w1": [1], "w2": [9]}))
    empty = ev.map_batches(lambda df: df[df["w1"] < 0],
                           batch_format="pandas", batch_size=None)
    right = ray.data.from_pandas(pd.DataFrame({"src": [1, 2],
                                               "dst": [2, 3]}))
    j = empty.join(right, join_type="inner", num_partitions=4,
                   on=("w1", "w2"), right_on=("src", "dst"))
    assert j.count() == 0


def test_bucketed_equi_join(ray_session):
    """Single- and multi-key inner join via tagged union + bucket shuffle:
    matches pandas merge, preserves int64 exactness above 2^53 through
    the null-filled union, rejects column collisions."""
    import pytest

    from zeeklog_ray.relational import bucketed_equi_join

    big = 2**53 + 1
    left = pd.DataFrame({"k": [1, 2, 2, 3], "x": [big, 20, 30, 40]})
    right = pd.DataFrame({"node": [2, 3, 9], "y": [200, 300, 900]})
    out = bucketed_equi_join(ray.data.from_pandas(left).repartition(3),
                             ray.data.from_pandas(right),
                             on="k", right_on="node",
                             num_buckets=8).to_pandas()
    exp = left.merge(right.rename(columns={"node": "k"}), on="k")
    assert sorted(out["x"].tolist()) == sorted(exp["x"].tolist())
    assert out["x"].dtype == np.int64 and big not in out["x"].values

    # multi-key
    l2 = pd.DataFrame({"a": [1, 1, 2], "b": [5, 6, 5], "v": [10, 11, 12]})
    r2 = pd.DataFrame({"p": [1, 2, 2], "q": [5, 5, 7], "w": [100, 200, 300]})
    out2 = bucketed_equi_join(ray.data.from_pandas(l2),
                              ray.data.from_pandas(r2),
                              on=["a", "b"], right_on=["p", "q"],
                              num_buckets=4).to_pandas()
    assert sorted(zip(out2["v"], out2["w"])) == [(10, 100), (12, 200)]

    with pytest.raises(ValueError, match="collide"):
        bucketed_equi_join(ray.data.from_pandas(l2),
                           ray.data.from_pandas(l2), on="a")


def test_bucketed_equi_join_key_dtype_guards(ray_session):
    """Mismatched key dtypes would silently hash the same value into
    different buckets — the join must raise, not drop rows; int keys of
    different widths harmonize; reserved internal names are rejected."""
    import pytest

    from zeeklog_ray.relational import bucketed_equi_join

    fl = ray.data.from_pandas(pd.DataFrame({"k": [1.0, 2.0], "x": [1, 2]}))
    it = ray.data.from_pandas(pd.DataFrame({"node": [1, 2], "y": [10, 20]}))
    with pytest.raises(ValueError, match="hash to different buckets"):
        bucketed_equi_join(fl, it, on="k", right_on="node").to_pandas()

    # int32 vs int64 keys harmonize to the wider dtype and still match
    l32 = pd.DataFrame({"k": np.array([1, 2], dtype="int32"),
                        "x": [10, 20]})
    out = bucketed_equi_join(ray.data.from_pandas(l32), it,
                             on="k", right_on="node",
                             num_buckets=4).to_pandas()
    assert sorted(zip(out["x"], out["y"])) == [(10, 10), (20, 20)]

    bad = ray.data.from_pandas(pd.DataFrame({"k": [1], "_side": ["z"]}))
    with pytest.raises(ValueError, match="reserved"):
        bucketed_equi_join(bad, it, on="k", right_on="node")
    with pytest.raises(ValueError, match="not present"):
        bucketed_equi_join(fl, it, on="nope", right_on="node")


def test_user_retention_cohorts_handmade(ray_session):
    """Three users across two cohort weeks with returns and a gap week:
    counts match the hand computation (distinct users, not events)."""
    from zeeklog_ray.queries import user_retention_cohorts

    base = pd.Timestamp("2024-01-01")   # epoch day 19723 -> week 2817
    rows = [
        # u1: cohort week W, active W and W+2 (twice -> still 1 user)
        (1, base), (1, base + pd.Timedelta(days=14)),
        (1, base + pd.Timedelta(days=15)),
        # u2: cohort week W, only W
        (2, base + pd.Timedelta(days=1)),
        # u3: cohort week W+1, active W+1 and W+2
        (3, base + pd.Timedelta(days=7)),
        (3, base + pd.Timedelta(days=14)),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.to_parquet(f"{td}/events.parquet")
        out = user_retention_cohorts(td).to_pandas() \
            .set_index(["cohort_week", "week_offset"])["n_users"]
    w = int(pd.Timestamp("2024-01-01").to_datetime64()
            .astype("datetime64[D]").astype("int64")) // 7
    assert out.loc[(w, 0)] == 2          # u1, u2
    assert out.loc[(w, 2)] == 1          # u1 (two events, one user)
    assert out.loc[(w + 1, 0)] == 1      # u3
    assert out.loc[(w + 1, 1)] == 1      # u3 return
    assert (w, 1) not in out.index       # gap week absent


def test_key_skew_profile(ray_session):
    import pytest

    from zeeklog_ray.relational import key_skew_profile

    df = pd.DataFrame({"k": ["a"] * 6 + ["b"] * 3 + ["c"] * 1})
    out = key_skew_profile(ray.data.from_pandas(df).repartition(3), "k",
                           num_buckets=4)
    assert out["n_rows"].iloc[0] == 10
    assert out["n_keys"].iloc[0] == 3
    assert out["max_key_rows"].iloc[0] == 6
    assert out["max_share_ppm"].iloc[0] == 600_000
    # counts sorted [1, 3, 6]: p50 -> ceil(0.5*3)-1 = idx 1 -> 3; p99 -> 6
    assert out["p50_key_rows"].iloc[0] == 3
    assert out["p99_key_rows"].iloc[0] == 6

    with pytest.raises(ValueError, match="empty input"):
        key_skew_profile(
            ray.data.from_pandas(df).filter(lambda r: False), "k")


def test_global_rank_matches_pandas(ray_session):
    """Range-partitioned global ROW_NUMBER equals the pandas reference,
    including heavy ties across sampled boundaries; nulls rejected."""
    import pytest

    from zeeklog_ray.relational import global_rank

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"id": np.arange(5000, dtype="int64"),
                       "v": rng.integers(0, 50, 5000)})   # heavy ties
    out = global_rank(ray.data.from_pandas(df).repartition(8),
                      by="v", tie="id", num_buckets=16).to_pandas()
    exp = df.sort_values(["v", "id"]).reset_index(drop=True)
    exp["rank"] = np.arange(1, len(exp) + 1)
    got = out.sort_values("rank").reset_index(drop=True)
    assert got["id"].tolist() == exp["id"].tolist()
    assert got["rank"].tolist() == exp["rank"].tolist()

    bad = pd.DataFrame({"id": [1, 2], "v": pd.array([1, None],
                                                    dtype="Int64")})
    with pytest.raises(Exception, match="null values in sort key"):
        global_rank(ray.data.from_pandas(bad), by="v",
                    tie="id").to_pandas()


def test_retention_cohorts_null_users_dropped(ray_session):
    """Null user ids match nothing (the SQL replay's inner join): they
    contribute no cohort rows and the week columns stay integer."""
    from zeeklog_ray.relational import retention_cohorts

    df = pd.DataFrame({
        "user_id": pd.array([1, 1, None], dtype="Int64"),
        "ts": pd.to_datetime(["2024-01-01", "2024-01-08", "2024-01-01"])})
    out = retention_cohorts(ray.data.from_pandas(df)).to_pandas()
    assert int(out["n_users"].sum()) == 2          # u1's two weeks only
    assert str(out["cohort_week"].dtype) in ("int64", "Int64")


def test_docs_dup_rate_by_source_planted(ray_session):
    """Planted duplicates: rates match the hand computation."""
    import tempfile

    from zeeklog_ray.queries import docs_dup_rate_by_source

    df = pd.DataFrame({
        "source": ["a"] * 4 + ["b"] * 2,
        "text": ["x", "x", "x", "y", "z", "w"],
    })
    with tempfile.TemporaryDirectory() as td:
        df.to_parquet(f"{td}/documents.parquet")
        out = docs_dup_rate_by_source(td).to_pandas().set_index("source")
    assert out.loc["a", "n_docs"] == 4 and out.loc["a", "n_distinct"] == 2
    assert out.loc["a", "dup_rate_ppm"] == 500_000    # 2 of 4 are dups
    assert out.loc["b", "dup_rate_ppm"] == 0


def test_bucketed_semi_anti_join():
    from zeeklog_ray.relational import bucketed_semi_anti_join

    l = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3, 3, None, 5], "x": [10, 20, 30, 31, 40, 50]}))
    # right has dup keys and an irrelevant payload column — neither may
    # fan out or leak into the output
    r = ray.data.from_pandas(pd.DataFrame(
        {"kk": [2, 3, 3, 7, None], "y": ["a", "b", "c", "d", "e"]}))
    semi = bucketed_semi_anti_join(l, r, on="k", right_on="kk",
                                   num_buckets=4).to_pandas()
    assert sorted(semi["x"]) == [20, 30, 31]
    assert list(semi.columns) == ["k", "x"]
    anti = bucketed_semi_anti_join(l, r, on="k", right_on="kk", anti=True,
                                   num_buckets=4).to_pandas()
    # NOT-EXISTS semantics: the null-key left row survives the anti join
    assert sorted(anti["x"]) == [10, 40, 50]


def test_bucketed_semi_anti_join_multicol_and_dtype_guard():
    from zeeklog_ray.relational import bucketed_semi_anti_join

    l = ray.data.from_pandas(pd.DataFrame(
        {"a": [1, 1, 2], "b": ["x", "y", "x"], "v": [1, 2, 3]}))
    r = ray.data.from_pandas(pd.DataFrame({"a": [1, 2], "b": ["y", "z"]}))
    semi = bucketed_semi_anti_join(l, r, on=["a", "b"],
                                   num_buckets=2).to_pandas()
    assert semi["v"].tolist() == [2]
    bad = ray.data.from_pandas(pd.DataFrame({"a": [1.0], "b": ["y"]}))
    with pytest.raises(ValueError, match="integer on one side"):
        bucketed_semi_anti_join(l, bad, on=["a", "b"])
