"""pack_token_rows / iter_token_batches: the trainer-side loader."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from zeeklog_ray.loader import iter_token_batches, pack_token_rows

CL = 16


def _corpus(n_docs: int = 40, seed: int = 9) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        n = int(rng.integers(1, 3 * CL))        # docs up to 3 packs long
        rows.append({
            "doc_id": f"d{i:04d}",
            "tokens": rng.integers(1, 1000, n).astype(np.int32),
            "n_tok": n,
            "source": ["conn", "dns", "http"][i % 3],
            "date": f"2024-07-{(i % 2) + 1:02d}"})
    return pd.DataFrame(rows)


def _truth_streams(df: pd.DataFrame) -> dict:
    """Per-source gap-free token stream in (date, doc_id) order — what
    the packed rows must reproduce when concatenated by pack_id."""
    out = {}
    for src, g in df.groupby("source"):
        g = g.sort_values(["date", "doc_id"], kind="mergesort")
        out[src] = np.concatenate(g["tokens"].to_numpy())
    return out


def test_pack_token_rows_reconstructs_streams(ray_session):
    df = _corpus()
    truth = _truth_streams(df)
    for nparts in (1, 4):
        packed = pack_token_rows(
            ray.data.from_pandas(df).repartition(nparts),
            context_len=CL, pad_id=0, num_buckets=8).to_pandas()
        for src, stream in truth.items():
            p = packed[packed["source"] == src] \
                .sort_values("pack_id").reset_index(drop=True)
            # pack ids are dense from 0
            assert p["pack_id"].tolist() == list(range(len(p)))
            # every row exactly context_len wide
            assert all(len(r) == CL for r in p["input_ids"])
            got = np.concatenate(
                [np.asarray(r)[:n] for r, n in
                 zip(p["input_ids"], p["n_real"])])
            np.testing.assert_array_equal(got, stream)  # token-exact
            # padding only in the final pack, and only pad_id there
            assert (p["n_real"].iloc[:-1] == CL).all()
            tail = np.asarray(p["input_ids"].iloc[-1])
            assert (tail[p["n_real"].iloc[-1]:] == 0).all()


def test_pack_hash_matches_reference(ray_session):
    df = _corpus(n_docs=12, seed=4)
    packed = pack_token_rows(ray.data.from_pandas(df), context_len=CL,
                             num_buckets=4).to_pandas()

    def horner(ts):
        h = 0
        for t in ts:
            h = (h * 1000003 + int(t)) % (1 << 64)
        return h - (1 << 64) if h >= (1 << 63) else h

    for _, r in packed.iterrows():
        real = np.asarray(r["input_ids"])[:r["n_real"]]
        assert horner(real) == r["pack_hash"]


def test_iter_token_batches_shapes_and_content(ray_session):
    df = _corpus(n_docs=30, seed=7)
    packed = pack_token_rows(ray.data.from_pandas(df), context_len=CL,
                             num_buckets=4)
    n_packs = packed.count()
    mats = list(iter_token_batches(packed, micro_batch=4))
    assert sum(m.shape[0] for m in mats) == n_packs
    assert all(m.shape[1] == CL and m.dtype == np.int32 for m in mats)
    # multiset of rows matches the packed table regardless of order
    packed_rows = {tuple(np.asarray(r))
                   for r in packed.to_pandas()["input_ids"]}
    iter_rows = {tuple(row) for m in mats for row in m}
    assert iter_rows == packed_rows

    with pytest.raises(NotImplementedError):
        next(iter_token_batches(packed, micro_batch=4, to_torch=True))


def test_iter_token_batches_sharding(ray_session):
    """shard=(i, n): disjoint, exhaustive, deterministic worker slices."""
    df = _corpus(n_docs=24, seed=2)
    packed = pack_token_rows(ray.data.from_pandas(df), context_len=CL,
                             num_buckets=4)
    all_rows = {tuple(np.asarray(r))
                for r in packed.to_pandas()["input_ids"]}
    shards = []
    for i in range(3):
        rows = {tuple(row)
                for m in iter_token_batches(packed, micro_batch=4,
                                            shard=(i, 3))
                for row in m}
        shards.append(rows)
    assert set().union(*shards) == all_rows          # exhaustive
    assert sum(len(s) for s in shards) == len(all_rows)  # disjoint
    # re-derived slice is identical (resume contract)
    again = {tuple(row)
             for m in iter_token_batches(packed, micro_batch=4,
                                         shard=(1, 3)) for row in m}
    assert again == shards[1]
    with pytest.raises(ValueError):
        next(iter_token_batches(packed, micro_batch=4, shard=(3, 3)))
