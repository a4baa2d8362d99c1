"""Merge-on-read delta log: append economics, merge semantics
(latest-wins, sequence tie-break, tombstones), base invisibility,
fold-down compaction and crash recovery
(zeeklog_ray/partitioned.py append_deltas/read_merged/compact_deltas)."""
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture
def base_store(ray_session, tmp_path):
    import ray.data

    from zeeklog_ray.partitioned import write_partitioned

    df = pd.DataFrame({
        "k": range(60),
        "day": [f"2024-06-{1 + i % 3:02d}" for i in range(60)],
        "v": [i * 2 for i in range(60)],
        "ver": 0,
    })
    root = str(tmp_path / "store")
    write_partitioned(ray.data.from_pandas(df).repartition(3),
                      root, ["day"])
    return root, df


def _merged(root):
    from zeeklog_ray.partitioned import read_merged

    got = read_merged(root, key="k", order_col="ver",
                      deleted_col="deleted").to_pandas()
    return got.sort_values("k").reset_index(drop=True)


def test_delta_append_merge_and_base_invisibility(base_store, ray_session):
    import ray.data

    from zeeklog_ray.partitioned import append_deltas

    root, base = base_store
    # batch 1: update k%10==0 (ver 1), insert k=900
    b1 = pd.DataFrame({
        "k": [0, 10, 20, 30, 40, 50, 900],
        "day": [f"2024-06-{1 + k % 3:02d}" for k in
                [0, 10, 20, 30, 40, 50]] + ["2024-06-01"],
        "v": [111] * 6 + [9], "ver": 1, "deleted": False})
    rep1 = append_deltas(root, ray.data.from_pandas(b1), part_col="day")
    assert (rep1["seq"] == 1).all() and rep1["rows"].sum() == 7
    # batch 2: SAME ver ties on k=0 and 30 (must win by sequence),
    # tombstone k=7
    b2 = pd.DataFrame({
        "k": [0, 30, 7],
        "day": ["2024-06-01", "2024-06-01", "2024-06-02"],
        "v": [222, 222, 0], "ver": [1, 1, 2],
        "deleted": [False, False, True]})
    rep2 = append_deltas(root, ray.data.from_pandas(b2), part_col="day")
    assert (rep2["seq"] == 2).all()

    got = _merged(root)
    assert 7 not in set(got["k"])                    # tombstoned
    assert got.set_index("k").loc[0, "v"] == 222     # seq tie-break
    assert got.set_index("k").loc[30, "v"] == 222
    assert got.set_index("k").loc[10, "v"] == 111    # batch-1 update
    assert got.set_index("k").loc[900, "v"] == 9     # insert
    assert got.set_index("k").loc[1, "v"] == 2       # untouched base row
    assert len(got) == 60 - 1 + 1
    # partition column re-attached from the directory name
    assert (got.loc[got["k"] == 900, "day"] == "2024-06-01").all()

    # deltas are INVISIBLE to plain parquet readers: base unchanged
    plain = ray.data.read_parquet(root).to_pandas()
    assert len(plain) == 60 and 900 not in set(plain["k"])
    assert (plain.sort_values("k")["v"].to_numpy()
            == base.sort_values("k")["v"].to_numpy()).all()


def test_compact_deltas_folds_and_is_idempotent(base_store, ray_session):
    import ray.data

    from zeeklog_ray.partitioned import append_deltas, compact_deltas

    root, base = base_store
    b1 = pd.DataFrame({"k": [0, 5], "day": ["2024-06-01", "2024-06-03"],
                       "v": [77, 0], "ver": [1, 1],
                       "deleted": [False, True]})
    append_deltas(root, ray.data.from_pandas(b1), part_col="day")
    before = _merged(root)
    rep = compact_deltas(root, key="k", order_col="ver",
                         deleted_col="deleted")
    assert rep["deltas_folded"].sum() == 2            # 2 touched dirs
    # after folding the PLAIN read equals the merged view
    plain = ray.data.read_parquet(root).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    plain["day"] = plain["day"].astype(str)
    cols = ["k", "day", "v", "ver"]
    pd.testing.assert_frame_equal(
        plain[cols].astype({"v": "int64"}),
        before[cols].astype({"v": "int64"}))
    # no pending deltas remain; second fold is metadata-only
    rep2 = compact_deltas(root, key="k", order_col="ver",
                          deleted_col="deleted")
    assert rep2["deltas_folded"].sum() == 0
    assert rep2["rows"].sum() == len(before)


def test_compact_deltas_crash_recovery(tmp_path):
    """Torn journal → rollback keeps base+deltas and the merge view is
    unchanged; committed journal → roll forward swaps base AND removes
    the folded delta files."""
    from zeeklog_ray.partitioned import _merged_partition_table

    d = str(tmp_path / "day=d")
    os.makedirs(os.path.join(d, "_deltas"))
    pq.write_table(pa.table({"k": [1, 2], "v": [10, 20], "ver": [0, 0]}),
                   os.path.join(d, "a.parquet"))
    pq.write_table(pa.table({"k": [1], "v": [99], "ver": [1]}),
                   os.path.join(d, "_deltas", "delta-000001-0000.parquet"))
    merged = pa.table({"k": [2, 1], "v": [20, 99], "ver": [0, 1]})
    pq.write_table(merged, os.path.join(d, "fold-dead.parquet.tmp"))
    with open(os.path.join(d, "_compaction.journal"), "w") as f:
        f.write('{"olds": ["a.par')                   # torn mid-write
    got = _merged_partition_table(d, "k", "ver", None)
    assert got.set_index("k")["v"].to_dict() == {1: 99, 2: 20}
    assert os.path.exists(os.path.join(d, "a.parquet"))

    # now a COMMITTED journal: roll-forward must land the fold
    pq.write_table(merged, os.path.join(d, "fold-dead.parquet.tmp"))
    with open(os.path.join(d, "_compaction.journal"), "w") as f:
        json.dump({"olds": ["a.parquet",
                            "_deltas/delta-000001-0000.parquet"],
                   "news": ["fold-dead.parquet"]}, f)
    from zeeklog_ray.partitioned import _recover_compaction

    _recover_compaction(d)
    assert sorted(f for f in os.listdir(d) if f.endswith(".parquet")) \
        == ["fold-dead.parquet"]
    assert os.listdir(os.path.join(d, "_deltas")) == []
    got = _merged_partition_table(d, "k", "ver", None)
    assert got.set_index("k")["v"].to_dict() == {1: 99, 2: 20}


def test_leftover_delta_reapplication_is_idempotent(tmp_path):
    """A delta that survived its own fold (crash window between base
    swap and delta delete in an EXTERNAL copy of the protocol) must not
    change the merged view when re-applied."""
    from zeeklog_ray.partitioned import _merged_partition_table

    d = str(tmp_path / "day=d")
    os.makedirs(os.path.join(d, "_deltas"))
    # base ALREADY contains the folded result
    pq.write_table(pa.table({"k": [1, 2], "v": [99, 20], "ver": [1, 0]}),
                   os.path.join(d, "base.parquet"))
    pq.write_table(pa.table({"k": [1], "v": [99], "ver": [1]}),
                   os.path.join(d, "_deltas", "delta-000001-0000.parquet"))
    got = _merged_partition_table(d, "k", "ver", None)
    assert got.set_index("k")["v"].to_dict() == {1: 99, 2: 20}
