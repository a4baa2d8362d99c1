"""Partitioned-store CDC upsert: latest-wins merge, tombstones,
tie-breaks, untouched-partition economics, journal crash recovery
(zeeklog_ray/partitioned.py upsert_partition_dir / upsert_partitions)."""
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _read_all(root):
    import ray.data

    return ray.data.read_parquet(root).to_pandas() \
        .sort_values("k").reset_index(drop=True)


@pytest.fixture
def base_store(ray_session, tmp_path):
    import ray.data

    from zeeklog_ray.partitioned import write_partitioned

    df = pd.DataFrame({
        "k": range(100),
        "day": [f"2024-06-{1 + i % 4:02d}" for i in range(100)],
        "v": [i * 3 for i in range(100)],
        "ver": 0,
    })
    root = str(tmp_path / "store")
    write_partitioned(ray.data.from_pandas(df).repartition(4),
                      root, ["day"])
    return root, df


def test_upsert_insert_update_delete(base_store, ray_session):
    import ray.data

    from zeeklog_ray.partitioned import upsert_partitions

    root, base = base_store
    # updates (k % 10 == 0), deletes (k % 7 == 0, precedence), inserts
    changes = pd.DataFrame({
        "k": [0, 10, 20, 7, 14, 1000, 1001],
        "day": ["2024-06-01", "2024-06-03", "2024-06-01",
                "2024-06-04", "2024-06-03", "2024-06-01", "2024-06-02"],
        "v": [9999, 9999, 9999, 0, 0, 5, 6],
        "ver": 1,
        "deleted": [False, False, False, True, True, False, False],
    })
    rep = upsert_partitions(root, ray.data.from_pandas(changes),
                            part_col="day", key="k", order_col="ver",
                            deleted_col="deleted")
    got = _read_all(root)

    expect = base[~base["k"].isin([7, 14])].copy()
    expect.loc[expect["k"].isin([0, 10, 20]), "v"] = 9999
    expect.loc[expect["k"].isin([0, 10, 20]), "ver"] = 1
    inserts = pd.DataFrame({"k": [1000, 1001],
                            "day": ["2024-06-01", "2024-06-02"],
                            "v": [5, 6], "ver": 1})
    expect = pd.concat([expect, inserts], ignore_index=True) \
        .sort_values("k").reset_index(drop=True)
    got["day"] = got["day"].astype(str)
    pd.testing.assert_frame_equal(
        got.reindex(columns=["k", "day", "v", "ver"]).astype(
            {"k": "int64", "v": "int64", "ver": "int64"}),
        expect.astype({"k": "int64", "v": "int64", "ver": "int64"}))
    assert rep["deleted"].sum() == 2
    assert rep["changes"].sum() == 7


def test_upsert_latest_wins_and_tie_favors_change(ray_session, tmp_path):
    import ray.data

    from zeeklog_ray.partitioned import upsert_partitions, write_partitioned

    root = str(tmp_path / "store")
    base = pd.DataFrame({"k": [1, 2], "day": ["d", "d"],
                         "v": [10, 20], "ver": [5, 5]})
    write_partitioned(ray.data.from_pandas(base), root, ["day"])
    # k=1: change has LOWER ver -> existing row wins (latest-wins)
    # k=2: change TIES on ver   -> change wins (tie favors change)
    changes = pd.DataFrame({"k": [1, 2], "day": ["d", "d"],
                            "v": [111, 222], "ver": [4, 5]})
    upsert_partitions(root, ray.data.from_pandas(changes),
                      part_col="day", key="k", order_col="ver")
    got = _read_all(root)
    assert got.set_index("k")["v"].to_dict() == {1: 10, 2: 222}


def test_upsert_touches_only_changed_partitions(base_store, ray_session):
    import ray.data

    from zeeklog_ray.partitioned import upsert_partitions

    root, base = base_store
    before = {d: sorted(os.listdir(os.path.join(root, d)))
              for d in os.listdir(root) if d.startswith("day=")}
    changes = pd.DataFrame({"k": [0], "day": ["2024-06-01"],
                            "v": [1], "ver": [1]})
    rep = upsert_partitions(root, ray.data.from_pandas(changes),
                            part_col="day", key="k", order_col="ver")
    assert len(rep) == 1 and rep["dir"].iloc[0].endswith("day=2024-06-01")
    after = {d: sorted(os.listdir(os.path.join(root, d)))
             for d in os.listdir(root) if d.startswith("day=")}
    # untouched partitions keep their exact file sets
    for d in before:
        if d != "day=2024-06-01":
            assert after[d] == before[d]
    assert after["day=2024-06-01"] != before["day=2024-06-01"]
    # no staging leftovers at the root
    assert not [d for d in os.listdir(root) if d.startswith("_upsert")]


def test_upsert_creates_new_partition(base_store, ray_session):
    import ray.data

    from zeeklog_ray.partitioned import upsert_partitions

    root, base = base_store
    changes = pd.DataFrame({"k": [5000], "day": ["2024-07-01"],
                            "v": [1], "ver": [1]})
    upsert_partitions(root, ray.data.from_pandas(changes),
                      part_col="day", key="k", order_col="ver")
    got = _read_all(root)
    assert len(got) == len(base) + 1
    assert (got.loc[got["k"] == 5000, "day"].astype(str)
            == "2024-07-01").all()


def test_upsert_journal_roll_forward(tmp_path):
    """A crash AFTER the journal commit point must roll forward on the
    next upsert: the merged file replaces the olds exactly once."""
    from zeeklog_ray.partitioned import upsert_partition_dir

    d = str(tmp_path / "day=d")
    stage = str(tmp_path / "stage")
    os.makedirs(d)
    os.makedirs(stage)
    pq.write_table(pa.table({"k": [1, 2], "v": [10, 20], "ver": [0, 0]}),
                   os.path.join(d, "a.parquet"))
    merged = pa.table({"k": [1, 2], "v": [99, 20], "ver": [1, 0]})
    pq.write_table(merged, os.path.join(d, "upsert-dead.parquet.tmp"))
    with open(os.path.join(d, "_compaction.journal"), "w") as f:
        json.dump({"olds": ["a.parquet"],
                   "news": ["upsert-dead.parquet"]}, f)
    # empty change batch: the call recovers, then reports the store as-is
    rep = upsert_partition_dir(d, stage, key="k", order_col="ver")
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    assert files == ["upsert-dead.parquet"]
    assert pq.read_table(os.path.join(d, files[0])).equals(merged)
    assert rep["changes"] == 0 and rep["rows_after"] == 2


def test_upsert_torn_journal_rolls_back(tmp_path):
    """A torn journal (crash before the fsync'd commit) must drop tmps,
    keep the originals, and let the upsert proceed cleanly."""
    from zeeklog_ray.partitioned import upsert_partition_dir

    d = str(tmp_path / "day=d")
    stage = str(tmp_path / "stage")
    os.makedirs(d)
    os.makedirs(stage)
    pq.write_table(pa.table({"k": [1], "v": [10], "ver": [0]}),
                   os.path.join(d, "a.parquet"))
    pq.write_table(pa.table({"k": [1], "v": [666], "ver": [9]}),
                   os.path.join(d, "upsert-dead.parquet.tmp"))
    with open(os.path.join(d, "_compaction.journal"), "w") as f:
        f.write('{"olds": ["a.par')  # torn mid-write
    pq.write_table(pa.table({"k": [1], "v": [77], "ver": [1]}),
                   os.path.join(stage, "c.parquet"))
    upsert_partition_dir(d, stage, key="k", order_col="ver")
    got = pq.read_table(
        os.path.join(d, [f for f in os.listdir(d)
                         if f.endswith(".parquet")][0])).to_pandas()
    assert got["v"].tolist() == [77]   # change applied to the ORIGINAL
