"""ORC sink/source (zeeklog_ray/jsonio.py): exact type-preserving
round-trip, per-file parallel read, atomicity leftovers."""
import os

import numpy as np
import pandas as pd
import pytest


def test_orc_roundtrip_exact_types(ray_session, tmp_path):
    import ray.data

    from zeeklog_ray.jsonio import read_orc, write_orc

    df = pd.DataFrame({
        "i": np.arange(100, dtype="int64"),
        "ts": pd.date_range("2024-06-01", periods=100, freq="37min"),
        "s": [f"v{i}" for i in range(100)],
        "f": np.linspace(0, 1, 100),
    })
    out = str(tmp_path / "orc")
    n = write_orc(ray.data.from_pandas(df).repartition(7), out)
    assert n == 100
    files = [f for f in os.listdir(out) if f.endswith(".orc")]
    assert len(files) >= 2              # one file per non-empty block
    assert not any(f.endswith(".tmp") for f in os.listdir(out))
    back = read_orc(out).to_pandas().sort_values("i").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[df.columns.tolist()], df)


def test_orc_list_column_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from zeeklog_ray.jsonio import read_orc, write_orc

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "tokens": pa.array([[1, 2], [], [3, 4, 5]],
                           pa.list_(pa.int32())),
    })
    out = str(tmp_path / "orc")
    assert write_orc(ray.data.from_arrow(t), out) == 3
    back = read_orc(out).to_pandas().sort_values("doc_id")
    assert [list(x) for x in back["tokens"]] == [[1, 2], [], [3, 4, 5]]


def test_read_orc_missing_dir_raises(ray_session, tmp_path):
    from zeeklog_ray.jsonio import read_orc

    empty = str(tmp_path / "nothing")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no .orc files"):
        read_orc(empty)


def test_feather_roundtrip_exact_types(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from zeeklog_ray.jsonio import read_feather, write_feather

    df = pd.DataFrame({
        "i": np.arange(50, dtype="int64"),
        "ts": pd.date_range("2024-06-01", periods=50, freq="11min"),
        "s": [f"v{i}" for i in range(50)],
    })
    out = str(tmp_path / "fea")
    assert write_feather(ray.data.from_pandas(df).repartition(4), out) == 50
    back = read_feather(out).to_pandas().sort_values("i") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(back[df.columns.tolist()], df)
    assert not any(f.endswith(".tmp") for f in os.listdir(out))

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "tokens": pa.array([[7], [8, 9]], pa.list_(pa.int32()))})
    out2 = str(tmp_path / "fea2")
    assert write_feather(ray.data.from_arrow(t), out2) == 2
    back2 = read_feather(out2).to_pandas().sort_values("doc_id")
    assert [list(x) for x in back2["tokens"]] == [[7], [8, 9]]
