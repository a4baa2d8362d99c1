"""Sessionization + as-of join vs hand-computed expectations."""

import pandas as pd
import ray.data

from zeeklog_ray.ops.sessionize import asof_join, session_counts, sessionize


def _events():
    rows = [
        ("u1", "2024-01-01 10:00"), ("u1", "2024-01-01 10:10"),
        ("u1", "2024-01-01 11:00"),                      # 50-min gap → new session
        ("u2", "2024-01-01 09:00"),
        ("u2", "2024-01-02 09:00"),                      # next day → new session
        ("u2", "2024-01-02 09:05"),
    ]
    return pd.DataFrame({"user_id": [r[0] for r in rows],
                         "ts": pd.to_datetime([r[1] for r in rows])})


def test_sessionize(ray_session):
    out = sessionize(ray.data.from_pandas(_events()), gap_minutes=30).to_pandas()
    u1 = out[out["user_id"] == "u1"].sort_values("session_id")
    assert u1["n_events"].tolist() == [2, 1]
    u2 = out[out["user_id"] == "u2"].sort_values("session_id")
    assert u2["n_events"].tolist() == [1, 2]


def test_session_counts(ray_session):
    out = session_counts(ray.data.from_pandas(_events()),
                         gap_minutes=30).to_pandas().set_index("user_id")
    assert out.loc["u1", "n_sessions"] == 2 and out.loc["u1", "n_events"] == 3
    assert out.loc["u2", "n_sessions"] == 2 and out.loc["u2", "n_events"] == 3


def test_asof_join(ray_session):
    left = pd.DataFrame({"user_id": ["a", "a", "b"],
                         "ts": pd.to_datetime(["2024-01-01 10:00",
                                               "2024-01-01 12:00",
                                               "2024-01-01 10:00"]),
                         "event_id": [1, 2, 3]})
    right = pd.DataFrame({"user_id": ["a", "a", "b"],
                          "ts": pd.to_datetime(["2024-01-01 09:00",
                                                "2024-01-01 11:00",
                                                "2024-01-01 11:00"]),
                          "val": [10, 20, 30]})
    out = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    key="user_id", ts="ts", right_cols=["val"]).to_pandas()
    got = out.set_index("event_id")["val"]
    assert got.loc[1] == 10          # latest right ≤ 10:00 is 09:00 → 10
    assert got.loc[2] == 20          # latest right ≤ 12:00 is 11:00 → 20
    assert pd.isna(got.loc[3])       # b has no right row ≤ 10:00
