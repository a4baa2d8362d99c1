"""Two-phase aggregation vs pandas oracle."""

import numpy as np
import pandas as pd
import pytest

from zeeklog_ray.aggregate import HIST_COLUMNS, HIST_EDGES, distinct_column, grouped_stats
from zeeklog_ray.pipeline import PipelineConfig, build_dataset
from zeeklog_ray.sources import CONN_PREFIXED, SOURCE_FIELDS


@pytest.fixture(scope="module")
def parsed(corpus_dir):
    return build_dataset(PipelineConfig(corpus_dir=corpus_dir))


def test_grouped_stats_matches_pandas(parsed, corpus_frame):
    got = grouped_stats(parsed, key="sink").to_pandas().set_index("sink").sort_index()

    df = corpus_frame.copy()
    df["sink"] = df["source"].where(df["source"].isin(SOURCE_FIELDS), "none")
    exp = df.groupby("sink")["n_tok"].agg(n="count", sum_n_tok="sum",
                                          min_n_tok="min", max_n_tok="max")
    assert got["n"].to_dict() == exp["n"].to_dict()
    assert got["sum_n_tok"].to_dict() == exp["sum_n_tok"].to_dict()
    assert got["min_n_tok"].to_dict() == exp["min_n_tok"].to_dict()
    assert got["max_n_tok"].to_dict() == exp["max_n_tok"].to_dict()

    bucket = np.digitize(df["n_tok"], HIST_EDGES[1:])
    hist = pd.crosstab(df["sink"], bucket).reindex(
        columns=range(len(HIST_COLUMNS)), fill_value=0)
    hist.columns = HIST_COLUMNS
    for c in HIST_COLUMNS:
        assert got[c].to_dict() == hist[c].to_dict(), c
    # histogram buckets partition the rows exactly
    assert got[HIST_COLUMNS].sum(axis=1).to_dict() == got["n"].to_dict()


def test_distinct_column(parsed, corpus_frame):
    got = set(distinct_column(parsed, "id_orig_h").to_pandas()["id_orig_h"])
    # only connection-prefixed sources carry id_orig_h (ts-prefixed
    # host/file logs have it null, and nulls are dropped)
    df = corpus_frame[corpus_frame["source"].isin(CONN_PREFIXED)]
    exp = set(df["tokens"].map(lambda b: b.decode().split("\t")[2]).unique())
    assert got == exp


def test_distinct_column_by_key(parsed, corpus_frame):
    got = distinct_column(parsed, "id_orig_h", by=["sink"]).to_pandas()
    df = corpus_frame[corpus_frame["source"].isin(CONN_PREFIXED)].copy()
    df["ip"] = df["tokens"].map(lambda b: b.decode().split("\t")[2])
    exp = df.groupby("source")["ip"].nunique()
    gotn = got.groupby("sink")["id_orig_h"].nunique()
    assert gotn.to_dict() == exp.to_dict()
