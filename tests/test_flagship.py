"""Fused file-granular flagship == composable pipeline results."""

import glob
import os

import numpy as np
import pandas as pd
import ray.data

from zeeklog_ray.aggregate import HIST_COLUMNS, grouped_stats
from zeeklog_ray.flagship import run_flagship
from zeeklog_ray.pipeline import PipelineConfig, build_dataset


def test_flagship_matches_composable(corpus_dir, tmp_path):
    out = str(tmp_path / "routed")
    cfg = PipelineConfig(corpus_dir=corpus_dir, enrich=True)
    fused = run_flagship(cfg, out).set_index("sink").sort_index()
    comp = grouped_stats(build_dataset(cfg), key="sink").to_pandas() \
        .set_index("sink").sort_index()
    for c in ["n", "sum_n_tok", "min_n_tok", "max_n_tok"] + HIST_COLUMNS:
        assert fused[c].to_dict() == comp[c].to_dict(), c


def test_flagship_output_layout_and_tokens(corpus_dir, corpus_frame, tmp_path):
    out = str(tmp_path / "routed")
    run_flagship(PipelineConfig(corpus_dir=corpus_dir, enrich=True), out)
    sinks = {os.path.basename(d).removeprefix("sink=")
             for d in glob.glob(os.path.join(out, "sink=*"))}
    assert sinks == {"conn", "dns", "http", "weird", "none"}
    back = ray.data.read_parquet(out).to_pandas()
    assert set(back["doc_id"]) == set(corpus_frame["doc_id"])
    # exact token-array equality per doc_id through the fused path
    exp = dict(zip(corpus_frame["doc_id"], corpus_frame["tokens"]))
    sample = back.sample(200, random_state=1)
    for d, tok in zip(sample["doc_id"], sample["tokens"]):
        assert bytes(np.asarray(tok, dtype=np.uint8).tobytes()) == exp[d]
    # enrichment columns present in routed output
    assert "geo_country_code" in back.columns and "service_name" in back.columns


def test_flagship_ip_filter(corpus_dir):
    import tempfile

    from zeeklog_ray.corpus import GOLDEN_IP_0702_ONLY

    with tempfile.TemporaryDirectory() as out:
        cfg = PipelineConfig(corpus_dir=corpus_dir, start_date="2024-07-03",
                             src_ip=GOLDEN_IP_0702_ONLY, enrich=False)
        stats = run_flagship(cfg, out)
        assert len(stats) == 0 or stats["n"].sum() == 0
