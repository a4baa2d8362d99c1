"""Checkpoint / lineage / resume: interrupted run re-emits no rows."""

import glob
import json
import os

import pytest

from zeeklog_ray.lineage import ResumableRun, committed_shards, list_fragments
from zeeklog_ray.pipeline import PipelineConfig


def test_resume_no_duplicates(corpus_dir, corpus_frame, tmp_path):
    out = str(tmp_path / "routed")
    rr = ResumableRun(PipelineConfig(corpus_dir=corpus_dir), out, files_per_shard=1)
    n_shards = len(rr.shards())
    assert n_shards >= 3

    # kill mid-run after 2 shards
    with pytest.raises(RuntimeError, match="simulated failure"):
        rr.run(fail_after_shards=2)
    assert len(committed_shards(out)) == 2

    # resume: only uncommitted shards run
    recs = rr.run()
    assert len(recs) == n_shards - 2
    assert committed_shards(out) == set(range(n_shards))

    # no duplicate doc_id anywhere; full doc_id coverage
    back = rr.committed_output().to_pandas()
    assert back["doc_id"].is_unique
    assert set(back["doc_id"]) == set(corpus_frame["doc_id"])


def test_manifest_covers_fragments_exactly_once(corpus_dir, tmp_path):
    out = str(tmp_path / "routed")
    rr = ResumableRun(PipelineConfig(corpus_dir=corpus_dir), out, files_per_shard=2)
    rr.run()
    frags = []
    for p in glob.glob(os.path.join(out, "_manifest", "shard-*.json")):
        with open(p) as f:
            rec = json.load(f)
        frags.extend(rec["input_fragments"])
        # lineage metrics present
        assert rec["rows_per_sink"] and rec["output_bytes"] > 0
        assert "wall_time_s" in rec
    assert sorted(frags) == list_fragments(corpus_dir)


def test_rerun_after_completion_is_noop(corpus_dir, tmp_path):
    out = str(tmp_path / "routed")
    rr = ResumableRun(PipelineConfig(corpus_dir=corpus_dir), out, files_per_shard=4)
    first = rr.run()
    assert first
    again = rr.run()
    assert again == []


def test_committed_stats(corpus_dir, corpus_frame, tmp_path):
    out = str(tmp_path / "routed")
    rr = ResumableRun(PipelineConfig(corpus_dir=corpus_dir), out, files_per_shard=2)
    rr.run()
    stats = rr.committed_stats()
    assert stats["committed_shards"] == len(rr.shards())
    assert sum(stats["rows_per_sink"].values()) == len(corpus_frame)
    assert stats["output_bytes"] > 0 and stats["total_shard_wall_s"] > 0


def test_resume_honors_date_range(corpus_dir, corpus_frame, tmp_path):
    """Regression: ResumableRun sharded the whole corpus regardless of the
    configured date range."""
    out = str(tmp_path / "routed")
    cfg = PipelineConfig(corpus_dir=corpus_dir, start_date="2024-07-02")
    rr = ResumableRun(cfg, out, files_per_shard=2)
    rr.run()
    back = rr.committed_output().to_pandas()
    exp = corpus_frame[corpus_frame["date"] == "2024-07-02"]
    assert set(back["doc_id"]) == set(exp["doc_id"])
