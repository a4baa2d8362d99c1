"""Corpus generator invariants (no Ray needed)."""

import pandas as pd

from zeeklog_ray.corpus import (
    GOLDEN_IP_0702,
    GOLDEN_IP_0702_ONLY,
    frame_to_table,
    make_corpus_frame,
)
from zeeklog_ray.sources import SEPARATOR, SOURCE_FIELDS


def test_deterministic():
    a = make_corpus_frame(500)
    b = make_corpus_frame(500)
    pd.testing.assert_frame_equal(a, b)


def test_schema_and_roundtrip():
    df = make_corpus_frame(1000)
    t = frame_to_table(df)
    assert t.schema.names == ["doc_id", "tokens", "n_tok", "source"]
    assert str(t.schema.field("tokens").type) == "list<item: int32>"
    # token payload decodes to a TSV line with the registry's field count
    for i in [0, 17, 999]:
        src = t["source"][i].as_py()
        line = bytes(t["tokens"][i].as_py()).decode()
        nfields = len(line.split(SEPARATOR))
        if src in SOURCE_FIELDS:
            assert nfields == len(SOURCE_FIELDS[src])
        assert t["n_tok"][i].as_py() == len(line.encode())


def test_doc_ids_unique():
    df = make_corpus_frame(2000)
    assert df["doc_id"].is_unique


def test_golden_ip_dates():
    """Mirror of the reference's golden assertions
    (/root/reference/tests/zeek_search.rs:189-248): 43.134.231.178 occurs
    ONLY on 2024-07-02; 91.92.245.221 occurs on 2024-07-02."""
    df = make_corpus_frame(6000)
    # the golden IPs appear only in the address cells of the payload
    has0 = df["tokens"].map(lambda b: GOLDEN_IP_0702_ONLY.encode() in b)
    has1 = df["tokens"].map(lambda b: GOLDEN_IP_0702.encode() in b)
    assert has0.any() and has1.any()
    assert (df.loc[has0, "date"] == "2024-07-02").all()
    assert (df.loc[has1 & (df["date"] == "2024-07-02")]).shape[0] > 0


def test_source_mix_skewed():
    df = make_corpus_frame(6000)
    counts = df["source"].value_counts(normalize=True)
    assert counts["conn"] > 0.6          # hot key for skew handling
    assert 0 < counts.get("bogus", 0) < 0.01
