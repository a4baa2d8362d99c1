"""Property-based parser tests (hypothesis): random record lines round-trip
through the token codec and extract correctly, including unicode and ragged
rows."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from zeeklog_ray.parse import parse_batch, tokens_to_strings
from zeeklog_ray.sources import SOURCE_FIELDS

# field values: any printable text without tab/newline (the separator is the
# only structural byte), including non-ASCII
_cell = st.text(
    alphabet=st.characters(blacklist_characters="\t\n\r",
                           blacklist_categories=("Cs",)),
    min_size=0, max_size=12)


def _tok_table(rows):
    enc = [line.encode() for _, _, line in rows]
    offsets = np.zeros(len(enc) + 1, dtype=np.int32)
    np.cumsum([len(b) for b in enc], out=offsets[1:])
    values = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.int32)
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "tokens": pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(values, type=pa.int32())),
        "n_tok": pa.array([len(b) for b in enc], type=pa.int32()),
        "source": pa.array([r[1] for r in rows]),
    })


@settings(max_examples=50, deadline=None)
@given(st.lists(_cell, min_size=1, max_size=14),
       st.sampled_from(sorted(SOURCE_FIELDS)))
def test_roundtrip_and_zip(cells, source):
    line = "\t".join(cells)
    t = _tok_table([("d0", source, line)])
    # codec round-trip is byte-exact
    assert tokens_to_strings(t["tokens"]).to_pylist() == [line]
    out = parse_batch(t)
    row = {c: out[c][0].as_py() for c in out.column_names}
    fields = SOURCE_FIELDS[source]
    for i, f in enumerate(fields):
        expected = cells[i] if i < len(cells) else None
        assert row[f] == expected, (f, i)
    # tokens column untouched
    assert out["tokens"][0].as_py() == t["tokens"][0].as_py()
    assert row["sink"] == source


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(sorted(SOURCE_FIELDS) + ["mystery"]),
                          st.lists(_cell, min_size=1, max_size=12)),
                min_size=1, max_size=8))
def test_mixed_batch(rows):
    recs = [(f"d{i}", src, "\t".join(cells))
            for i, (src, cells) in enumerate(rows)]
    out = parse_batch(_tok_table(recs))
    assert out.num_rows == len(recs)
    by_id = {out["doc_id"][i].as_py(): i for i in range(out.num_rows)}
    for i, (src, cells) in enumerate(rows):
        j = by_id[f"d{i}"]
        sink = out["sink"][j].as_py()
        if src in SOURCE_FIELDS:
            assert sink == src
            assert out[SOURCE_FIELDS[src][0]][j].as_py() == cells[0]
        else:
            assert sink == "none"
            assert out["ts"][j].as_py() is None
