"""Parser unit tests against hand-written Zeek-style TSV lines.

Realizes the intent of the reference's (fully commented-out) header/parse
unit tests (/root/reference/tests/header.rs:3-45): separator split,
field-zip column semantics, and the rebuild's null-padding for ragged rows
(vs the reference's silent zip-truncate, zeek_log.rs:181-188).
"""

import numpy as np
import pyarrow as pa

from zeeklog_ray.parse import parse_batch, tokens_to_strings
from zeeklog_ray.sources import EXTRACTED_COLUMNS, SOURCE_FIELDS


def _tok_table(rows: list[tuple[str, str, str]]) -> pa.Table:
    """rows = [(doc_id, source, tsv_line)] → canonical input table."""
    enc = [line.encode() for _, _, line in rows]
    offsets = np.zeros(len(enc) + 1, dtype=np.int32)
    np.cumsum([len(b) for b in enc], out=offsets[1:])
    values = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.int32)
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "tokens": pa.ListArray.from_arrays(pa.array(offsets),
                                           pa.array(values, type=pa.int32())),
        "n_tok": pa.array([len(b) for b in enc], type=pa.int32()),
        "source": pa.array([r[1] for r in rows]),
    })


CONN_LINE = "\t".join(["1719878400.5", "Cabc", "1.2.3.4", "5555",
                       "9.8.7.6", "443", "tcp", "ssl", "12.5", "999"])
DNS_LINE = "\t".join(["1719878401.0", "Cdef", "4.3.2.1", "4444",
                      "8.8.8.8", "53", "example.com", "A", "NOERROR"])


def test_tokens_to_strings_roundtrip():
    t = _tok_table([("a", "conn", CONN_LINE), ("b", "dns", DNS_LINE)])
    lines = tokens_to_strings(t["tokens"])
    assert lines.to_pylist() == [CONN_LINE, DNS_LINE]


def test_field_zip_per_source():
    t = _tok_table([("a", "conn", CONN_LINE), ("b", "dns", DNS_LINE)])
    out = parse_batch(t).to_pandas().set_index("doc_id")
    a, b = out.loc["a"], out.loc["b"]
    assert a["id_orig_h"] == "1.2.3.4" and a["proto"] == "tcp" and a["orig_bytes"] == "999"
    assert a["query"] is None                       # dns-only field null for conn
    assert b["query"] == "example.com" and b["rcode_name"] == "NOERROR"
    assert b["proto"] is None
    assert a["sink"] == "conn" and b["sink"] == "dns"


def test_ragged_row_null_padded():
    short = "\t".join(["1719878400.5", "Cabc", "1.2.3.4"])  # 3 of 10 fields
    t = _tok_table([("a", "conn", short)])
    row = parse_batch(t).to_pandas().iloc[0]
    assert row["id_orig_h"] == "1.2.3.4"
    assert row["id_orig_p"] is None and row["orig_bytes"] is None


def test_unknown_source_quarantined():
    t = _tok_table([("a", "bogus", "junk1\tjunk2"), ("b", "conn", CONN_LINE)])
    out = parse_batch(t).to_pandas().set_index("doc_id")
    assert out.loc["a", "sink"] == "none"
    assert all(out.loc["a", c] is None for c in EXTRACTED_COLUMNS)
    assert out.loc["b", "sink"] == "conn"


def test_tokens_passthrough_unchanged():
    t = _tok_table([("a", "conn", CONN_LINE), ("b", "weird",
                    "\t".join(["1", "C1", "1.1.1.1", "1", "2.2.2.2", "53",
                               "bad_TCP_checksum", "F"]))])
    out = parse_batch(t)
    got = {d: tok for d, tok in zip(out["doc_id"].to_pylist(),
                                    out["tokens"].to_pylist())}
    want = {d: tok for d, tok in zip(t["doc_id"].to_pylist(),
                                     t["tokens"].to_pylist())}
    assert got == want  # exact token-array equality per doc_id


def test_all_registry_sources_have_common_prefix():
    for src, fields in SOURCE_FIELDS.items():
        assert fields[:6] == ["ts", "uid", "id_orig_h", "id_orig_p",
                              "id_resp_h", "id_resp_p"], src
