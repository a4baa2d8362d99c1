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


# The reference's full protocol enum (zeek_log_proto.rs:7-35 / its
# name codec at :40-74) — registry parity is checked against this list.
REFERENCE_PROTOCOLS = {
    "conn", "dns", "http", "files", "ftp", "ssl", "x509", "smtp", "snmp",
    "ssh", "pe", "dhcp", "ntp", "smb", "irc", "rdp", "ldap", "quic",
    "traceroute", "tunnel", "dpd", "known", "software", "weird", "notice",
    "capture_loss", "reporter", "sip",
}


def test_registry_matches_reference_protocols():
    assert set(SOURCE_FIELDS) == REFERENCE_PROTOCOLS
    assert len(SOURCE_FIELDS) == 28


def test_registry_prefixes():
    from zeeklog_ray.sources import CONN_PREFIXED

    for src, fields in SOURCE_FIELDS.items():
        if src in CONN_PREFIXED:
            assert fields[:6] == ["ts", "uid", "id_orig_h", "id_orig_p",
                                  "id_resp_h", "id_resp_p"], src
        else:
            # host/file-oriented logs are ts-prefixed like real Zeek
            assert fields[0] == "ts" and "uid" not in fields, src


def test_ts_prefixed_source_parses():
    """files.log has no connection 6-tuple — its fields land at their own
    positions and the id_* columns stay null."""
    files_line = "\t".join(["1719878402.0", "F00000abcd", "1.2.3.4", "9.8.7.6",
                            "text/plain", "a" * 32, "b" * 40, "c" * 64, "12345"])
    t = _tok_table([("f", "files", files_line), ("a", "conn", CONN_LINE)])
    out = parse_batch(t).to_pandas().set_index("doc_id")
    f = out.loc["f"]
    assert f["ts"] == "1719878402.0" and f["fuid"] == "F00000abcd"
    assert f["tx_hosts"] == "1.2.3.4" and f["mime_type"] == "text/plain"
    assert f["total_bytes"] == "12345" and f["sink"] == "files"
    assert f["uid"] is None and f["id_orig_h"] is None
    # conn row untouched by the wider registry
    assert out.loc["a", "proto"] == "tcp" and out.loc["a", "fuid"] is None


def test_mixed_28_source_batch_roundtrip():
    """One synthetic row per registry source: every sink routes, every
    source's own fields extract at the right positions."""
    from zeeklog_ray.corpus import TAIL_SPECS
    import numpy as np

    rows = []
    for src in sorted(SOURCE_FIELDS):
        rng = np.random.default_rng(1)
        tail = [str(g(rng, 1)[0]) for g in TAIL_SPECS[src]]
        prefix = (["1719878400.0", "Cxyz", "10.0.0.1", "1234", "10.0.0.2", "80"]
                  if SOURCE_FIELDS[src][1:6] == ["uid", "id_orig_h",
                                                 "id_orig_p", "id_resp_h",
                                                 "id_resp_p"]
                  else ["1719878400.0"])
        rows.append((src, src, "\t".join(prefix + tail)))
    out = parse_batch(_tok_table(rows)).to_pandas().set_index("doc_id")
    assert set(out["sink"]) == set(SOURCE_FIELDS)
    for src in SOURCE_FIELDS:
        row = out.loc[src]
        line = dict(rows=[r for r in rows if r[0] == src])["rows"][0][2]
        cells = line.split("\t")
        for pos, field in enumerate(SOURCE_FIELDS[src]):
            assert row[field] == cells[pos], (src, field)
