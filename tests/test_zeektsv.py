"""Real Zeek .log.gz ingestion: header sniff, #close stop, flattening,
round-trip parity with the tokenized-corpus parse path."""

import gzip
import os

import pandas as pd
import pytest

from zeeklog_ray.sources import SOURCE_FIELDS
from zeeklog_ray.zeektsv import (
    parse_zeek_gz,
    read_zeek_logs,
    tsv_fixture_for_sf_dir,
    write_zeek_log_gz,
)

CONN_LINES = [
    "\t".join(["1719878400.5", "Cabc", "1.2.3.4", "5555", "9.8.7.6", "443",
               "tcp", "ssl", "12.5", "999"]),
    "\t".join(["1719878401.0", "Cdef", "4.3.2.1", "4444", "8.8.8.8", "53",
               "udp", "dns", "0.1", "77"]),
]


def test_roundtrip_single_file(tmp_path):
    p = str(tmp_path / "2024-07-02" / "conn.00:00:00-01:00:00.log.gz")
    write_zeek_log_gz(p, "conn", CONN_LINES)
    t = parse_zeek_gz(p).to_pandas()
    assert len(t) == 2                       # footer NOT parsed as a row
    assert t["sink"].tolist() == ["conn", "conn"]
    assert t["id_orig_h"].tolist() == ["1.2.3.4", "4.3.2.1"]  # dotted header flattened
    assert t["proto"].tolist() == ["tcp", "udp"]
    assert t["date"].tolist() == ["2024-07-02"] * 2
    # filename hour range exposed as a column (zeek_log.rs:394-398)
    assert t["hour_bucket"].tolist() == ["00:00:00-01:00:00"] * 2
    # token payload is the exact line bytes
    import numpy as np

    assert bytes(np.asarray(t["tokens"][0], dtype=np.uint8)).decode() == CONN_LINES[0]
    assert int(t["n_tok"][0]) == len(CONN_LINES[0].encode())


def test_header_sniff_custom_separator(tmp_path):
    p = str(tmp_path / "2024-07-02" / "dns.00:00:00-01:00:00.log.gz")
    line = ",".join(["1719878400.5", "Cd1", "1.1.1.1", "53", "2.2.2.2", "53",
                     "example.com", "A", "NOERROR"])
    write_zeek_log_gz(p, "dns", [line], sep=",")
    t = parse_zeek_gz(p).to_pandas()
    assert t["query"].tolist() == ["example.com"]
    assert t["rcode_name"].tolist() == ["NOERROR"]


def test_unknown_proto_quarantined(tmp_path):
    p = str(tmp_path / "2024-07-02" / "mystery.00:00:00-01:00:00.log.gz")
    write_zeek_log_gz(p, "mystery", ["a\tb\tc"])
    t = parse_zeek_gz(p).to_pandas()
    assert t["sink"].tolist() == ["none"]
    assert t["id_orig_h"].isna().all()


def test_scan_stops_at_close(tmp_path):
    """Rows after the #close footer are ignored (zeek_log.rs:175-178)."""
    p = str(tmp_path / "2024-07-02" / "conn.x.log.gz")
    write_zeek_log_gz(p, "conn", CONN_LINES)
    with gzip.open(p, "at", encoding="utf-8") as f:
        f.write(CONN_LINES[0] + "\n")        # junk after footer
    t = parse_zeek_gz(p)
    assert t.num_rows == 2


def test_close_in_field_value_survives(tmp_path):
    """'#close' as a SUBSTRING of a data cell must not truncate the scan —
    only a '#close'-prefixed line is the footer (regression: containment
    match dropped the row and everything after it)."""
    p = str(tmp_path / "2024-07-02" / "http.x.log.gz")
    lines = [
        "\t".join(["1719878400.5", "Ca", "1.1.1.1", "1", "2.2.2.2", "80",
                   "GET", "ex.com", "/redir#close", "200", "UA"]),
        "\t".join(["1719878401.0", "Cb", "3.3.3.3", "2", "4.4.4.4", "80",
                   "GET", "ex.com", "/ok", "200", "UA"]),
    ]
    write_zeek_log_gz(p, "http", lines)
    t = parse_zeek_gz(p).to_pandas()
    assert len(t) == 2
    assert t["uri"].tolist() == ["/redir#close", "/ok"]


def test_short_header_parses_losslessly(tmp_path):
    """A header with fewer than 8 lines (e.g. no #open) must not eat the
    first data rows (regression: fixed 8-line slice)."""
    p = str(tmp_path / "2024-07-02" / "conn.x.log.gz")
    import os

    os.makedirs(os.path.dirname(p), exist_ok=True)
    header = [
        "#separator \\x09",
        "#path\tconn",
        "#fields\tts\tuid\tid.orig_h\tid.orig_p\tid.resp_h\tid.resp_p"
        "\tproto\tservice\tduration\torig_bytes",
    ]
    with gzip.open(p, "wt", encoding="utf-8") as f:
        for ln in header:
            f.write(ln + "\n")
        for ln in CONN_LINES:
            f.write(ln + "\n")
        f.write("#close\t2024-07-02-23-59-59\n")
    t = parse_zeek_gz(p).to_pandas()
    assert len(t) == 2
    assert t["id_orig_h"].tolist() == ["1.2.3.4", "4.3.2.1"]


def test_read_zeek_logs_matches_corpus_parse(ray_session, tmp_path):
    """The TSV tree carries exactly the corpus lines; reading it must yield
    the same per-sink counts AND the same extracted values as the tokenized
    corpus parse path (the round-trip the reference's golden tests pin)."""
    from zeeklog_ray.corpus import make_corpus_frame
    from zeeklog_ray.pipeline import PipelineConfig, build_dataset
    from zeeklog_ray.corpus import generate_corpus

    ds = read_zeek_logs(tsv_fixture_for_sf_dir("/root/testdata/sf0.001"))
    got = ds.to_pandas()

    corpus = build_dataset(
        PipelineConfig(corpus_dir=generate_corpus(6_000))).to_pandas()
    # identical sink counts
    assert got["sink"].value_counts().to_dict() == \
        corpus["sink"].value_counts().to_dict()
    # identical multiset of extracted address values
    for col in ("id_orig_h", "id_resp_h", "query", "method"):
        assert got[col].value_counts().to_dict() == \
            corpus[col].value_counts().to_dict(), col


# ---- property: arbitrary cell content round-trips through write+parse ----

from hypothesis import given, settings
from hypothesis import strategies as st

# printable-ish cells that cannot contain the separator, newlines, or a
# leading '#' (Zeek cells are the same: the separator is reserved)
_cell = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           blacklist_characters="\t\n\r"),
    min_size=1, max_size=12).filter(lambda s: not s.startswith("#"))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(_cell, min_size=10, max_size=10), min_size=1, max_size=6))
def test_roundtrip_property(tmp_path_factory, rows):
    """Any grid of separator-free cells survives write_zeek_log_gz →
    parse_zeek_gz byte-for-byte: row count, positional extraction, and the
    token payload all match — including cells containing '#close' or '#'
    mid-string."""
    tmp = tmp_path_factory.mktemp("prop")
    p = str(tmp / "2024-07-02" / "conn.x.log.gz")
    lines = ["\t".join(r) for r in rows]
    write_zeek_log_gz(p, "conn", lines)
    t = parse_zeek_gz(p).to_pandas()
    assert len(t) == len(rows)
    assert t["id_orig_h"].tolist() == [r[2] for r in rows]
    assert t["orig_bytes"].tolist() == [r[9] for r in rows]
    import numpy as np

    for i, ln in enumerate(lines):
        assert bytes(np.asarray(t["tokens"][i], dtype=np.uint8).tobytes()) \
            == ln.encode()


def test_cli_zeek_tsv_end_to_end(tmp_path):
    """The CLI consumes a raw Zeek .log.gz tree (the reference's native
    input) end to end: routed sink=* parquet + per-sink report, with the
    source filter applied.  Subprocess because the CLI owns its own Ray
    session (like test_compat_cli.py::test_cli_end_to_end)."""
    import json
    import subprocess
    import sys

    base = tsv_fixture_for_sf_dir("/root/testdata/sf0.001")
    out = str(tmp_path / "routed")
    r = subprocess.run(
        [sys.executable, "-m", "zeeklog_ray.cli", "--corpus", base,
         "--input-format", "zeek-tsv", "--out", out, "--source", "DnS",
         "--num-cpus", "4"],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["mode"] == "zeek-tsv"
    assert list(report["rows_per_sink"]) == ["dns"]
    import glob

    assert glob.glob(os.path.join(out, "sink=dns", "*.parquet"))
    # row count matches the corpus the fixture was built from
    from zeeklog_ray.corpus import make_corpus_frame

    exp = (make_corpus_frame(6000)["source"] == "dns").sum()
    assert report["rows_per_sink"]["dns"] == int(exp)


def test_on_error_skip_survives_corrupt_file(ray_session, tmp_path):
    """A truncated gzip must not kill the job under on_error='skip' (one
    corrupt rotation file in a fleet-scale run), and must still raise
    under the strict default."""
    write_zeek_log_gz(str(tmp_path / "2024-07-02" / "conn.a.log.gz"),
                      "conn", CONN_LINES)
    with open(tmp_path / "2024-07-02" / "dns.b.log.gz", "wb") as f:
        f.write(b"\x1f\x8b garbage not gzip body")
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_zeek_logs(str(tmp_path)).to_pandas()
    got = read_zeek_logs(str(tmp_path), on_error="skip").to_pandas()
    assert len(got) == 2 and set(got["sink"]) == {"conn"}


def test_read_zeek_logs_date_pruning(ray_session):
    d = tsv_fixture_for_sf_dir("/root/testdata/sf0.001")
    ds = read_zeek_logs(d, dates=["2024-07-02"])
    got = ds.to_pandas()
    assert set(got["date"]) == {"2024-07-02"}
