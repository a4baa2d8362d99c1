"""Deterministic tokenized-corpus generator (the engine's test/bench input).

The reference's golden corpus is an encrypted tarball absent from its checkout
(``/root/reference/.MISSING_LARGE_BLOBS``, ``decrypt.sh``), so the input table
is synthesized deterministically per FIXTURES.md: a Parquet table

    (doc_id: string, tokens: list<int32>, n_tok: int32, source: string)

where ``tokens`` is the UTF-8 byte sequence (one int32 per byte) of a single
Zeek-style TSV data line whose fields follow the per-source registry in
``sources.py`` — i.e. exactly one body line of a Zeek log, the unit the
reference parses by splitting on the separator and zipping with ``#fields``
(``/root/reference/src/zeek/zeek_log.rs:179-188``).

Layout: hive-partitioned by date (``date=YYYY-MM-DD/part-NNNNN.parquet``),
mirroring the reference's date-directory partitioning
(``zeek_log.rs:372-383``) so date-range queries prune fragments at the read.

Determinism: fixed seed (42), no wall-clock, no network.  The golden
behavioral IPs from the reference's tests (``tests/zeek_search.rs:189-248``)
are planted: ``43.134.231.178`` occurs ONLY on 2024-07-02; ``91.92.245.221``
occurs on 2024-07-02.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from zeeklog_ray.sources import SEPARATOR

DATES = ("2024-07-02", "2024-07-03", "2024-07-04")
_DATE_EPOCH = {"2024-07-02": 1719878400, "2024-07-03": 1719964800, "2024-07-04": 1720051200}

# Source mix, intentionally skewed (conn-heavy) to exercise salted
# aggregation (FIXTURES.md §1).
SOURCE_MIX = [("conn", 0.70), ("dns", 0.15), ("http", 0.10), ("weird", 0.049), ("bogus", 0.001)]

GOLDEN_IP_0702_ONLY = "43.134.231.178"  # present only on 2024-07-02
GOLDEN_IP_0702 = "91.92.245.221"        # present on 2024-07-02

# 32-address pool (FIXTURES.md §3); indices 0 and 1 are the golden IPs.
IP_POOL = [GOLDEN_IP_0702_ONLY, GOLDEN_IP_0702] + [
    f"10.{i}.{(7 * i + 3) % 256}.{(13 * i + 5) % 256}" for i in range(2, 17)
] + [f"192.168.{i}.{(11 * i + 1) % 256}" for i in range(17, 32)]
assert len(IP_POOL) == 32

_RESP_PORTS = ["53", "80", "443", "22", "123"]
_PROTOS = ["tcp", "udp"]
_SERVICES = ["dns", "http", "ssl", "ssh", "-"]
_QTYPES = ["A", "AAAA", "PTR", "MX", "TXT"]
_RCODES = ["NOERROR", "NXDOMAIN", "SERVFAIL"]
_METHODS = ["GET", "POST", "HEAD", "PUT"]
_STATUS = ["200", "301", "404", "500"]
_AGENTS = ["Mozilla/5.0 (X11; Linux x86_64)", "curl/8.0.1", "python-requests/2.31", "-"]
_WEIRD_NAMES = ["bad_TCP_checksum", "dns_unmatched_reply", "active_connection_reuse",
                "possible_split_routing", "data_before_established"]

# Rows per scale factor, mirroring the driver testdata's lineitem scale
# (TESTDATA.md): sf0.001 ≈ 6k, sf0.01 ≈ 60k, sf0.1 ≈ 600k.
SF_ROWS = {"0.001": 6_000, "0.01": 60_000, "0.1": 600_000}

DEFAULT_SEED = 42
_CACHE_ROOT = os.environ.get("ZEEKLOG_CORPUS_DIR", "/tmp/zeeklog_corpus")


def _choice(rng: np.random.Generator, pool: list[str], n: int) -> np.ndarray:
    return np.asarray(pool, dtype=object)[rng.integers(0, len(pool), n)]


def make_corpus_frame(n_rows: int, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """Build the corpus as a pandas frame: (doc_id, tokens<bytes>, n_tok, source, date).

    ``tokens`` is returned as Python ``bytes`` here; :func:`frame_to_table`
    converts it to the canonical ``list<int32>`` Arrow column.
    Fully vectorized (numpy draws + pandas str.cat); deterministic in
    (n_rows, seed).
    """
    rng = np.random.default_rng(seed)
    n = n_rows

    src_names = np.asarray([s for s, _ in SOURCE_MIX], dtype=object)
    src_probs = np.asarray([p for _, p in SOURCE_MIX])
    src_idx = rng.choice(len(src_names), size=n, p=src_probs)
    source = src_names[src_idx]
    date_idx = rng.integers(0, len(DATES), n)
    date = np.asarray(DATES, dtype=object)[date_idx]

    # Addresses: uniform pool draw; golden IP 0 is remapped away from every
    # non-2024-07-02 row (both address fields) so it exists only on that date.
    orig_idx = rng.integers(0, 32, n)
    resp_idx = rng.integers(0, 32, n)
    not_d0 = date_idx != 0
    orig_idx[not_d0 & (orig_idx == 0)] = 2
    resp_idx[not_d0 & (resp_idx == 0)] = 3
    # Plant both golden IPs on 2024-07-02 deterministically.
    d0_rows = np.flatnonzero(date_idx == 0)
    if len(d0_rows) >= 2:
        orig_idx[d0_rows[0]] = 0
        orig_idx[d0_rows[1]] = 1
    pool = np.asarray(IP_POOL, dtype=object)
    orig_h = pool[orig_idx]
    resp_h = pool[resp_idx]

    ts = (np.asarray([_DATE_EPOCH[d] for d in DATES])[date_idx]
          + rng.uniform(0, 86400, n))
    uid_num = rng.integers(0, 2**36, n)

    s = pd.Series  # shorthand

    def fmt(pattern: str, arr: np.ndarray) -> pd.Series:
        # vectorized printf-style formatting (np.char.mod) → object Series
        return s(np.char.mod(pattern, arr).astype(object))

    cols = {
        "ts": fmt("%.6f", ts),
        "uid": "C" + fmt("%09x", uid_num),
        "id_orig_h": s(orig_h),
        "id_orig_p": fmt("%d", rng.integers(1024, 65536, n)),
        "id_resp_h": s(resp_h),
        "id_resp_p": s(_choice(rng, _RESP_PORTS, n)),
    }
    common = cols["ts"].str.cat(
        [cols["uid"], cols["id_orig_h"], cols["id_orig_p"], cols["id_resp_h"], cols["id_resp_p"]],
        sep=SEPARATOR,
    )

    # Per-source trailing fields (all rows get a draw; only the matching
    # source's tail is used — keeps the draw sequence deterministic and
    # branch-free).
    conn_tail = s(_choice(rng, _PROTOS, n)).str.cat(
        [s(_choice(rng, _SERVICES, n)),
         fmt("%.4f", rng.uniform(0, 300, n)),
         fmt("%d", rng.integers(0, 1_000_000, n))],
        sep=SEPARATOR)
    dns_tail = fmt("host%d.example.com", rng.integers(0, 500, n)).str.cat(
        [s(_choice(rng, _QTYPES, n)), s(_choice(rng, _RCODES, n))], sep=SEPARATOR)
    http_tail = s(_choice(rng, _METHODS, n)).str.cat(
        [fmt("site%d.example.com", rng.integers(0, 200, n)),
         fmt("/path/%d", rng.integers(0, 10_000, n)),
         s(_choice(rng, _STATUS, n)), s(_choice(rng, _AGENTS, n))], sep=SEPARATOR)
    weird_tail = s(_choice(rng, _WEIRD_NAMES, n)).str.cat(
        [s(np.where(rng.random(n) < 0.5, "T", "F"))], sep=SEPARATOR)
    bogus_tail = fmt("junk%d", rng.integers(0, 100, n))

    tail = s(np.empty(n, dtype=object))
    src_s = s(source)
    for name, t in (("conn", conn_tail), ("dns", dns_tail), ("http", http_tail),
                    ("weird", weird_tail), ("bogus", bogus_tail)):
        m = (src_s == name).to_numpy()
        tail[m] = t[m]

    lines = common.str.cat(tail, sep=SEPARATOR)
    tokens = lines.str.encode("utf-8")
    n_tok = tokens.str.len().astype("int32")
    doc_id = ("d-" + s(date) + "-" + s(source) + "-"
              + fmt("%08d", np.arange(n, dtype=np.int64)))

    return pd.DataFrame({
        "doc_id": doc_id, "tokens": tokens, "n_tok": n_tok,
        "source": src_s, "date": s(date),
    })


def frame_to_table(df: pd.DataFrame, with_date: bool = False) -> pa.Table:
    """Convert the generator frame to the canonical Arrow table.

    ``tokens`` bytes → ``list<int32>`` built directly from offsets + a cast
    byte buffer (no per-row Python loop).
    """
    raw = df["tokens"].to_numpy()
    lengths = np.fromiter((len(b) for b in raw), dtype=np.int32, count=len(raw))
    offsets = np.zeros(len(raw) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    values = np.frombuffer(b"".join(raw), dtype=np.uint8).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(values, type=pa.int32()))
    cols = {
        "doc_id": pa.array(df["doc_id"], type=pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(df["n_tok"], type=pa.int32()),
        "source": pa.array(df["source"], type=pa.string()),
    }
    if with_date:
        cols["date"] = pa.array(df["date"], type=pa.string())
    return pa.table(cols)


def generate_corpus(n_rows: int, seed: int = DEFAULT_SEED,
                    rows_per_file: int | None = None) -> str:
    """Generate (or reuse) the hive-partitioned corpus; returns its directory.

    Output layout: ``<cache>/n{n_rows}-seed{seed}/date=YYYY-MM-DD/part-*.parquet``
    with many files per date so the read stage parallelizes (one read task
    per fragment, SURVEY.md §4).  Idempotent: a ``_SUCCESS`` marker gates
    reuse; concurrent generators race benignly (build to a temp dir, atomic
    rename, loser discards).
    """
    if rows_per_file is None:
        # ≥24 fragments for parallel reads on small corpora, ≤100k rows per
        # fragment (the unit of file-granular dispatch + resume)
        rows_per_file = max(25_000, min(100_000, n_rows // 24))
    out_dir = os.path.join(_CACHE_ROOT, f"v4-n{n_rows}-seed{seed}-rpf{rows_per_file}")
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir

    df = make_corpus_frame(n_rows, seed)
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="corpus-", dir=_CACHE_ROOT)
    try:
        for d in DATES:
            part = df[df["date"] == d]
            pdir = os.path.join(tmp, f"date={d}")
            os.makedirs(pdir, exist_ok=True)
            for fi, start in enumerate(range(0, len(part), rows_per_file)):
                chunk = part.iloc[start:start + rows_per_file]
                # date is stored in-file as well as in the dir name, so
                # explicit-path reads keep the column without hive parsing.
                table = frame_to_table(chunk, with_date=True)
                pq.write_table(table, os.path.join(pdir, f"part-{fi:05d}.parquet"),
                               row_group_size=32_768)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok\n")
        try:
            os.rename(tmp, out_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # another process won the race
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out_dir


def corpus_for_sf_dir(sf_dir: str, seed: int = DEFAULT_SEED) -> str:
    """Map a driver sf dir (e.g. /root/testdata/sf0.01) to a corpus dir of
    matching scale, generating it on first use."""
    tag = os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf")
    n_rows = SF_ROWS.get(tag)
    if n_rows is None:
        try:
            n_rows = max(1000, int(float(tag) * 6_000_000))
        except ValueError:
            n_rows = 60_000
    return generate_corpus(n_rows, seed)


# ---------------------------------------------------------------------------
# Synthetic DOCUMENT corpus (for dedup/text ops at scale): word-soup texts
# with planted near-duplicates at a controlled rate.
# ---------------------------------------------------------------------------

_DOC_VOCAB = [f"w{i:03d}" for i in range(600)]


def make_documents_frame(n_docs: int, seed: int = DEFAULT_SEED,
                         dup_rate: float = 0.05,
                         words_per_doc: int = 60) -> pd.DataFrame:
    """Deterministic document table (doc_id:int64, text, is_dup_of:int64).

    ``dup_rate`` of the docs are near-duplicates of an earlier doc (one word
    substituted), recorded in ``is_dup_of`` (-1 otherwise) so dedup recall
    is measurable exactly.
    """
    rng = np.random.default_rng(seed)
    vocab = np.asarray(_DOC_VOCAB, dtype=object)
    words = vocab[rng.integers(0, len(vocab), (n_docs, words_per_doc))]
    texts = np.array([" ".join(row) for row in words], dtype=object)
    is_dup = np.full(n_docs, -1, dtype=np.int64)
    dup_idx = np.flatnonzero(rng.random(n_docs) < dup_rate)
    dup_idx = dup_idx[dup_idx > 0]
    src = rng.integers(0, np.maximum(dup_idx, 1))
    for i, s in zip(dup_idx, src):
        w = texts[s].split(" ")
        w[int(rng.integers(0, len(w)))] = str(vocab[rng.integers(0, len(vocab))])
        texts[i] = " ".join(w)
        is_dup[i] = s
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "text": texts, "is_dup_of": is_dup})


def generate_documents(n_docs: int, seed: int = DEFAULT_SEED,
                       rows_per_file: int = 25_000) -> str:
    """Cached parquet corpus of synthetic documents (multiple fragments)."""
    out_dir = os.path.join(_CACHE_ROOT, f"docs-v1-n{n_docs}-seed{seed}")
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    df = make_documents_frame(n_docs, seed)
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="docs-", dir=_CACHE_ROOT)
    try:
        for fi, start in enumerate(range(0, len(df), rows_per_file)):
            chunk = pa.Table.from_pandas(df.iloc[start:start + rows_per_file],
                                         preserve_index=False)
            pq.write_table(chunk, os.path.join(tmp, f"part-{fi:05d}.parquet"),
                           row_group_size=8192)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok\n")
        try:
            os.rename(tmp, out_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out_dir
