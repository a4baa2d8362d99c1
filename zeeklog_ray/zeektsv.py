"""Real Zeek ``.log.gz`` TSV ingestion — the reference's native input format.

The reference reads gzipped TSV date directories with a two-pass header
sniff: filename → (proto, hour bucket) (``zeek_log.rs:372-383``), line 0
``#separator \\xNN`` → separator char (``zeek_log.rs:104-117``), ``#path`` →
proto, ``#fields`` → column names (``zeek_log.rs:118-146``), data rows split
on the separator and zipped with the fields, scan stopped at the ``#close``
footer (``zeek_log.rs:156-224``).

:func:`read_zeek_logs` re-expresses that Ray-Data-first: one map task per
``.log.gz`` file (the file IS the fragment, exactly like the corpus path),
header sniffed per file, data decoded with the SAME Arrow kernels and into
the SAME output schema as the tokenized-corpus path
(:func:`zeeklog_ray.parse.parse_batch`): payload columns
``doc_id/tokens/n_tok/source/date`` + the registry's ``EXTRACTED_COLUMNS``
+ ``sink``.  Field extraction is HEADER-DRIVEN (the file's own ``#fields``
decides each column's position, like the reference), so files whose field
order differs from the registry still parse correctly; header fields outside
the registry union are ignored, registry columns absent from the header are
null.

:func:`write_zeek_log_gz` writes the same format (full 8-line header +
``#close`` footer) — used by tests and the fixture generator for the
round-trip/oracle checks.
"""

from __future__ import annotations

import glob
import gzip
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from zeeklog_ray.sources import (
    EXTRACTED_COLUMNS,
    SEPARATOR,
    SOURCE_FIELDS,
    normalize_source,
)

_HEADER_LINES = 8  # separator, set_separator, empty_field, unset_field,
                   # path, open, fields, types (zeek_log.rs:96-155) —
                   # asserted against the writer's header; the reader
                   # takes the leading '#' run so shorter/longer
                   # real-world headers parse losslessly


def _flatten_field(name: str) -> str:
    """Zeek header field name → identifier-safe column (``id.orig_h`` →
    ``id_orig_h``), the same flattening the registry uses."""
    return name.replace(".", "_")


def _parse_header(lines: list[str]) -> tuple[str, str | None, list[str]]:
    """(separator, proto, flattened field names) from the ``#`` header block."""
    sep = SEPARATOR
    proto: str | None = None
    fields: list[str] = []
    for ln in lines:
        if not ln.startswith("#"):
            break
        # '#separator \x09' — the token after the SPACE, hex-escaped
        if ln.startswith("#separator"):
            val = ln.split(" ", 1)[1].strip()
            if val.startswith("\\x"):
                sep = chr(int(val[2:4], 16))   # zeek_log.rs:112-115
            elif val:
                sep = val[0]
        elif ln.startswith("#path"):
            proto = ln.split(sep, 1)[1].strip() if sep in ln else None
        elif ln.startswith("#fields"):
            fields = [_flatten_field(f) for f in ln.split(sep)[1:]]
    return sep, proto, fields


def _lines_to_tokens(encoded: list[bytes]) -> tuple[pa.Array, np.ndarray]:
    """UTF-8 line bytes → (``list<int32>`` token column, per-line lengths).

    The byte values build a ``list<uint8>`` first and widen with ONE Arrow
    cast kernel — a numpy ``uint8.astype(int32)`` on the concatenated
    payload measured 390 ms per 124k-row file, half the parse."""
    lengths = np.fromiter((len(b) for b in encoded), dtype=np.int64,
                          count=len(encoded))
    if int(lengths.sum()) >= (1 << 31):
        # int32 list offsets (the corpus schema) cap one file's payload at
        # 2 GiB decompressed — a silent cumsum wrap would corrupt offsets
        raise ValueError(
            f"log file payload is {int(lengths.sum())} bytes (>= 2 GiB); "
            "split the file (Zeek rotates hourly precisely so this cannot "
            "happen) or switch the tokens column to large_list")
    offsets = np.zeros(len(encoded) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    values = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    narrow = pa.ListArray.from_arrays(pa.array(offsets.astype(np.int32)),
                                      pa.array(values))
    return narrow.cast(pa.list_(pa.int32())), lengths.astype(np.int32)


def parse_zeek_gz(path: str) -> pa.Table:
    """One ``.log.gz`` file → a parsed Arrow table in the engine schema."""
    with gzip.open(path, "rb") as f:
        raw = f.read()
    text = raw.decode("utf-8", errors="replace")
    all_lines = text.splitlines()
    # header = the LEADING run of '#' lines (real Zeek headers are 8 lines,
    # but a fixed slice would silently eat data rows of a shorter header)
    hdr_end = 0
    for ln in all_lines:
        if not ln.startswith("#"):
            break
        hdr_end += 1
    sep, proto, fields = _parse_header(all_lines[:hdr_end])
    if proto is None:
        # filename convention p[0] = proto (zeek_log.rs:372-383)
        proto = os.path.basename(path).split(".", 1)[0]
    date = os.path.basename(os.path.dirname(path))
    stem = os.path.splitext(os.path.splitext(os.path.basename(path))[0])[0]
    # filename hour range ('conn.00:00:00-01:00:00' → '00:00:00-01:00:00')
    # — the key of the reference's in-memory LogTree per (proto, hour)
    # (zeek_log.rs:394-398); '' when the filename carries no range
    hour_bucket = stem.split(".", 1)[1] if "." in stem else ""

    data = []
    for ln in all_lines[hdr_end:]:
        # footer ends the scan (zeek_log.rs:175-178); PREFIX match only —
        # a data row merely containing '#close' in a field must survive
        if ln.startswith("#close"):
            break
        if ln and not ln.startswith("#"):
            data.append(ln)

    n = len(data)
    enc = [ln.encode("utf-8") for ln in data]
    tokens, lengths = _lines_to_tokens(enc)
    doc_ids = (np.char.add(f"{date}-{stem}-",
                           np.char.mod("%08d", np.arange(n)))
               if n else np.empty(0, dtype=object))
    src = pa.array([proto] * n, type=pa.string())
    table = pa.table({
        "doc_id": pa.array(doc_ids.astype(object), type=pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(lengths, type=pa.int32()),
        "source": src,
        "date": pa.array([date] * n, type=pa.string()),
        "hour_bucket": pa.array([hour_bucket] * n, type=pa.string()),
    })

    sink = normalize_source(proto)
    lines_arr = pa.array(data, type=pa.string())
    parts = pc.split_pattern(lines_arr, sep)
    # header-driven positional extraction: the file's own #fields decides
    # positions (reference zip semantics, zeek_log.rs:179-188) — but only
    # for a KNOWN proto; unknown files are quarantined with null fields,
    # mirroring ZeekProtocol::NONE skips (zeek_log.rs:385,401)
    pos_of = {f: i for i, f in enumerate(fields)} if sink != "none" else {}
    for name in EXTRACTED_COLUMNS:
        i = pos_of.get(name)
        if i is None or n == 0:
            col = pa.nulls(n, type=pa.string())
        else:
            col = pc.list_flatten(pc.list_slice(parts, i, i + 1,
                                                return_fixed_size_list=True))
        table = table.append_column(name, col)
    return table.append_column("sink", pa.array([sink] * n, type=pa.string()))


def list_zeek_files(base_dir: str) -> list[str]:
    """``base/YYYY-MM-DD/<proto>.*.log.gz`` discovery (zeek_log.rs:372-383)."""
    return sorted(glob.glob(os.path.join(base_dir, "*", "*.log.gz")))


def select_zeek_files(base_dir: str, start_date: str | None = None,
                      end_date: str | None = None) -> list[str]:
    """Date-pruned fragment selection over a raw log tree with EXACTLY the
    parquet path's ``_date_dirs`` semantics (zeek_log.rs:367-383): no dates
    → everything; end-only (plan 1) → every date ≤ end; a start date with
    no matching directory raises ``SearchInvalidStartDate`` instead of
    silently selecting nothing."""
    from zeeklog_ray.pipeline import SearchInvalidStartDate

    files = list_zeek_files(base_dir)
    if not files:
        raise FileNotFoundError(f"no .log.gz files under {base_dir!r}")

    def d(f: str) -> str:
        return os.path.basename(os.path.dirname(f))

    if start_date is None and end_date is None:
        return files
    if start_date is None:
        return [f for f in files if d(f) <= end_date]
    if start_date not in {d(f) for f in files}:
        raise SearchInvalidStartDate(f"no partition for {start_date!r}")
    hi = end_date or start_date
    return [f for f in files if start_date <= d(f) <= hi]


def read_zeek_logs(base_dir: str, dates: list[str] | None = None,
                   on_error: str = "raise") -> "ray.data.Dataset":
    """Dataset over a Zeek log directory tree — one read task per file
    (file-granular, like the corpus fragments), output schema identical to
    the tokenized-corpus parse path.

    ``on_error='skip'`` drops files that fail to decompress or parse
    (truncated gzip, binary junk) with a logged warning instead of killing
    the job — at fleet scale one corrupt rotation file must not abort a
    long run; the default ``'raise'`` keeps strict semantics for tests
    and oracle comparisons.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(on_error)
    files = list_zeek_files(base_dir)
    if dates is not None:
        keep = set(dates)
        files = [f for f in files
                 if os.path.basename(os.path.dirname(f)) in keep]
    if not files:
        raise FileNotFoundError(f"no .log.gz files under {base_dir!r}")
    paths = ray.data.from_items([{"path": f} for f in files],
                                override_num_blocks=len(files))

    def load(batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch["path"].to_pylist():
            try:
                tables.append(parse_zeek_gz(p))
            except Exception:
                if on_error == "raise":
                    raise
                import logging

                logging.getLogger(__name__).warning(
                    "skipping unreadable zeek log %s", p, exc_info=True)
        if not tables:
            # empty-but-typed table so downstream schema stays stable
            return _empty_table()
        return pa.concat_tables(tables)

    return paths.map_batches(load, batch_format="pyarrow", batch_size=None)


def _empty_table() -> pa.Table:
    """Zero-row table in the parsed schema (for all-skipped batches)."""
    t = pa.table({
        "doc_id": pa.array([], pa.string()),
        "tokens": pa.array([], pa.list_(pa.int32())),
        "n_tok": pa.array([], pa.int32()),
        "source": pa.array([], pa.string()),
        "date": pa.array([], pa.string()),
        "hour_bucket": pa.array([], pa.string()),
    })
    for name in EXTRACTED_COLUMNS:
        t = t.append_column(name, pa.nulls(0, type=pa.string()))
    return t.append_column("sink", pa.array([], pa.string()))


# inverse of the id-field flattening, so fixtures carry REAL Zeek header
# names (id.orig_h, …) and the reader's flattening path is exercised
_DOTTED = {"id_orig_h": "id.orig_h", "id_orig_p": "id.orig_p",
           "id_resp_h": "id.resp_h", "id_resp_p": "id.resp_p"}


def write_zeek_log_gz(path: str, proto: str, lines: list[str],
                      sep: str = SEPARATOR,
                      close_ts: str = "2024-07-02-23-59-59") -> None:
    """Write one Zeek-format ``.log.gz``: 8-line header, data, ``#close``."""
    fields = SOURCE_FIELDS.get(proto)
    names = [_DOTTED.get(f, f) for f in fields] if fields else ["f0"]
    field_line = sep.join(["#fields"] + names)
    hexsep = f"\\x{ord(sep):02x}"
    header = [
        f"#separator {hexsep}",
        f"#set_separator{sep},",
        f"#empty_field{sep}(empty)",
        f"#unset_field{sep}-",
        f"#path{sep}{proto}",
        f"#open{sep}2024-07-02-00-00-00",
        field_line,
        sep.join(["#types"] + ["string"] * (len(fields) if fields else 1)),
    ]
    assert len(header) == _HEADER_LINES  # the documented format contract
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt", encoding="utf-8") as f:
        for ln in header:
            f.write(ln + "\n")
        for ln in lines:
            f.write(ln + "\n")
        f.write(f"#close{sep}{close_ts}\n")


def tsv_fixture_path(sf_dir: str) -> str:
    """Cache path of the sf-matched TSV fixture tree, WITHOUT generating —
    single source of truth shared with the oracle-SQL builder."""
    from zeeklog_ray.corpus import _CACHE_ROOT, _sf_n_rows

    return os.path.join(_CACHE_ROOT, f"tsv-v3-n{_sf_n_rows(sf_dir)}")


def tsv_fixture_for_sf_dir(sf_dir: str) -> str:
    """A cached Zeek ``.log.gz`` directory tree carrying EXACTLY the lines of
    the sf-matched tokenized corpus — TWO hour-range files per
    (date, source) (AM/PM split, so the filename hour-bucket column is
    exercised with multiple buckets), empty sources still get header+footer
    files.  Lets the TSV reader be checked against the corpus parse path
    and a DuckDB read_csv oracle."""
    import tempfile

    from zeeklog_ray.corpus import (
        DATES,
        SOURCE_MIX,
        _CACHE_ROOT,
        make_corpus_frame,
        _sf_n_rows,
    )

    n_rows = _sf_n_rows(sf_dir)
    out_dir = tsv_fixture_path(sf_dir)
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    df = make_corpus_frame(n_rows)
    df["line"] = df["tokens"].map(lambda b: b.decode("utf-8"))
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="tsv-", dir=_CACHE_ROOT)
    try:
        for date in DATES:
            for proto, _p in SOURCE_MIX:
                lines = df.loc[(df["date"] == date) & (df["source"] == proto),
                               "line"].tolist()
                half = (len(lines) + 1) // 2
                for rng, chunk in (("00:00:00-11:59:59", lines[:half]),
                                   ("12:00:00-23:59:59", lines[half:])):
                    write_zeek_log_gz(
                        os.path.join(tmp, date, f"{proto}.{rng}.log.gz"),
                        proto, chunk)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok\n")
        try:
            os.rename(tmp, out_dir)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    except BaseException:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out_dir
