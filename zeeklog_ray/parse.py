"""Vectorized Zeek-style field extraction over zero-copy Arrow batches.

The reference parses a log file in two passes — header sniff then a
line-by-line split-on-separator + zip-with-fields scan
(``/root/reference/src/zeek/zeek_log.rs:86-94,156-224``).  Here the record
line lives in the ``tokens`` payload (one int32 per UTF-8 byte), the "header"
is the in-process registry in :mod:`zeeklog_ray.sources`, and the whole batch
is decoded with Arrow kernels — no Python loop over rows:

1. ``tokens`` ``list<int32>`` → one UTF-8 string per row, built directly from
   the list offsets and a uint8 view of the values buffer.
2. ``pyarrow.compute.split_pattern`` on the separator → ``list<string>``.
3. per ``source`` group, positional zip with the registry's field list via
   ``pc.list_element`` (the Arrow analog of the reference's
   ``zip(fields, data)`` at ``zeek_log.rs:179-188``).

Row-alignment semantics: rows shorter than the field list yield NULL for the
missing trailing fields (the reference's ``zip`` silently truncates instead —
SURVEY.md §1.3 flags that as a quirk, and the rebuild pads with null as the
intended relational behavior).

The ``tokens`` column is passed through untouched (per-row invariant:
token-array equality per ``doc_id``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from zeeklog_ray.sources import (
    EXTRACTED_COLUMNS,
    KNOWN_SOURCES,
    SEPARATOR,
    SOURCE_FIELDS,
    UNKNOWN_SINK,
)


def tokens_to_strings(tokens: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Decode a ``list<int32>`` byte-code column into a string array.

    Uses the list offsets verbatim and a uint8 cast of the values buffer —
    one vectorized narrowing cast, no per-row work.
    """
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    # flatten() respects slicing offsets, so rebuild offsets from lengths.
    lengths = pc.list_value_length(tokens).to_numpy(zero_copy_only=False)
    offsets = np.zeros(len(tokens) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    values = tokens.flatten().to_numpy(zero_copy_only=False).astype(np.uint8)
    return pa.StringArray.from_buffers(
        len(tokens),
        pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(values.tobytes()),
    )


def _extract_for_source(sub: pa.Table, parts: pa.Array, source: str) -> pa.Table:
    """Zip one source group's split lines with its registry field list,
    emitting the unified extracted-column schema (missing fields → null)."""
    n = len(sub)
    fields = SOURCE_FIELDS.get(source)
    out_cols: dict[str, pa.Array] = {}
    if fields is None:  # unknown source → quarantine, nothing extracted
        for name in EXTRACTED_COLUMNS:
            out_cols[name] = pa.nulls(n, type=pa.string())
        sink = UNKNOWN_SINK
    else:
        for i, name in enumerate(fields):
            # Null-padded positional access: rows whose line has fewer than
            # i+1 fields yield NULL (vs the reference's silent zip-truncate,
            # zeek_log.rs:181-188 — see module docstring).
            out_cols[name] = pc.list_flatten(
                pc.list_slice(parts, i, i + 1, return_fixed_size_list=True))
        for name in EXTRACTED_COLUMNS:
            if name not in out_cols:
                out_cols[name] = pa.nulls(n, type=pa.string())
        sink = source
    arrays = [sub[c] for c in sub.column_names]
    names = list(sub.column_names)
    for name in EXTRACTED_COLUMNS:
        names.append(name)
        arrays.append(out_cols[name])
    names.append("sink")
    arrays.append(pa.array([sink] * n, type=pa.string()))
    return pa.table(dict(zip(names, arrays)))


def parse_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: decode + split + per-source positional extraction.

    Input columns: at least (doc_id, tokens, n_tok, source); all input
    columns pass through unchanged, extracted string columns and ``sink``
    are appended.  Rows of a batch may mix sources; each source group is
    extracted with its own field list and the groups are concatenated
    (row order within a batch is not significant — set semantics,
    SURVEY.md §7.3).
    """
    if len(batch) == 0:
        return _extract_for_source(batch, pa.array([], type=pa.list_(pa.string())), "conn")
    lines = tokens_to_strings(batch["tokens"])
    parts = pc.split_pattern(lines, SEPARATOR)

    source = batch["source"]
    distinct = pc.unique(source.combine_chunks()
                         if isinstance(source, pa.ChunkedArray) else source).to_pylist()
    pieces = []
    for src in distinct:
        mask = pc.equal(source, src)
        idx = pc.indices_nonzero(mask)
        sub = batch.take(idx)
        sub_parts = parts.take(idx)
        key = src.lower()
        pieces.append(_extract_for_source(sub, sub_parts,
                                          key if key in KNOWN_SOURCES else src))
    return pa.concat_tables(pieces)
