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


# field name → {position → tuple(sources claiming the field there)},
# precomputed once at import.  Grouping claims by position lets one
# ``is_in`` mask serve every source that puts the field at that position
# (e.g. ``uid`` at position 1 for all 20 connection-prefixed sources is ONE
# kernel call, not 20), keeping the per-batch kernel count ≈ the number of
# distinct output columns even with the full 28-protocol registry.
_FIELD_POS_SOURCES: dict[str, dict[int, tuple[str, ...]]] = {}
for _src in KNOWN_SOURCES:
    for _i, _f in enumerate(SOURCE_FIELDS[_src]):
        _FIELD_POS_SOURCES.setdefault(_f, {}).setdefault(_i, ())
for _src in KNOWN_SOURCES:
    for _i, _f in enumerate(SOURCE_FIELDS[_src]):
        _FIELD_POS_SOURCES[_f][_i] = _FIELD_POS_SOURCES[_f][_i] + (_src,)
_MAX_POS = max(len(f) for f in SOURCE_FIELDS.values())
_KNOWN_SET = pa.array(list(KNOWN_SOURCES), type=pa.string())
_N_KNOWN = len(KNOWN_SOURCES)
# source-set cache for is_in value sets (avoid rebuilding Arrow arrays per batch)
_SRCSET_CACHE: dict[tuple[str, ...], pa.Array] = {}


def _srcset(sources: tuple[str, ...]) -> pa.Array:
    arr = _SRCSET_CACHE.get(sources)
    if arr is None:
        arr = _SRCSET_CACHE[sources] = pa.array(list(sources), type=pa.string())
    return arr


def parse_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: decode + split + positional extraction, zero row
    movement.

    Instead of materializing per-source sub-tables (which would copy the
    large ``tokens`` column once per source group), the split positions
    0.._MAX_POS are extracted ONCE over the whole batch and each output
    column is a masked select: ``field = position_j where source == s else
    null``.  Every kernel is a full-batch Arrow op; row order is preserved;
    all input columns (including ``tokens``) pass through untouched.

    Unknown sources get all-null extracted fields and ``sink='none'``
    (quarantine — ZeekProtocol::NONE, zeek_log_proto.rs:40-74).
    """
    n = len(batch)
    source = batch["source"]
    if isinstance(source, pa.ChunkedArray):
        source = source.combine_chunks()
    src_lower = pc.utf8_lower(source)
    known = pc.is_in(src_lower, value_set=_KNOWN_SET)
    sink = pc.if_else(known, src_lower, pa.scalar(UNKNOWN_SINK, pa.string()))

    if n == 0:
        out = batch
        for name in EXTRACTED_COLUMNS:
            out = out.append_column(name, pa.nulls(0, type=pa.string()))
        return out.append_column("sink", pa.array([], type=pa.string()))

    lines = tokens_to_strings(batch["tokens"])
    parts = pc.split_pattern(lines, SEPARATOR)

    # Only the sources actually PRESENT in this batch matter: claims from
    # absent sources are skipped, so a conn/dns-dominated batch pays ~15
    # column kernels, not the full registry's worth.
    present = set(pc.unique(src_lower).to_pylist()) & set(KNOWN_SOURCES)

    # Null-padded positional access, computed lazily per needed position
    # (rows with fewer fields yield NULL — vs the reference's silent
    # zip-truncate, zeek_log.rs:181-188).
    pos_cache: dict[int, pa.Array] = {}

    def pos(i: int) -> pa.Array:
        col = pos_cache.get(i)
        if col is None:
            col = pos_cache[i] = pc.list_flatten(
                pc.list_slice(parts, i, i + 1, return_fixed_size_list=True))
        return col

    null_str = pa.scalar(None, pa.string())
    nulls = pa.nulls(n, type=pa.string())
    out = batch
    for name in EXTRACTED_COLUMNS:
        groups = [(p, tuple(s for s in srcs if s in present))
                  for p, srcs in _FIELD_POS_SOURCES[name].items()]
        groups = [(p, srcs) for p, srcs in groups if srcs]
        if not groups:
            col = nulls
        elif (len(groups) == 1
              and len(_FIELD_POS_SOURCES[name][groups[0][0]]) == _N_KNOWN):
            # claimed by EVERY source at one position (ts): the known mask
            # already is the claim mask
            col = pc.if_else(known, pos(groups[0][0]), null_str)
        else:
            col = nulls
            for p, srcs in groups:
                mask = (pc.equal(src_lower, srcs[0]) if len(srcs) == 1
                        else pc.is_in(src_lower, value_set=_srcset(srcs)))
                col = pc.if_else(mask, pos(p), col)
        out = out.append_column(name, col)
    return out.append_column("sink", sink)
