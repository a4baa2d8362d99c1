"""Per-source record schemas — the engine's "header registry".

The reference derives each file's column list from the ``#fields`` header line
of the Zeek TSV file and its separator from ``#separator``
(``/root/reference/src/zeek/zeek_log.rs:104-117,131-146``); the protocol enum
(``zeek_log_proto.rs:40-108``, 28 variants, case-insensitive, unknown → NONE)
doubles as the router's sink list.

Here that metadata lives in a small in-process registry: one entry per
``source`` value with the ordered field list used to interpret the TSV line
encoded in the ``tokens`` payload.  The registry is tiny and deterministic, so
it is rebuilt per worker process (module import) instead of being re-derived
per file like the reference's two-pass header sniff
(``zeek_log.rs:86-94,156-160``).

Field names are flattened to identifier-safe form (``id.orig_h`` →
``id_orig_h``) for Parquet/SQL friendliness; all extracted values are strings,
faithful to the reference's untyped cells (``zeek_log.rs:147-149,186``).
"""

from __future__ import annotations

SEPARATOR = "\t"  # reference: '#separator \x09' (zeek_log.rs:104-117)

# Unset-field marker, kept as a literal string exactly like the reference
# (zeek_log.rs never interprets '-', SURVEY.md §1.2).
UNSET = "-"

# Ordered per-source field lists (FIXTURES.md §3; subsets of the public Zeek
# conn/dns/http/weird field sets).  The first six fields are shared.
COMMON_FIELDS = ["ts", "uid", "id_orig_h", "id_orig_p", "id_resp_h", "id_resp_p"]

SOURCE_FIELDS: dict[str, list[str]] = {
    "conn": COMMON_FIELDS + ["proto", "service", "duration", "orig_bytes"],
    "dns": COMMON_FIELDS + ["query", "qtype_name", "rcode_name"],
    "http": COMMON_FIELDS + ["method", "host", "uri", "status_code", "user_agent"],
    "weird": COMMON_FIELDS + ["name", "notice"],
}

KNOWN_SOURCES = tuple(sorted(SOURCE_FIELDS))  # conn, dns, http, weird

# Sink for rows whose source is not in the registry — the quarantine route,
# mirroring ZeekProtocol::NONE files being skipped (zeek_log.rs:385,401);
# we quarantine instead of dropping so no data is silently lost.
UNKNOWN_SINK = "none"

# Union of every extracted column, in deterministic order: common fields
# first, then each source's extras in source-name order.
EXTRACTED_COLUMNS: list[str] = list(COMMON_FIELDS)
for _src in KNOWN_SOURCES:
    for _f in SOURCE_FIELDS[_src]:
        if _f not in EXTRACTED_COLUMNS:
            EXTRACTED_COLUMNS.append(_f)


def normalize_source(name: str) -> str:
    """Case-insensitive source lookup; unknown → ``UNKNOWN_SINK``.

    Mirrors ``ZeekProtocol::read`` (zeek_log_proto.rs:40-74): names are
    matched case-insensitively and anything unrecognized maps to the
    quarantine sink.
    """
    s = name.lower()
    return s if s in SOURCE_FIELDS else UNKNOWN_SINK
