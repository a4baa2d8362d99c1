"""Per-source record schemas — the engine's "header registry".

The reference derives each file's column list from the ``#fields`` header line
of the Zeek TSV file and its separator from ``#separator``
(``/root/reference/src/zeek/zeek_log.rs:104-117,131-146``); the protocol enum
(``zeek_log_proto.rs:7-35``, 28 variants, case-insensitive, unknown → NONE)
doubles as the router's sink list.

Here that metadata lives in a small in-process registry: one entry per
``source`` value — ALL 28 protocols of the reference enum — with the ordered
field list used to interpret the TSV line encoded in the ``tokens`` payload.
The field lists are subsets of the public Zeek log schemas (conn.log,
dns.log, ssl.log, files.log, …): connection-oriented logs share the standard
``ts uid id.orig_h id.orig_p id.resp_h id.resp_p`` prefix; host/file-oriented
logs (files, x509, pe, known, software, capture_loss, reporter, traceroute)
carry only ``ts`` plus their own fields, as in real Zeek.  The registry is
tiny and deterministic, so it is rebuilt per worker process (module import)
instead of being re-derived per file like the reference's two-pass header
sniff (``zeek_log.rs:86-94,156-160``).

Field names are flattened to identifier-safe form (``id.orig_h`` →
``id_orig_h``) for Parquet/SQL friendliness; all extracted values are strings,
faithful to the reference's untyped cells (``zeek_log.rs:147-149,186``).
"""

from __future__ import annotations

SEPARATOR = "\t"  # reference: '#separator \x09' (zeek_log.rs:104-117)

# Unset-field marker, kept as a literal string exactly like the reference
# (zeek_log.rs never interprets '-', SURVEY.md §1.2).
UNSET = "-"

# Standard connection 6-tuple prefix shared by connection-oriented logs.
COMMON_FIELDS = ["ts", "uid", "id_orig_h", "id_orig_p", "id_resp_h", "id_resp_p"]

# Ordered per-source field lists.  One entry per reference protocol
# (zeek_log_proto.rs:7-35); extras are subsets of the public Zeek schemas.
SOURCE_FIELDS: dict[str, list[str]] = {
    # ---- connection-oriented (COMMON_FIELDS prefix) ----
    "conn": COMMON_FIELDS + ["proto", "service", "duration", "orig_bytes"],
    "dns": COMMON_FIELDS + ["query", "qtype_name", "rcode_name"],
    "http": COMMON_FIELDS + ["method", "host", "uri", "status_code", "user_agent"],
    "weird": COMMON_FIELDS + ["name", "notice"],
    "ssl": COMMON_FIELDS + ["version", "cipher", "server_name", "established"],
    "ssh": COMMON_FIELDS + ["version", "auth_success", "client", "server"],
    "ftp": COMMON_FIELDS + ["user", "command", "arg", "reply_code"],
    "smtp": COMMON_FIELDS + ["mailfrom", "rcptto", "subject"],
    "dhcp": COMMON_FIELDS + ["mac", "host_name", "assigned_addr", "lease_time"],
    "ntp": COMMON_FIELDS + ["version", "mode", "stratum"],
    "smb": COMMON_FIELDS + ["command", "path", "service"],
    "irc": COMMON_FIELDS + ["nick", "user", "command"],
    "rdp": COMMON_FIELDS + ["cookie", "result", "security_protocol"],
    "ldap": COMMON_FIELDS + ["message_id", "opcode", "result"],
    "quic": COMMON_FIELDS + ["version", "server_name", "client_initial"],
    "tunnel": COMMON_FIELDS + ["tunnel_type", "action"],
    "dpd": COMMON_FIELDS + ["proto", "analyzer", "failure_reason"],
    "snmp": COMMON_FIELDS + ["duration", "version", "community"],
    "sip": COMMON_FIELDS + ["method", "uri", "response_from", "status_code"],
    "notice": COMMON_FIELDS + ["note", "msg", "actions"],
    # ---- host/file-oriented (ts-only prefix, like real Zeek) ----
    "files": ["ts", "fuid", "tx_hosts", "rx_hosts", "mime_type",
              "md5", "sha1", "sha256", "total_bytes"],
    "x509": ["ts", "fingerprint", "certificate_version",
             "certificate_subject", "certificate_issuer"],
    "pe": ["ts", "fuid", "machine", "os", "subsystem"],
    "known": ["ts", "host", "port_num", "service"],
    "software": ["ts", "host", "software_type", "name", "version"],
    "capture_loss": ["ts", "ts_delta", "peer", "gaps", "acks", "percent_lost"],
    "reporter": ["ts", "level", "message", "location"],
    "traceroute": ["ts", "src", "dst", "proto"],
}

KNOWN_SOURCES = tuple(sorted(SOURCE_FIELDS))  # 28 protocols
assert len(KNOWN_SOURCES) == 28

# Sources whose records carry the connection 6-tuple prefix (the rest are
# ts-prefixed host/file logs).
CONN_PREFIXED = tuple(s for s in KNOWN_SOURCES
                      if SOURCE_FIELDS[s][:6] == COMMON_FIELDS)

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


def sink_schemas(enrich: bool = False) -> dict[str, list[str]]:
    """Per-sink routed-output column lists — the machine-readable schema
    registry a downstream consumer needs to read the ``sink=*`` Parquet
    partitions without sniffing files.

    Derived from the same constants the writer prunes with
    (``flagship.FusedRouteWriter.drop_for_sink``): each sink keeps the
    payload base columns, then its OWN registry fields in parsed-schema
    order (= ``EXTRACTED_COLUMNS`` order, NOT ``SOURCE_FIELDS`` order —
    the writer drops columns from the full parsed table, it never
    reorders), then — when the enrichment stage ran — the 12 ``geo_*``
    columns plus ``service_name``.  ``sink`` itself is never a file
    column (it is the ``sink=*`` directory name), and the quarantine
    sink keeps only the base payload.  Truthfulness is pinned by
    ``tests/test_flagship.py::test_sink_schema_registry_matches_output``.
    """
    from zeeklog_ray.enrich import GEO_FIELDS

    base = ["doc_id", "tokens", "n_tok", "source", "date"]
    extra = list(GEO_FIELDS) + ["service_name"] if enrich else []
    out = {
        s: base + [c for c in EXTRACTED_COLUMNS if c in set(SOURCE_FIELDS[s])]
           + extra
        for s in KNOWN_SOURCES
    }
    out[UNKNOWN_SINK] = base + extra
    return out
