"""Stateful enrichment: actor-pool broadcast-dictionary lookups.

The reference enriches each distinct source IP by HTTP-GETting an
ip2location API under a global mutex — one OS thread per IP, lock held across
the blocking request, effective concurrency ≈ 1
(``/root/reference/src/zeek/zeek_log.rs:416-458``,
``/root/reference/src/ip2location.rs:174-222``).  Its commented-out
``noquery`` path (``ip2location.rs:176-206``) reads the same 12-field record
from a local ``ip2loc.db`` cache — that offline-dictionary design is what
this module implements properly:

* the dictionaries are small, deterministic sidecar tables (FIXTURES.md §4);
* an :class:`Enricher` **callable class** is passed to ``map_batches`` so Ray
  runs it as an actor pool — dict build happens once per actor in
  ``__init__``, lookups are vectorized ``np.searchsorted`` per batch;
* misses are left-outer NULLs, mirroring the reference's silent-miss path
  (``zeek_log.rs:439-447``).

At cluster scale the dicts would be ``ray.put`` once on the driver and the
object ref handed to the actor constructor; they are rebuilt deterministically
in-process here because they are tiny (<10 KB) and the sandbox is single-node.
"""

from __future__ import annotations

import pyarrow as pa

from zeeklog_ray.corpus import IP_POOL

# Geo record fields — the 12 optional string fields of IP2LocationResponse
# (/root/reference/src/ip2location.rs:10-24), flattened to geo_* columns.
GEO_FIELDS = [
    "geo_country_code", "geo_country_name", "geo_region_name", "geo_city_name",
    "geo_latitude", "geo_longitude", "geo_zip_code", "geo_time_zone",
    "geo_asn", "geo_as_name", "geo_is_proxy",
]

_COUNTRIES = [("US", "United States"), ("DE", "Germany"), ("JP", "Japan"),
              ("BR", "Brazil"), ("NL", "Netherlands"), ("SG", "Singapore")]

# Port → service name (stand-in for a service registry; keyed by the
# extracted id_resp_p column).
SERVICE_DICT = {"53": "dns", "80": "http", "443": "https", "22": "ssh", "123": "ntp"}


def build_geo_dict() -> dict[str, dict[str, str]]:
    """Deterministic geo dictionary covering 24 of the 32 pool IPs (~75%),
    so left-outer misses are exercised (FIXTURES.md §4)."""
    out: dict[str, dict[str, str]] = {}
    for i, ip in enumerate(IP_POOL):
        if i % 4 == 3:  # every 4th pool IP is a miss
            continue
        cc, cn = _COUNTRIES[i % len(_COUNTRIES)]
        out[ip] = {
            "geo_country_code": cc,
            "geo_country_name": cn,
            "geo_region_name": f"region-{i % 7}",
            "geo_city_name": f"city-{i}",
            "geo_latitude": f"{(i * 7.13) % 180 - 90:.4f}",
            "geo_longitude": f"{(i * 13.7) % 360 - 180:.4f}",
            "geo_zip_code": f"{10000 + i * 37}",
            "geo_time_zone": f"+{i % 12:02d}:00",
            "geo_asn": str(64512 + i),
            "geo_as_name": f"AS-EXAMPLE-{i}",
            "geo_is_proxy": "true" if i % 5 == 0 else "false",
        }
    return out


class LiveLookupEnricher:
    """The live-enrichment SEAM: an :class:`Enricher`-compatible actor-pool
    stage whose geo source is a user-supplied ``resolver(ip) -> dict |
    None`` callable — where the reference's blocking HTTP ip2location
    client (``ip2location.rs:174-222``, one GET per IP under a global
    mutex) would plug in, redesigned for a cluster:

    * per batch, only the batch's DISTINCT not-yet-seen IPs are resolved
      (the actor memoizes hits AND misses for its lifetime, so a hot IP is
      fetched once per actor, not once per row);
    * each lookup gets ``max_retries`` bounded retries with exponential
      backoff (``backoff_s * 2**attempt``) — a transient failure never
      kills the job, a persistent one raises with the cause chained;
    * effective request rate is bounded by pool size × in-flight batches —
      size ``concurrency`` to the remote service's rate limit.

    Usage::

        ds.map_batches(LiveLookupEnricher, batch_format="pyarrow",
                       fn_constructor_kwargs={"resolver": my_client},
                       concurrency=(1, 4))

    The resolver must be picklable (module-level function or callable
    class).  Offline/deterministic pipelines should keep using
    :class:`Enricher`; this class exists so a real network source drops in
    without touching pipeline code.
    """

    def __init__(self, resolver, max_retries: int = 3,
                 backoff_s: float = 0.05, ip_col: str = "id_orig_h") -> None:
        self._resolver = resolver
        self._max_retries = max_retries
        self._backoff_s = backoff_s
        self._ip_col = ip_col
        self._cache: dict[str, dict[str, str] | None] = {}

    def _resolve(self, ip: str):
        import time

        last: Exception | None = None
        for attempt in range(self._max_retries + 1):
            try:
                return self._resolver(ip)
            except Exception as e:  # noqa: BLE001 — resolver is user code
                last = e
                if attempt < self._max_retries:
                    time.sleep(self._backoff_s * (2 ** attempt))
        raise RuntimeError(
            f"geo lookup for {ip!r} failed after {self._max_retries + 1} "
            "attempts") from last

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if len(batch) == 0 or self._ip_col not in batch.column_names:
            return batch
        uniq = [ip for ip in pc.unique(batch[self._ip_col]).to_pylist()
                if ip is not None]
        for ip in uniq:
            if ip not in self._cache:
                self._cache[ip] = self._resolve(ip)
        # project the lookup arrays from the BATCH's distinct IPs only —
        # iterating the whole cache here would cost O(|cache|) per batch
        # on a long-lived actor (the memoization's own win reversed)
        hits = sorted(ip for ip in uniq if self._cache[ip] is not None)
        gidx = pc.index_in(batch[self._ip_col],
                           value_set=pa.array(hits, type=pa.string()))
        if isinstance(gidx, pa.ChunkedArray):
            gidx = gidx.combine_chunks()
        for f in GEO_FIELDS:
            vals = pa.array([self._cache[k].get(f) for k in hits],
                            type=pa.string())
            batch = batch.append_column(f, vals.take(gidx))
        return batch


def lookup_ip(ip: str,
              geo: dict[str, dict[str, str]] | None = None) -> dict[str, str] | None:
    """Direct enrichment-source lookup — the reference's E3 entry point
    (``main.rs:250-268``): given only an IP, skip log scanning entirely and
    query the geo source, rendering the 12-field record; a miss renders an
    empty report (→ ``None`` here)."""
    return (geo if geo is not None else build_geo_dict()).get(ip)


class Enricher:
    """Actor-pool stage: append geo_* (by ``id_orig_h``) and ``service``
    (by ``id_resp_p``) columns via broadcast-dict lookup.

    Usage::

        ds.map_batches(Enricher, batch_format="pyarrow",
                       batch_size=32768, concurrency=(2, 8))

    State (sorted key arrays + value matrices) is built once per actor;
    per-batch work is two vectorized searchsorted lookups.
    """

    def __init__(self) -> None:
        import pyarrow.compute as pc  # noqa: F401 — ensure kernels loaded once

        geo = build_geo_dict()
        keys = sorted(geo)
        self._geo_keys = pa.array(keys, type=pa.string())
        self._geo_vals = {
            f: pa.array([geo[k][f] for k in keys], type=pa.string())
            for f in GEO_FIELDS
        }
        svc_keys = sorted(SERVICE_DICT)
        self._svc_keys = pa.array(svc_keys, type=pa.string())
        self._svc_vals = pa.array([SERVICE_DICT[k] for k in svc_keys],
                                  type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if len(batch) == 0 or "id_orig_h" not in batch.column_names:
            return batch
        # index_in → null index on miss; take propagates null → left-outer
        # semantics entirely in Arrow kernels (no Python per-row work).
        gidx = pc.index_in(batch["id_orig_h"], value_set=self._geo_keys)
        if isinstance(gidx, pa.ChunkedArray):
            gidx = gidx.combine_chunks()
        for f in GEO_FIELDS:
            batch = batch.append_column(f, self._geo_vals[f].take(gidx))
        sidx = pc.index_in(batch["id_resp_p"], value_set=self._svc_keys)
        if isinstance(sidx, pa.ChunkedArray):
            sidx = sidx.combine_chunks()
        batch = batch.append_column("service_name", self._svc_vals.take(sidx))
        return batch


# --------------------------------------------------------------------------
# CIDR-range enrichment (the shape real IP2Location data actually has)
# --------------------------------------------------------------------------


def ip_to_int(ips: "pd.Series") -> "np.ndarray":
    """Dotted-quad → int64 (a.b.c.d → a·2^24 + b·2^16 + c·2^8 + d),
    vectorized via one split-expand; any value that is not a clean
    4-octet quad (empty string, hostname, IPv6, null) yields -1 — a
    sentinel below every valid address, so range lookups treat it as a
    MISS instead of crashing the batch (the Enricher silent-miss
    contract; ADVICE r4).  Matches the SQL replay
    ``split_part(ip,'.',k)::BIGINT`` arithmetic exactly on valid quads."""
    import numpy as np
    import pandas as pd

    parts = ips.str.split(".", expand=True)
    if parts.shape[1] != 4:
        # no value in the batch had 4 dot-parts — pad to keep shape
        for i in range(parts.shape[1], 4):
            parts[i] = None
    cols = [pd.to_numeric(parts[i], errors="coerce") for i in range(4)]
    # a 5+-octet string puts text in a 5th column; treat it as malformed
    extra_bad = parts[4].notna() if parts.shape[1] > 4 else False
    bad = (cols[0].isna() | cols[1].isna() | cols[2].isna() | cols[3].isna()
           | extra_bad)
    out = (cols[0].fillna(0).to_numpy(dtype="int64") * 16_777_216
           + cols[1].fillna(0).to_numpy(dtype="int64") * 65_536
           + cols[2].fillna(0).to_numpy(dtype="int64") * 256
           + cols[3].fillna(0).to_numpy(dtype="int64"))
    out[np.asarray(bad)] = -1
    return out


def build_geo_ranges() -> "pd.DataFrame":
    """Deterministic /24-block range table derived from the exact-IP geo
    dict: one (lo, hi, geo_country_code, geo_asn) row per distinct /24
    containing a covered pool IP; when several covered IPs share a /24,
    the numerically lowest one's attributes win (deterministic).  Sorted
    by ``lo``, non-overlapping by construction (/24s are disjoint)."""
    import pandas as pd

    geo = build_geo_dict()
    ips = pd.Series(sorted(geo))
    nums = ip_to_int(ips)
    rows: dict[int, tuple] = {}
    for ip, num in sorted(zip(ips, nums), key=lambda t: t[1]):
        lo = int(num) & ~0xFF
        if lo not in rows:
            rec = geo[ip]
            rows[lo] = (lo, lo + 255, rec["geo_country_code"],
                        rec["geo_asn"])
    out = pd.DataFrame(sorted(rows.values()),
                       columns=["lo", "hi", "geo_country_code", "geo_asn"])
    return out.astype({"lo": "int64", "hi": "int64"})


def broadcast_range_lookup(ds: "ray.data.Dataset", ip_col: str,
                           ranges: "pd.DataFrame",
                           attach: list[str]) -> "ray.data.Dataset":
    """Left-outer RANGE lookup against a broadcast interval table: attach
    ``attach`` columns of the (sorted, non-overlapping) ``ranges`` row
    whose ``[lo, hi]`` contains the integer form of ``ip_col``; misses
    get NULLs (the Enricher silent-miss contract).

    The interval table rides ``ray.put`` ONCE and every batch resolves
    containment with a single ``np.searchsorted`` against the ``lo``
    bounds — row-local, zero shuffle, the correct shape for the
    million-range tables real CIDR databases have (a shuffle join on
    range membership has no equi-key at all).  Rows with null IPs miss.
    """
    import numpy as np
    import pandas as pd

    import ray as _ray

    r = ranges.sort_values("lo").reset_index(drop=True)
    if (r["lo"].to_numpy()[1:] <= r["hi"].to_numpy()[:-1]).any():
        raise ValueError("broadcast_range_lookup: ranges overlap")
    ref = _ray.put((r["lo"].to_numpy(), r["hi"].to_numpy(),
                    {c: r[c].to_numpy() for c in attach}))

    def look(batch: pd.DataFrame) -> pd.DataFrame:
        los, his, cols = _ray.get(ref)
        n = len(batch)
        ok = np.zeros(n, dtype=bool)
        idx = np.zeros(n, dtype=np.int64)
        valid = batch[ip_col].notna().to_numpy()
        if valid.any() and len(los):
            nums = ip_to_int(batch.loc[valid, ip_col].astype(str))
            i = np.searchsorted(los, nums, side="right") - 1
            hit = (i >= 0) & (nums <= his[np.maximum(i, 0)])
            ok[np.flatnonzero(valid)[hit]] = True
            idx[np.flatnonzero(valid)[hit]] = i[hit]
        for c in attach:
            vals = cols[c][idx].astype(object)
            vals[~ok] = None
            batch[c] = vals
        return batch

    return ds.map_batches(look, batch_format="pandas", batch_size=None)
