"""Pipeline construction: the query surface and the composed Dataset plan.

:class:`PipelineConfig` mirrors the reference's builder-pattern query API
``ZeekSearchParamsBuilder::default().path_prefix(..).selected_date(..)
.src_ip(..).build()`` (``/root/reference/src/zeek/zeek_search_params.rs:12-33``)
and its plan selector ``check()`` which maps the presence of
(src_ip, proto_type, end_date) to a plan code with bit weights src_ip=4,
proto=2, end_date=1 (``zeek_search_params.rs:38-57``).  The reference
implements only plans 0 (scan-all) and 4 (ip-filter) — everything else reads
nothing (``zeek_log.rs:222``); the rebuild implements the full 8-plan matrix
as composed Dataset operators (SURVEY.md §2.2 F3).

Physical plan shape (SURVEY.md §3 "Rebuild lifecycle")::

    read_parquet(corpus, date-partition filter, column prune)
      → map_batches(parse_batch, pyarrow, zero-copy)     # stateless tasks
      → [row predicate: src_ip]                          # vectorized mask
      → [map_batches(Enricher, concurrency=pool)]        # actor pool
      → write_parquet(partition_cols=['sink'])           # fan-out router
      / grouped_stats / distinct summary                 # small shuffles

Filter semantics: the src_ip predicate is ROW-level ("any address field
equals ip"), the clearly-intended relational semantics of the reference's
cell-wise filter (``zeek_log.rs:206-218``; SURVEY.md §1.3, §7.4) — it
reproduces the reference's observable present/absent behavior on the golden
IPs (``tests/zeek_search.rs:189-216``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow.compute as pc
import ray.data

from zeeklog_ray.enrich import Enricher
from zeeklog_ray.parse import parse_batch
from zeeklog_ray.sources import normalize_source

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


class SearchInvalidStartDate(ValueError):
    """Mirror of the reference's Error::SearchInvalidStartDate
    (zeek_log.rs:367-371): the requested date partition does not exist /
    is malformed."""


@dataclass
class PipelineConfig:
    """Query parameters — the rebuild's ``ZeekSearchParams``.

    All fields optional, like the reference builder; ``plan()`` returns the
    same bit code as ``ZeekSearchParams::check()``
    (zeek_search_params.rs:38-57).
    """

    corpus_dir: str = ""
    start_date: str | None = None   # reference: selected_date
    end_date: str | None = None
    src_ip: str | None = None
    source: str | None = None       # reference: proto_type (case-insensitive)
    enrich: bool = False
    # None → autoscale the actor pool to ~3/4 of cluster CPUs (leaves slots
    # for the read and write stages so no stage starves — SURVEY.md §4).
    enrich_concurrency: tuple[int, int] | None = None
    parse_batch_size: int | None = None  # None → whole blocks, no rebatch copy
    extra_columns: list[str] = field(default_factory=list)

    def plan(self) -> int:
        """Bit weights: src_ip=4, source(proto)=2, end_date=1."""
        code = 0
        if self.src_ip:
            code += 4
        if self.source:
            code += 2
        if self.end_date:
            code += 1
        return code

    def validate(self) -> None:
        for d in (self.start_date, self.end_date):
            if d is not None and not _DATE_RE.match(d):
                # reference: check_date_format (zeek_search_params.rs:96-123)
                raise SearchInvalidStartDate(f"bad date: {d!r}")
        if self.start_date and self.end_date and self.end_date < self.start_date:
            raise SearchInvalidStartDate("end_date before start_date")


def _date_dirs(cfg: PipelineConfig) -> list[str]:
    """Resolve the date partition directories to read — PATH-level pruning.

    The date range never touches row data: it selects ``date=YYYY-MM-DD/``
    directories, exactly the reference's date-directory resolution before
    reading (zeek_log.rs:367-383).  A requested start date with no matching
    directory raises :class:`SearchInvalidStartDate`, mirroring the
    reference's error path (zeek_log.rs:367-371).
    """
    import glob
    import os

    def files(d: str) -> list[str]:
        return sorted(glob.glob(os.path.join(d, "*.parquet")))

    if not os.path.isdir(cfg.corpus_dir):
        # reference: missing base/date dir → SearchInvalidStartDate
        raise SearchInvalidStartDate(f"corpus dir not found: {cfg.corpus_dir!r}")
    all_dirs = sorted(glob.glob(os.path.join(cfg.corpus_dir, "date=*")))
    if not all_dirs:  # unpartitioned corpus — read as-is
        return [cfg.corpus_dir]
    if not cfg.start_date:
        if cfg.end_date:  # plan 1: everything up to and including end_date
            return [f for d in all_dirs
                    if os.path.basename(d).removeprefix("date=") <= cfg.end_date
                    for f in files(d)]
        return [f for d in all_dirs for f in files(d)]
    dates = {os.path.basename(d).removeprefix("date="): d for d in all_dirs}
    if cfg.start_date not in dates:
        raise SearchInvalidStartDate(f"no partition for {cfg.start_date!r}")
    if not cfg.end_date:
        return files(dates[cfg.start_date])
    return [f for k, d in sorted(dates.items())
            if cfg.start_date <= k <= cfg.end_date for f in files(d)]


def read_corpus(cfg: PipelineConfig) -> "ray.data.Dataset":
    """Read the corpus with date pruning at the path level and the source
    predicate pushed into the Parquet scan (row-group pruning)."""
    cfg.validate()
    flt = None
    if cfg.source:
        flt = pc.field("source") == normalize_source(cfg.source)
    return ray.data.read_parquet(_date_dirs(cfg), filter=flt)


def _ip_predicate(ip: str):
    def keep(batch):
        mask = pc.or_kleene(
            pc.equal(batch["id_orig_h"], ip),
            pc.equal(batch["id_resp_h"], ip),
        )
        mask = pc.fill_null(mask, False)
        return batch.filter(mask)

    return keep


def build_dataset(cfg: PipelineConfig) -> "ray.data.Dataset":
    """Compose the lazy plan: read → parse → [ip filter] → [enrich].

    Returns a streaming Dataset; callers consume it with
    ``write_parquet`` (routed sinks), :func:`zeeklog_ray.aggregate.grouped_stats`,
    or a small ``take``/``to_pandas`` in tests.
    """
    ds = read_corpus(cfg)
    ds = ds.map_batches(parse_batch, batch_format="pyarrow",
                        batch_size=cfg.parse_batch_size, zero_copy_batch=True)
    if cfg.src_ip:
        ds = ds.map_batches(_ip_predicate(cfg.src_ip), batch_format="pyarrow",
                            zero_copy_batch=True)
    if cfg.enrich:
        conc = cfg.enrich_concurrency or _default_pool_size()
        ds = ds.map_batches(Enricher, batch_format="pyarrow",
                            batch_size=cfg.parse_batch_size,
                            concurrency=conc)
    return ds


def _default_pool_size() -> tuple[int, int]:
    """Autoscaling enrichment-pool bounds: min 1 (never pre-reserve CPUs the
    read stage needs — on tiny clusters a min of 2 starves the reader and
    stalls the pipeline), max ≈ 3/4 of CPUs but always leaving at least one
    CPU for the read/write stages."""
    from zeeklog_ray.cluster import cluster_cpus

    cpus = cluster_cpus()
    return (1, max(1, min(cpus - 1, (cpus * 3) // 4)))


def route_to_sinks(ds: "ray.data.Dataset", out_dir: str,
                   min_rows_per_file: int = 100_000,
                   compression: str | None = None) -> None:
    """Fan-out router: one Parquet partition directory per sink.

    ``write_parquet(partition_cols=['sink'])`` writes ``sink=<s>/`` dirs —
    the Ray-native analog of the reference's per-protocol grouping
    (zeek_log_proto.rs enum as sink list, SURVEY.md §2.1 S4/S5).  Unknown
    sources land in ``sink=none/`` (quarantine, not dropped).

    ``min_rows_per_file`` keeps output files coarse: without it each write
    task emits one file per block per sink and downstream readers pay a
    per-file task cost (505 tiny files for a 4M-row run — measured 20×
    slower to re-read at low parallelism).

    ``compression`` passes through to the Parquet writer (``'zstd'`` /
    ``'snappy'`` / ``'gzip'``; None = Arrow default snappy).  At 100 TB
    the storage footprint, not the CPU, is usually the binding constraint
    — zstd roughly halves routed-output bytes for token payloads at a
    modest encode cost, and the READ side needs no flag (codec is
    per-file metadata, so zstd and snappy outputs mix freely in one
    corpus)."""
    kwargs = {"compression": compression} if compression else {}
    ds.write_parquet(out_dir, partition_cols=["sink"],
                     min_rows_per_file=min_rows_per_file, **kwargs)
