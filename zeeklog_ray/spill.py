"""Pin-or-spill for twice-consumed pipeline intermediates.

Several pipelines here produce an intermediate Dataset that is consumed
more than once (the LSH banded-rows table feeds both the oversized-bucket
count and the self-join; the prep manifest's ordered scalars feed
pack_assignments' subtotal and shuffle passes).  Without a pin the whole
upstream chain re-executes per consumer (measured 2× wall at 1M docs), so
the default is ``Dataset.materialize()`` — the intermediate lives in the
object store.

At corpus scale that pin is the wrong tool: the banded table is
O(bands × docs) rows (~8·10^12 at a 10^12-doc corpus) and the object
store is not 100 TB.  ``pin_or_spill(..., spill_dir=...)`` swaps the pin
for a Parquet write + re-read under ``spill_dir`` — the intermediate
streams through disk (or an object-store URI at cluster scale), blocks
re-read lazily per consumer, and driver/object-store memory stays flat.
Measured at 1M docs the spill path is within ~1.2× of the pinned path
(BENCH ``scale_near_dup_components_1m_spill``).
"""

from __future__ import annotations

import os
import shutil

import ray.data


def pin_or_spill(ds: "ray.data.Dataset", spill_dir: str | None,
                 name: str) -> "ray.data.Dataset":
    """Pin ``ds`` for multiple consumers: ``materialize()`` when
    ``spill_dir`` is None (object-store pin, the small/medium default),
    else write Parquet under ``spill_dir/name`` and return a lazy
    re-read (the 100-TB path — nothing stays pinned in memory).

    The spill subdirectory is recreated per call: these are scratch
    intermediates keyed to one pipeline run, not resumable outputs."""
    if spill_dir is None:
        return ds.materialize()
    path = os.path.join(spill_dir, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path)
    return ray.data.read_parquet(path)
