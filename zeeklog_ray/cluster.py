"""Cluster-introspection helpers shared across stages."""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    """Total cluster CPUs, or ``default`` when Ray is not initialised yet
    (sizing decisions made before ray.init fall back conservatively)."""
    try:
        import ray

        return int(ray.cluster_resources().get("CPU", default))
    except Exception:  # noqa: BLE001 — no Ray session
        return default
