"""Multi-host serving/training utilities (SURVEY.md §5.3, §5.8).

Pure-DP sampling needs zero cross-chip communication; what multi-host adds is
(a) per-host input feeding onto the global dp axis, (b) health/barrier
discipline at bench boundaries, (c) utterance-level retry bookkeeping.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def feed_process_local_batch(mesh: Mesh, local_batch: Any) -> Any:
    """Assemble per-host numpy batches into global arrays sharded over the
    mesh's dp axis (jax.make_array_from_process_local_data; SURVEY.md §2.2).
    Single-process: a plain device_put with the dp sharding."""

    def put(x):
        x = np.asarray(x)
        spec = P("dp", *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, local_batch)


def barrier(name: str = "bench") -> None:
    """Cross-host sync at bench boundaries (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


class HostHealth:
    """Heartbeat bookkeeping for the serving fleet (SURVEY.md §5.3): each
    host stamps progress; a coordinator treats a stale stamp as failure and
    resubmits that host's utterances (sampling is stateless per utterance)."""

    def __init__(self, stale_after_s: float = 60.0):
        self.stale_after_s = stale_after_s
        self.last_beat: dict[int, float] = {}

    def beat(self, host_id: Optional[int] = None) -> None:
        self.last_beat[host_id if host_id is not None else jax.process_index()] = (
            time.monotonic())

    def stale_hosts(self) -> list[int]:
        now = time.monotonic()
        return [h for h, t in self.last_beat.items()
                if now - t > self.stale_after_s]


def run_with_retry(fn: Callable[[], Any], max_retries: int = 2,
                   on_failure: Optional[Callable[[Exception], None]] = None) -> Any:
    """Utterance-level retry wrapper: pure-DP work is resubmittable."""
    last: Optional[Exception] = None
    for _ in range(max_retries + 1):
        try:
            return fn()
        except Exception as e:  # pragma: no cover - device-failure path
            last = e
            if on_failure:
                on_failure(e)
    raise RuntimeError(f"failed after {max_retries + 1} attempts") from last
