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


    def remove(self, host_id: int) -> None:
        """Forget a host (after its work has been reassigned)."""
        self.last_beat.pop(host_id, None)

    def mark_dead(self, host_id: int) -> None:
        """Force a host stale immediately (used when a stronger death signal
        than a missed heartbeat exists — e.g. the coordinator spawned the
        worker locally and saw its process exit with work pending)."""
        self.last_beat[host_id] = -float("inf")


class FleetCoordinator:
    """Utterance-level work distribution with failure recovery for a pure-DP
    serving fleet (SURVEY.md §5.3): sampling is stateless per utterance, so
    recovering from a dead host is reassignment, not state transfer.

    Transport-agnostic: the caller reports heartbeats however it observes
    them (RPC, shared filesystem, object store) via `observe_beat`, and
    `reap()` returns the work of hosts whose last observed beat is stale —
    the caller resubmits it (typically locally via `run_with_retry`).
    Deliberately NOT built on collectives: a dead process hangs a collective,
    so failure detection must live outside the SPMD layer (the same reason
    the reference has no recovery story to port — SURVEY.md §5.3)."""

    def __init__(self, stale_after_s: float = 30.0):
        self.health = HostHealth(stale_after_s)
        self.assigned: dict[int, set] = {}
        self.done: set = set()
        self.reassigned: list = []

    def assign(self, host_id: int, work_id) -> None:
        self.assigned.setdefault(host_id, set()).add(work_id)
        self.health.beat(host_id)  # assignment implies liveness now

    def observe_beat(self, host_id: int) -> None:
        self.health.beat(host_id)

    def complete(self, host_id: int, work_id) -> None:
        self.assigned.get(host_id, set()).discard(work_id)
        self.done.add(work_id)

    def pending(self) -> set:
        out = set()
        for ids in self.assigned.values():
            out |= ids
        return out

    def reap(self) -> list:
        """Collect the outstanding work of stale hosts and forget them.
        Returns the orphaned work ids (deterministic order) for resubmission."""
        orphans = []
        for h in self.health.stale_hosts():
            orphans.extend(sorted(self.assigned.pop(h, ()), key=repr))
            self.health.remove(h)
        self.reassigned.extend(orphans)
        return orphans


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
