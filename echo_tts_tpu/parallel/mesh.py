"""Device mesh construction (net-new vs the single-GPU reference; SURVEY.md
§2.2, §5.8).

Axes: "dp" — independent utterances (sampling is psum-free across dp);
"tp" — Megatron-style sharding of attention heads / MLP columns over ICI,
an escape hatch for HBM headroom (the 2.38B bf16 model fits one chip).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from echo_tts_tpu.core.config import MeshConfig


def make_mesh(mc: MeshConfig, devices: Optional[list] = None) -> jax.sharding.Mesh:
    devices = devices if devices is not None else jax.devices()
    n = mc.dp * mc.tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    devs = np.asarray(devices[:n]).reshape(mc.dp, mc.tp)
    return jax.sharding.Mesh(devs, ("dp", "tp"))


def auto_mesh_config(n_devices: int, max_tp: int = 2) -> MeshConfig:
    """Prefer DP (zero-communication sampling); use a small TP factor when it
    divides the device count."""
    tp = 1
    for cand in range(min(max_tp, n_devices), 0, -1):
        if n_devices % cand == 0:
            tp = cand
            break
    return MeshConfig(dp=n_devices // tp, tp=tp)


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host runtime bring-up (SURVEY.md §5.8): ICI within a slice, DCN
    across slices. No-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
