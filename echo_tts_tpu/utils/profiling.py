"""Tracing / profiling / observability (SURVEY.md §5.1, §5.5).

The reference's only instrumentation is a wall-clock delta in the UI
(reference: gradio_app.py:279,383-384). Here:
  * PhaseTimer — per-phase wall timers (encode / kv-build / sampler / vocoder)
    with JSON export,
  * trace() — jax.profiler capture to a TensorBoard/Perfetto trace dir,
  * speed_of_light() — analytic per-step floor from MXU FLOPs + HBM bytes,
    the utilization denominator for bench reporting,
  * metrics_line() — one-line JSON metrics for log scraping; multi-host
    aggregation via process_allgather.
"""
from __future__ import annotations

import contextlib
import json
import logging
import time
from typing import Dict

import jax

from echo_tts_tpu.core.config import DiTConfig

log = logging.getLogger("echo_tts_tpu")


class PhaseTimer:
    def __init__(self):
        self.phases: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def as_dict(self) -> Dict[str, float]:
        return {k: round(v, 5) for k, v in self.phases.items()}

    def json(self) -> str:
        return json.dumps(self.as_dict())


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# v5e (lite) per-chip envelopes; override for other generations.
TPU_SPECS = {
    "v5e": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "v6e": {"bf16_tflops": 918.0, "hbm_gbps": 1640.0},
}


def dit_step_flops(cfg: DiTConfig, batch: int, seq: int, ctx: int) -> float:
    """MXU FLOPs for one DiT trunk forward: 2*P*tokens for the matmuls plus
    attention 2*2*S*(S+ctx)*D per head-layer."""
    d, l, ffn = cfg.model_size, cfg.num_layers, cfg.intermediate_size
    per_layer_params = (5 * d * d                      # wq wk wv wo gate
                        + 2 * cfg.text_model_size * d  # wk/wv_text
                        + 2 * cfg.speaker_model_size * d
                        + 3 * d * ffn
                        + 6 * d * cfg.adaln_rank * 2)
    tokens = batch * seq
    matmul = 2.0 * l * per_layer_params * tokens
    attn = 4.0 * l * batch * seq * (seq + ctx) * d
    return matmul + attn


def speed_of_light(cfg: DiTConfig, batch: int, seq: int, ctx: int,
                   gen: str = "v5e", dtype_bytes: int = 2) -> dict:
    """Per-forward floors: compute-bound (MXU) and bandwidth-bound (weights
    read once per forward) — max of the two is the physical floor."""
    spec = TPU_SPECS[gen]
    flops = dit_step_flops(cfg, batch, seq, ctx)
    d, l, ffn = cfg.model_size, cfg.num_layers, cfg.intermediate_size
    trunk_params = l * (5 * d * d + 2 * cfg.text_model_size * d
                        + 2 * cfg.speaker_model_size * d + 3 * d * ffn)
    weight_bytes = trunk_params * dtype_bytes
    t_compute = flops / (spec["bf16_tflops"] * 1e12)
    t_bw = weight_bytes / (spec["hbm_gbps"] * 1e9)
    return {"flops": flops, "t_compute_ms": t_compute * 1e3,
            "t_weights_ms": t_bw * 1e3,
            "floor_ms": max(t_compute, t_bw) * 1e3}


def metrics_line(name: str, values: dict) -> None:
    """Structured one-line JSON metric (multi-host: each process logs its own;
    aggregate with process_allgather before calling on host 0)."""
    log.info("%s", json.dumps({"metric": name, **values}))


def allgather_metric(value: float):
    """Weak-scaling aggregation helper (SURVEY.md §5.5)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(value)
