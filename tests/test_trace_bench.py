"""Arrival-trace serving benchmark harness (bench/trace.py, VERDICT r4
item 3): the host-side machinery — Poisson submission, TTFA/completion
percentiles, throughput accounting — must work against a real Engine in
both serving modes. The full-size numbers come from `bench.py --trace` on
the TPU; these tests pin the harness semantics at tiny CPU scale."""
import dataclasses

import numpy as np

from echo_tts_tpu.bench.trace import run_trace
from echo_tts_tpu.core.config import SamplerConfig
from echo_tts_tpu.serve.engine import Engine

from test_pipeline_parity import tiny_tts  # fixture reuse  # noqa: F401

SC = SamplerConfig(num_steps=2, sequence_length=16, truncation_factor=0.8)


def _check_summary(s, n):
    assert s["n_ok"] == n, s
    assert s["n_hung"] == 0 and not s["errors"]
    assert s["achieved_audio_s_per_s"] > 0
    assert 0 < s["ttfa_p50_s"] <= s["ttfa_p95_s"]
    assert s["ttfa_p95_s"] <= s["completion_p95_s"]
    assert s["completion_p50_s"] <= s["completion_p95_s"]


def test_trace_dispatch_mode(tiny_tts):  # noqa: F811
    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts), max_batch=2)
    try:
        s = run_trace(eng, SC, n_requests=4, rate_hz=50.0, block_size=(4,),
                      timeout_s=600)
    finally:
        eng.close()
    _check_summary(s, 4)


def test_trace_continuous_mode(tiny_tts):  # noqa: F811
    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts), max_batch=4, continuous=True)
    try:
        s = run_trace(eng, SC, n_requests=6, rate_hz=50.0, block_size=4,
                      timeout_s=600)
        h = eng.health()
    finally:
        eng.close()
    _check_summary(s, 6)
    # the burst actually exercised group batching
    assert h["batches"] >= 1
    assert s["completion_p95_s"] < 600


def test_trace_mixed_keys_continuous(tiny_tts):  # noqa: F811
    """block_size_mix under continuous mode: two block specs key TWO live
    groups that must interleave at block granularity (the r5 FIFO-lock
    fairness) — every request completes."""
    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts), max_batch=2, continuous=True)
    try:
        s = run_trace(eng, SC, n_requests=6, rate_hz=50.0,
                      block_size_mix=[4, 8], timeout_s=600)
    finally:
        eng.close()
    _check_summary(s, 6)
    # two compatibility keys -> two schedulers existed
    assert len(eng._cont_scheds) == 2, list(eng._cont_scheds)


def test_trace_seeded_arrivals_reproducible(tiny_tts):  # noqa: F811
    """Same seed -> same arrival schedule (the load points in BASELINE.md
    must be re-runnable)."""
    rng1 = np.random.default_rng(0)
    rng2 = np.random.default_rng(0)
    a1 = np.cumsum(rng1.exponential(1 / 2.0, size=8))
    a2 = np.cumsum(rng2.exponential(1 / 2.0, size=8))
    np.testing.assert_array_equal(a1, a2)
