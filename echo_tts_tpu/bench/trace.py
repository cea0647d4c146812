"""Arrival-trace serving benchmark (VERDICT r4 item 3): drive a serving
Engine with a Poisson arrival process and report what an OPERATOR needs —
achieved throughput and p50/p95 time-to-first-audio / completion per
(serving mode, offered load) — instead of isolated point headlines.

The reference has no serving benchmark at all (single Gradio click,
gradio_app.py:229-430); this converts the framework's serving modes
(dispatch-batched streaming, continuous block-boundary admission, elastic
groups, opt-in levers) into a measured configuration policy (BASELINE.md
"which mode when").

Host-side and backend-agnostic: bench.py wires it to the full-size model on
the TPU; tests drive it with the tiny CPU config.
"""
from __future__ import annotations

import threading
import time
from typing import List, Optional

import numpy as np

# varied text lengths (all inside one 768-byte bucket — bucket padding is
# how serving handles mixed lengths, so length mixing exercises the real
# path without multiplying the compile matrix)
_TEXTS = [
    "A short line.",
    "A mid-length sentence that a typical request might carry, with a few "
    "clauses and a natural pause.",
    "A long paragraph of the kind long-form narration produces: several "
    "sentences in a row, enough bytes to sit near the middle of the text "
    "bucket, with clauses, asides, and a steady rhythm that keeps the "
    "token count up without hitting the cap. The quick brown fox jumps "
    "over the lazy dog while the band plays on.",
]


class _Result:
    __slots__ = ("arrival_s", "ttfa_s", "done_s", "audio_s", "error")

    def __init__(self):
        self.arrival_s: float = 0.0
        self.ttfa_s: Optional[float] = None
        self.done_s: Optional[float] = None
        self.audio_s: float = 0.0
        self.error: Optional[str] = None


def _pct(vals: List[float], q: float) -> float:
    return float(np.percentile(np.asarray(vals), q)) if vals else float("nan")


def run_trace(engine, sc, n_requests: int, rate_hz: float,
              block_size=(64, 192), seed: int = 0,
              timeout_s: float = 1800.0, block_size_mix=None) -> dict:
    """Submit `n_requests` streaming requests at Poisson rate `rate_hz`
    (exponential inter-arrivals, fixed RNG) against `engine` and measure,
    per request, arrival→first-chunk (TTFA) and arrival→last-chunk
    (completion). Texts cycle through mixed lengths; seeds vary per
    request. Returns the summary dict (one bench JSON object).

    block_size_mix: optional list of block specs — request i uses
    block_size_mix[i % len]. HETEROGENEOUS traffic: in dispatch mode the
    specs are different batch keys (groups fragment); in continuous mode
    each spec keys its own live group, so the groups must interleave at
    block granularity (the r5 FIFO-lock fairness design — pre-r5 one
    group starved the other for its whole lifetime).

    Throughput is total emitted audio over the busy makespan (first arrival
    → last completion) — the steady-state audio-s/s the configuration
    actually sustains at this offered load, queueing included."""
    rng = np.random.default_rng(seed)
    arrivals = np.cumsum(rng.exponential(1.0 / rate_hz, size=n_requests))
    results = [_Result() for _ in range(n_requests)]
    sr = engine.tts.ae_cfg.sample_rate
    t0 = time.perf_counter()

    def client(i: int):
        r = results[i]
        r.arrival_s = time.perf_counter() - t0
        samples = 0
        bs_i = (block_size if block_size_mix is None
                else block_size_mix[i % len(block_size_mix)])
        try:
            for chunk in engine.generate_stream(
                    _TEXTS[i % len(_TEXTS)], None, seed=1000 + i, sc=sc,
                    block_size=bs_i):
                now = time.perf_counter() - t0
                if r.ttfa_s is None:
                    r.ttfa_s = now - r.arrival_s
                samples += chunk.shape[-1]
            r.done_s = time.perf_counter() - t0
            r.audio_s = samples / sr
        except Exception as e:  # pragma: no cover - device failure path
            r.error = f"{type(e).__name__}: {e}"

    threads = []
    for i in range(n_requests):
        delay = t0 + arrivals[i] - time.perf_counter()
        if delay > 0:
            time.sleep(delay)
        t = threading.Thread(target=client, args=(i,), daemon=True)
        t.start()
        threads.append(t)
    deadline = time.monotonic() + timeout_s
    for t in threads:
        t.join(timeout=max(0.0, deadline - time.monotonic()))
    hung = sum(t.is_alive() for t in threads)

    ok = [r for r in results if r.error is None and r.done_s is not None]
    errors = [r.error for r in results if r.error is not None]
    total_audio = sum(r.audio_s for r in ok)
    makespan = (max(r.done_s for r in ok) - min(r.arrival_s for r in ok)
                if ok else float("nan"))
    ttfas = [r.ttfa_s for r in ok if r.ttfa_s is not None]
    compls = [r.done_s - r.arrival_s for r in ok]
    return {
        "n_requests": n_requests,
        "n_ok": len(ok),
        "n_hung": hung,
        "errors": errors[:3],
        "offered_rate_hz": round(rate_hz, 4),
        "offered_audio_s_per_s": round(
            rate_hz * (total_audio / len(ok) if ok else 0.0), 3),
        "achieved_audio_s_per_s": round(total_audio / makespan, 3)
        if ok else None,
        "makespan_s": round(makespan, 2) if ok else None,
        "ttfa_p50_s": round(_pct(ttfas, 50), 3),
        "ttfa_p95_s": round(_pct(ttfas, 95), 3),
        "completion_p50_s": round(_pct(compls, 50), 3),
        "completion_p95_s": round(_pct(compls, 95), 3),
    }
