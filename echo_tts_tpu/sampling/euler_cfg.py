"""Euler sampler with two independent CFG guidances, as one jit-compiled
`lax.scan` (reference: inference.py:446-560).

Host-sync elimination (SURVEY.md §7.3 item 5): the reference's `.item()` CFG
gating (inference.py:511), in-place speaker-KV rescale at the t-crossing
(inference.py:545-556) and per-step Python loop all become traced control
flow — `lax.cond` for the CFG window (so the cheap single-branch forward
still runs outside the window, NFE 80 not 120) and branchless per-step
speaker-KV scale arithmetic.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from echo_tts_tpu.core.config import DiTConfig, SamplerConfig
from echo_tts_tpu.models.dit import (
    dit_forward,
    dit_forward_cfg,
    get_kv_cache_speaker,
    get_kv_cache_text,
)


def t_schedule(sc: SamplerConfig) -> jnp.ndarray:
    """linspace(1, 0, steps+1) * INIT_SCALE (reference: inference.py:470-477)."""
    return jnp.linspace(1.0, 0.0, sc.num_steps + 1, dtype=jnp.float32) * sc.init_scale


def temporal_score_rescale(v_pred, x_t, t, rescale_k: float, rescale_sigma: float):
    """Temporal score rescaling, arXiv 2510.01184 (reference:
    inference.py:431-443). Branchless: t<1 always holds for the 0.999-scaled
    schedule, but we keep the guard as a `where` for exactness."""
    snr = (1.0 - t) ** 2 / (t**2)
    ratio = (snr * rescale_sigma**2 + 1.0) / (snr * rescale_sigma**2 / rescale_k + 1.0)
    rescaled = 1.0 / (1.0 - t) * (ratio * ((1.0 - t) * v_pred + x_t) - x_t)
    return jnp.where(t < 1.0, rescaled, v_pred)


def _speaker_scale_vec(sc: SamplerConfig, cfg: DiTConfig, t, t0) -> Optional[jnp.ndarray]:
    """Per-layer use-site speaker-KV scale for the forward at flow-time t.

    Replaces the reference's in-place cache multiply + unscale-at-crossing
    (inference.py:420-428,485-486,545-556): the cache is scaled from the start
    and unscaled after the step where t crosses speaker_kv_min_t, i.e. a
    forward at time t sees the scale iff t >= min_t, or the schedule never
    crosses (t0 < min_t means no crossing ever happens, reference keeps the
    initial scale forever).
    """
    if sc.speaker_kv_scale is None:
        return None
    min_t = sc.speaker_kv_min_t if sc.speaker_kv_min_t is not None else 0.0
    active = jnp.logical_or(t >= min_t, t0 < min_t)
    s = jnp.where(active, jnp.float32(sc.speaker_kv_scale), 1.0)
    max_layers = sc.speaker_kv_max_layers
    if max_layers is None:
        max_layers = cfg.num_layers
    layer_gate = jnp.arange(cfg.num_layers) < max_layers
    return jnp.where(layer_gate, s, 1.0)


def euler_cfg_scan(
    params: dict,
    cfg: DiTConfig,
    sc: SamplerConfig,
    x_init: jnp.ndarray,          # (B, S, latent) fp32, noise*truncation applied
    text_mask, speaker_mask,      # (B, T) bool
    kv_text, kv_speaker,          # stacked (L, B, T, H, Dh)
    model_dtype,
    rope_q=None,
    kv_latent=None,
    latent_mask=None,
    self_len=None,   # (B,) int32: per-row visible self extent (continuous
    #   batching — a row's final partial block masks in-block keys past its
    #   own budget so emitted positions match a solo run exactly)
) -> jnp.ndarray:
    """The hot loop: scan over Euler steps (reference: inference.py:508-558).
    Sampler state x_t stays fp32 (inference.py:499-506)."""
    b = x_init.shape[0]
    ts = t_schedule(sc)
    t0 = ts[0]
    interval = sc.uncond_cache_interval

    def fwd_cfg(x, t_b, s_vec):
        v = dit_forward_cfg(
            params, cfg, x.astype(model_dtype), t_b, text_mask, speaker_mask,
            kv_text, kv_speaker, rope_q=rope_q, kv_latent=kv_latent,
            latent_mask=latent_mask, speaker_kv_scale=s_vec,
            joint_uncond=sc.joint_uncond, self_len=self_len)
        v_cond = v[0]
        if sc.joint_uncond:
            # single shared unconditional (reference comment,
            # inference.py:530): both guidance terms use it
            v_ut = v_us = v[1]
        else:
            v_ut, v_us = v[1], v[2]
        return v_cond, v_ut, v_us

    def fwd_single(x, t_b, s_vec):
        return dit_forward(
            params, cfg, x.astype(model_dtype), t_b, text_mask, speaker_mask,
            kv_text, kv_speaker, rope_q=rope_q, kv_latent=kv_latent,
            latent_mask=latent_mask, speaker_kv_scale=s_vec,
            self_len=self_len)

    def guide(v_cond, v_ut, v_us):
        return (v_cond
                + sc.cfg_scale_text * (v_cond - v_ut)
                + sc.cfg_scale_speaker * (v_cond - v_us))

    def finish(x_t, v_pred, t, t_next):
        if sc.rescale_k is not None and sc.rescale_sigma is not None:
            v_pred = temporal_score_rescale(v_pred, x_t, t, sc.rescale_k,
                                            sc.rescale_sigma)
        return x_t + v_pred * (t_next - t)

    if sc.solver == "midpoint":
        # Opt-in explicit midpoint (RK2): two velocity evaluations per step,
        # O(dt^2) local accuracy vs Euler's O(dt) — ~half the steps reach
        # the same integration error, so NFE drops at matched quality
        # (tests/test_solver.py pins the equal-NFE win; BASELINE.md the
        # measured SNR/throughput). Each evaluation applies the CFG window,
        # speaker-KV scale, and temporal rescale at ITS OWN flow time, so
        # the integrated field is identical to Euler's — only the
        # integrator changes. Uncond caching is a cross-STEP staleness
        # scheme; its interaction with intra-step midpoint states is
        # untested math, so the combination is rejected loudly.
        if interval > 1:
            raise ValueError(
                "uncond_cache_interval > 1 is not supported with "
                "solver='midpoint' — pick one NFE lever")

        def v_at(x, t):
            s_vec = _speaker_scale_vec(sc, cfg, t, t0)
            t_b = jnp.full((b,), t, dtype=jnp.float32).astype(model_dtype)
            has_cfg = jnp.logical_and(t >= sc.cfg_min_t, t <= sc.cfg_max_t)
            v = jax.lax.cond(
                has_cfg, lambda x_: guide(*fwd_cfg(x_, t_b, s_vec)),
                lambda x_: fwd_single(x_, t_b, s_vec), x)
            if sc.rescale_k is not None and sc.rescale_sigma is not None:
                v = temporal_score_rescale(v, x, t, sc.rescale_k,
                                           sc.rescale_sigma)
            return v

        def step(x_t, i):
            t, t_next = ts[i], ts[i + 1]
            dt = t_next - t
            v1 = v_at(x_t, t)
            x_mid = x_t + 0.5 * dt * v1
            v2 = v_at(x_mid, t + 0.5 * dt)
            return x_t + dt * v2, None

        x_out, _ = jax.lax.scan(step, x_init, jnp.arange(sc.num_steps))
        return x_out

    if sc.solver != "euler":
        raise ValueError(f"unknown solver {sc.solver!r}")

    if interval <= 1:
        # exact reference semantics (default)
        def step(x_t, i):
            t, t_next = ts[i], ts[i + 1]
            s_vec = _speaker_scale_vec(sc, cfg, t, t0)
            t_b = jnp.full((b,), t, dtype=jnp.float32).astype(model_dtype)

            def with_cfg(x):
                return guide(*fwd_cfg(x, t_b, s_vec))

            has_cfg = jnp.logical_and(t >= sc.cfg_min_t, t <= sc.cfg_max_t)
            v_pred = jax.lax.cond(has_cfg, with_cfg,
                                  lambda x: fwd_single(x, t_b, s_vec), x_t)
            return finish(x_t, v_pred, t, t_next), None

        x_out, _ = jax.lax.scan(step, x_init, jnp.arange(sc.num_steps))
        return x_out

    # uncond-cached CFG (opt-in, SmoothCache-family: arXiv 2411.10510 applies
    # cross-step caching to DiT sampling; here the cached quantities are the
    # two unconditional branches): inside the CFG window, refresh v_uncond_*
    # every `interval`-th window step with the full multi-branch forward and
    # reuse them (stale, with a FRESH v_cond) in between — NFE for the default
    # schedule drops from 20*3 + 20*1 to 10*3 + 30*1 at interval=2. NOT
    # reference semantics: guidance deltas lag up to interval-1 steps.
    def step(carry, i):
        x_t, v_ut_c, v_us_c, n_win = carry
        t, t_next = ts[i], ts[i + 1]
        s_vec = _speaker_scale_vec(sc, cfg, t, t0)
        t_b = jnp.full((b,), t, dtype=jnp.float32).astype(model_dtype)
        has_cfg = jnp.logical_and(t >= sc.cfg_min_t, t <= sc.cfg_max_t)
        refresh = jnp.logical_and(has_cfg, n_win % interval == 0)

        def do_refresh(x):
            v_cond, v_ut, v_us = fwd_cfg(x, t_b, s_vec)
            return guide(v_cond, v_ut, v_us), v_ut, v_us

        def do_single(x):
            # one forward; guidance from cached unconds when inside the window
            v_cond = fwd_single(x, t_b, s_vec)
            v = jnp.where(has_cfg, guide(v_cond, v_ut_c, v_us_c), v_cond)
            return v, v_ut_c, v_us_c

        v_pred, v_ut_c, v_us_c = jax.lax.cond(refresh, do_refresh, do_single, x_t)
        x_t = finish(x_t, v_pred, t, t_next)
        return (x_t, v_ut_c, v_us_c, n_win + has_cfg.astype(jnp.int32)), None

    zeros = jnp.zeros_like(x_init)
    (x_out, _, _, _), _ = jax.lax.scan(
        step, (x_init, zeros, zeros, jnp.int32(0)), jnp.arange(sc.num_steps))
    return x_out


def draw_noise(rng_seed: int, shape) -> jnp.ndarray:
    """Initial standard-normal noise (truncation is applied by the sampler,
    reference: inference.py:499-506). Parity tests inject torch-generated
    noise instead of using this."""
    return jax.random.normal(jax.random.PRNGKey(rng_seed), shape, dtype=jnp.float32)


@partial(jax.jit, static_argnames=("cfg", "sc", "model_dtype"))
def sample_euler_cfg_independent_guidances(
    params: dict,
    cfg: DiTConfig,
    sc: SamplerConfig,
    speaker_latent: jnp.ndarray,   # (B, S_spk, latent)
    speaker_mask: jnp.ndarray,     # (B, S_spk) bool
    text_input_ids: jnp.ndarray,   # (B, T) int32
    text_mask: jnp.ndarray,        # (B, T) bool
    noise: jnp.ndarray,            # (B, seq_len, latent) fp32 standard normal
    model_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """One-shot sampling (reference: inference.py:446-560). Returns fp32
    latents (B, sequence_length, latent_size).

    Noise is an explicit input (RNG contract, SURVEY.md §4 item 1); use
    `draw_noise` for production seeds.
    """
    kv_text = get_kv_cache_text(params, cfg, text_input_ids, text_mask)
    kv_speaker = get_kv_cache_speaker(params, cfg, speaker_latent.astype(model_dtype))

    x_init = noise
    if sc.truncation_factor is not None:
        x_init = x_init * sc.truncation_factor

    return euler_cfg_scan(
        params, cfg, sc, x_init, text_mask, speaker_mask, kv_text, kv_speaker,
        model_dtype)
