"""Opt-in midpoint (RK2) solver: convergence order and equal-NFE accuracy
vs the reference's Euler integrator (SamplerConfig.solver; euler_cfg_scan).

The exact path is solver="euler" (default) and is parity-pinned elsewhere
(test_sampler_parity.py). These tests pin the midpoint lever's CLAIM: at the
same number of velocity evaluations, the second-order integrator lands
closer to the true flow trajectory (approximated by a many-step Euler
reference) than first-order Euler does — which is what justifies running it
at ~half the steps in serving (BASELINE.md records the measured SNR /
throughput at full scale)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.core.config import DiTConfig, SamplerConfig
from echo_tts_tpu.models.dit import init_dit_params
from echo_tts_tpu.sampling.euler_cfg import (
    draw_noise,
    sample_euler_cfg_independent_guidances,
)

CFG = DiTConfig().tiny()
SEQ, T, SPK = 16, 12, 8


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(7)
    params = init_dit_params(key, CFG, dtype=jnp.float32)
    ks = jax.random.split(key, 3)
    ids = jax.random.randint(ks[0], (1, T), 0, 256)
    text_mask = jnp.ones((1, T), jnp.bool_)
    spk = jax.random.normal(ks[1], (1, SPK, CFG.latent_size), jnp.float32)
    spk_mask = jnp.ones((1, SPK), jnp.bool_)
    noise = draw_noise(5, (1, SEQ, CFG.latent_size))
    return params, ids, text_mask, spk, spk_mask, noise


def _sample(setup, sc: SamplerConfig) -> np.ndarray:
    params, ids, text_mask, spk, spk_mask, noise = setup
    return np.asarray(sample_euler_cfg_independent_guidances(
        params, CFG, sc, spk, spk_mask, ids, text_mask, noise,
        model_dtype=jnp.float32))


BASE = SamplerConfig(num_steps=8, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
                     cfg_min_t=0.5, cfg_max_t=1.0, truncation_factor=0.8,
                     sequence_length=SEQ)


def test_midpoint_beats_euler_at_equal_nfe(setup):
    """midpoint-N (2N velocity evals) vs euler-2N (2N evals): the RK2
    trajectory must be closer to the fine-step truth. Truth = euler-256
    (integration error ~1/256th of the candidates')."""
    truth = _sample(setup, dataclasses.replace(BASE, num_steps=256))

    def err(sc):
        d = _sample(setup, sc) - truth
        return float(np.linalg.norm(d) / np.linalg.norm(truth))

    e_euler16 = err(dataclasses.replace(BASE, num_steps=16))
    e_mid8 = err(dataclasses.replace(BASE, num_steps=8, solver="midpoint"))
    assert e_mid8 < e_euler16, (e_mid8, e_euler16)
    # and, a fortiori, it beats euler at the same STEP count
    e_euler8 = err(BASE)
    assert e_mid8 < e_euler8, (e_mid8, e_euler8)


def test_midpoint_dominates_euler_smooth_field(setup):
    """With the CFG window covering the whole schedule (cfg_min_t=0 — no
    guided/unguided field discontinuity at t=0.5), midpoint's error against
    a fine-step truth must dominate Euler's at every step count, by a wide
    margin. (A strict O(dt^2) order assertion is deliberately NOT pinned:
    on a random-init stiff neural field the asymptotic regime is non-uniform
    — measured orders swing 0.8–2.7 across step-count octaves — while the
    pointwise midpoint-vs-Euler dominance below is robust. Euler itself
    measures clean order ~1.0 on the same field.)"""
    smooth = dataclasses.replace(BASE, cfg_min_t=0.0)
    truth = _sample(setup, dataclasses.replace(smooth, num_steps=256))

    def err(n, solver):
        d = _sample(setup, dataclasses.replace(
            smooth, num_steps=n, solver=solver)) - truth
        return float(np.linalg.norm(d) / np.linalg.norm(truth))

    for n in (4, 8, 16):
        e_euler, e_mid = err(n, "euler"), err(n, "midpoint")
        assert e_mid < 0.5 * e_euler, (n, e_euler, e_mid)


def test_midpoint_with_rescale_and_kv_scale_runs(setup):
    """The per-eval field transforms (temporal rescale, speaker-KV scale
    window) apply at each evaluation's own flow time — smoke + finiteness."""
    sc = dataclasses.replace(
        BASE, solver="midpoint", rescale_k=1.2, rescale_sigma=3.0,
        speaker_kv_scale=1.5, speaker_kv_min_t=0.5, speaker_kv_max_layers=2)
    out = _sample(setup, sc)
    assert np.all(np.isfinite(out))


def test_midpoint_rejects_uncond_cache(setup):
    sc = dataclasses.replace(BASE, solver="midpoint", uncond_cache_interval=2)
    with pytest.raises(ValueError, match="midpoint"):
        _sample(setup, sc)


def test_unknown_solver_rejected(setup):
    sc = dataclasses.replace(BASE, solver="heun3")
    with pytest.raises(ValueError, match="heun3"):
        _sample(setup, sc)


def test_solver_from_preset_roundtrip():
    sc = SamplerConfig.from_preset({"num_steps": "20", "solver": "midpoint"})
    assert sc.solver == "midpoint" and sc.num_steps == 20
    assert SamplerConfig.from_preset({}).solver == "euler"


def test_midpoint_blockwise_runs(setup):
    """Blockwise sampling inherits the solver through euler_cfg_scan: a
    2-block midpoint run must produce finite latents and be deterministic."""
    from echo_tts_tpu.models.dit import (
        get_kv_cache_speaker,
        get_kv_cache_text,
        init_latent_kv_state,
    )
    from echo_tts_tpu.sampling.blockwise import sample_block_core

    params, ids, text_mask, spk, spk_mask, noise = setup
    sc = dataclasses.replace(BASE, solver="midpoint", num_steps=4)
    kv_text = get_kv_cache_text(params, CFG, ids, text_mask)
    kv_speaker = get_kv_cache_speaker(params, CFG, spk)
    bs = 8

    def run():
        prefix = jnp.zeros((1, SEQ, CFG.latent_size), jnp.float32)
        lat_state = init_latent_kv_state(params, CFG, 1, SEQ, jnp.float32)
        for blk in range(2):
            prefix, lat_state = sample_block_core(
                params, CFG, sc, prefix, lat_state,
                jnp.int32(blk * bs), noise[:, blk * bs:(blk + 1) * bs],
                text_mask, spk_mask, kv_text, kv_speaker,
                block_size=bs, total_len=SEQ, model_dtype=jnp.float32)
        return np.asarray(prefix)

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)
    assert np.all(np.isfinite(a)) and np.any(a[:, :2 * bs] != 0)
