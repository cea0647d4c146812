"""Noise-injected parity of the lax.scan Euler CFG sampler vs the reference
PyTorch sampler (SURVEY.md §4 item 1; BASELINE config 1 analogue on a tiny
model: fp32 CPU, 8 steps)."""
import numpy as np
import pytest

import jax.numpy as jnp

from echo_tts_tpu.core.config import DiTConfig, SamplerConfig
from echo_tts_tpu.checkpoints.convert import convert_dit_state, torch_state_to_numpy
from echo_tts_tpu.sampling.euler_cfg import sample_euler_cfg_independent_guidances

from ref_utils import build_torch_dit, load_reference_inference_module

CFG = DiTConfig().tiny()


@pytest.fixture(scope="module")
def setup():
    import torch

    tm = build_torch_dit(CFG, seed=3)
    params = convert_dit_state(torch_state_to_numpy(tm), CFG)
    ref_inf = load_reference_inference_module()

    g = torch.Generator().manual_seed(11)
    B, T, SPK = 1, 12, 8
    ids = torch.randint(0, 256, (B, T), generator=g)
    text_mask = torch.ones(B, T, dtype=torch.bool)
    text_mask[0, 10:] = False
    spk = torch.randn(B, SPK, CFG.latent_size, generator=g)
    spk_mask = torch.ones(B, SPK, dtype=torch.bool)
    return tm, params, ref_inf, ids, text_mask, spk, spk_mask


def _run_both(setup, sc: SamplerConfig, seq_len=16, rng_seed=5):
    import torch

    tm, params, ref_inf, ids, text_mask, spk, spk_mask = setup

    with torch.no_grad():
        ref = ref_inf.sample_euler_cfg_independent_guidances(
            model=tm,
            speaker_latent=spk,
            speaker_mask=spk_mask,
            text_input_ids=ids,
            text_mask=text_mask,
            rng_seed=rng_seed,
            num_steps=sc.num_steps,
            cfg_scale_text=sc.cfg_scale_text,
            cfg_scale_speaker=sc.cfg_scale_speaker,
            cfg_min_t=sc.cfg_min_t,
            cfg_max_t=sc.cfg_max_t,
            truncation_factor=sc.truncation_factor,
            rescale_k=sc.rescale_k,
            rescale_sigma=sc.rescale_sigma,
            speaker_kv_scale=sc.speaker_kv_scale,
            speaker_kv_max_layers=sc.speaker_kv_max_layers,
            speaker_kv_min_t=sc.speaker_kv_min_t,
            sequence_length=seq_len,
        ).numpy()

    # reproduce the reference's torch RNG draw and inject it (inference.py:499-504)
    gen = torch.Generator(device="cpu").manual_seed(rng_seed)
    noise = torch.randn((1, seq_len, CFG.latent_size), dtype=torch.float32,
                        generator=gen).numpy()

    out = sample_euler_cfg_independent_guidances(
        params, CFG, sc,
        jnp.asarray(spk.numpy()), jnp.asarray(spk_mask.numpy()),
        jnp.asarray(ids.numpy()), jnp.asarray(text_mask.numpy()),
        jnp.asarray(noise), model_dtype=jnp.float32)
    return ref, np.asarray(out)


def test_sampler_parity_default(setup):
    sc = SamplerConfig(num_steps=8, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
                       cfg_min_t=0.5, cfg_max_t=1.0, truncation_factor=0.8,
                       sequence_length=16)
    ref, out = _run_both(setup, sc)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_sampler_parity_rescale_and_kv_scale(setup):
    sc = SamplerConfig(num_steps=8, cfg_scale_text=3.0, cfg_scale_speaker=5.0,
                       cfg_min_t=0.5, cfg_max_t=1.0, truncation_factor=1.0,
                       rescale_k=1.2, rescale_sigma=3.0,
                       speaker_kv_scale=1.5, speaker_kv_max_layers=1,
                       speaker_kv_min_t=0.3, sequence_length=16)
    ref, out = _run_both(setup, sc)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_sampler_parity_no_cfg_window(setup):
    """cfg window excluded entirely -> single-branch forwards only."""
    sc = SamplerConfig(num_steps=4, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
                       cfg_min_t=2.0, cfg_max_t=3.0, truncation_factor=None,
                       sequence_length=16)
    ref, out = _run_both(setup, sc)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_joint_uncond_mode(setup):
    """joint_uncond=True (single shared unconditional, reference comment at
    inference.py:530): equals manually computing the guidance formula with a
    both-masked forward."""
    import torch

    import jax.numpy as jnp
    from echo_tts_tpu.models.dit import (
        dit_forward, get_kv_cache_speaker, get_kv_cache_text)

    tm, params, ref_inf, ids, text_mask, spk, spk_mask = setup
    sc = SamplerConfig(num_steps=2, cfg_scale_text=3.0, cfg_scale_speaker=5.0,
                       cfg_min_t=0.0, cfg_max_t=1.0, truncation_factor=None,
                       sequence_length=16, joint_uncond=True)
    gen = torch.Generator(device="cpu").manual_seed(3)
    noise = torch.randn((1, 16, CFG.latent_size), generator=gen).numpy()

    out = sample_euler_cfg_independent_guidances(
        params, CFG, sc,
        jnp.asarray(spk.numpy()), jnp.asarray(spk_mask.numpy()),
        jnp.asarray(ids.numpy()), jnp.asarray(text_mask.numpy()),
        jnp.asarray(noise), model_dtype=jnp.float32)

    # manual two-branch euler with the same schedule
    jids = jnp.asarray(ids.numpy())
    jtm = jnp.asarray(text_mask.numpy())
    jspk = jnp.asarray(spk.numpy())
    jsm = jnp.asarray(spk_mask.numpy())
    kvt = get_kv_cache_text(params, CFG, jids, jtm)
    kvs = get_kv_cache_speaker(params, CFG, jspk)
    from echo_tts_tpu.sampling.euler_cfg import t_schedule

    ts = t_schedule(sc)
    x = jnp.asarray(noise)
    for i in range(sc.num_steps):
        t_b = jnp.full((1,), ts[i])
        v_c = dit_forward(params, CFG, x, t_b, jtm, jsm, kvt, kvs)
        v_u = dit_forward(params, CFG, x, t_b, jnp.zeros_like(jtm),
                          jnp.zeros_like(jsm), kvt, kvs)
        v = v_c + sc.cfg_scale_text * (v_c - v_u) + sc.cfg_scale_speaker * (v_c - v_u)
        x = x + v * (ts[i + 1] - ts[i])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               atol=2e-4, rtol=1e-3)


def test_uncond_cache_interval(setup):
    """uncond_cache_interval=2 (opt-in SmoothCache-style branch caching):
    equals a manual eager loop that refreshes the uncond branches every 2nd
    window step and reuses them (with a fresh conditional) in between; also
    interval=1 stays bit-identical to the default path."""
    import torch

    from echo_tts_tpu.models.dit import (
        dit_forward, dit_forward_cfg, get_kv_cache_speaker, get_kv_cache_text)
    from echo_tts_tpu.sampling.euler_cfg import t_schedule

    tm, params, ref_inf, ids, text_mask, spk, spk_mask = setup
    mk = lambda k: SamplerConfig(
        num_steps=6, cfg_scale_text=3.0, cfg_scale_speaker=5.0,
        cfg_min_t=0.5, cfg_max_t=1.0, truncation_factor=0.9,
        sequence_length=16, uncond_cache_interval=k)
    gen = torch.Generator(device="cpu").manual_seed(7)
    noise = torch.randn((1, 16, CFG.latent_size), generator=gen).numpy()
    args = (jnp.asarray(spk.numpy()), jnp.asarray(spk_mask.numpy()),
            jnp.asarray(ids.numpy()), jnp.asarray(text_mask.numpy()),
            jnp.asarray(noise))

    out1 = sample_euler_cfg_independent_guidances(
        params, CFG, mk(1), *args, model_dtype=jnp.float32)
    out2 = sample_euler_cfg_independent_guidances(
        params, CFG, mk(2), *args, model_dtype=jnp.float32)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))

    # manual eager loop with the caching schedule
    sc = mk(2)
    jtm, jsm = args[3], args[1]
    kvt = get_kv_cache_text(params, CFG, args[2], jtm)
    kvs = get_kv_cache_speaker(params, CFG, args[0])
    ts = t_schedule(sc)
    x = jnp.asarray(noise) * sc.truncation_factor
    v_ut = v_us = None
    n_win = 0
    for i in range(sc.num_steps):
        t = float(ts[i])
        t_b = jnp.full((1,), ts[i])
        in_win = sc.cfg_min_t <= t <= sc.cfg_max_t
        if in_win and n_win % 2 == 0:
            v = dit_forward_cfg(params, CFG, x, t_b, jtm, jsm, kvt, kvs)
            v_c, v_ut, v_us = v[0], v[1], v[2]
        else:
            v_c = dit_forward(params, CFG, x, t_b, jtm, jsm, kvt, kvs)
        if in_win:
            v_pred = (v_c + sc.cfg_scale_text * (v_c - v_ut)
                      + sc.cfg_scale_speaker * (v_c - v_us))
            n_win += 1
        else:
            v_pred = v_c
        x = x + v_pred * (ts[i + 1] - ts[i])
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x),
                               atol=2e-4, rtol=1e-3)
