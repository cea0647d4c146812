"""FULL-WIDTH shallow parity vs the PyTorch reference (VERDICT r3 item 3).

Every other parity test runs at tiny widths (head_dim 16, adaln_rank 8);
width-dependent bugs — the half-head RoPE split at 64 rotation pairs
(reference model.py:199-202 with head_dim=128), fp32-island placement,
the 4x80 patchify reshape, adaln_rank-256 bottlenecks — are invisible
there. These tests keep the REAL widths (d=2048, heads 16, ffn 5888,
text/speaker d=1280, patch 4, latent 80; reference model.py:472-604 /
inference.py:22-42) and shrink only the layer counts (2 trunk / 1 encoder
layers, so the lax.scan stacking still runs), fp32 CPU, seed-matched
noise injection (SURVEY.md §4 item 1)."""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from echo_tts_tpu.core.config import DiTConfig, SamplerConfig
from echo_tts_tpu.checkpoints.convert import convert_dit_state, torch_state_to_numpy
from echo_tts_tpu.models import dit as jdit
from echo_tts_tpu.sampling.euler_cfg import sample_euler_cfg_independent_guidances

from ref_utils import build_torch_dit, load_reference_inference_module

FULL = dataclasses.replace(
    DiTConfig(),
    num_layers=2,
    text_num_layers=1,
    speaker_num_layers=1,
)
assert FULL.model_size == 2048 and FULL.head_dim == 128
assert FULL.intermediate_size == 5888 and FULL.adaln_rank == 256


@pytest.fixture(scope="module")
def torch_and_jax():
    import torch

    tm = build_torch_dit(FULL, seed=0)
    params = convert_dit_state(torch_state_to_numpy(tm), FULL)
    return tm, params


def _mk_inputs(seed=1):
    import torch

    g = torch.Generator().manual_seed(seed)
    B, S, T, SPK = 1, 16, 24, 16
    x = torch.randn(B, S, FULL.latent_size, generator=g)
    t = torch.rand(B, generator=g)
    ids = torch.randint(0, FULL.text_vocab_size, (B, T), generator=g)
    text_mask = torch.ones(B, T, dtype=torch.bool)
    text_mask[0, 20:] = False
    spk = torch.randn(B, SPK, FULL.latent_size, generator=g)
    spk_mask = torch.ones(B, SPK, dtype=torch.bool)
    spk_mask[0, 12:] = False
    return x, t, ids, text_mask, spk, spk_mask


def test_fullwidth_forward_parity(torch_and_jax):
    import torch

    tm, params = torch_and_jax
    x, t, ids, text_mask, spk, spk_mask = _mk_inputs()
    with torch.no_grad():
        kv_t = tm.get_kv_cache_text(ids, text_mask)
        kv_s = tm.get_kv_cache_speaker(spk)
        ref = tm(x=x, t=t, text_mask=text_mask, speaker_mask=spk_mask,
                 kv_cache_text=kv_t, kv_cache_speaker=kv_s).numpy()

    kvt = jdit.get_kv_cache_text(params, FULL, jnp.asarray(ids.numpy()),
                                 jnp.asarray(text_mask.numpy()))
    kvs = jdit.get_kv_cache_speaker(params, FULL, jnp.asarray(spk.numpy()))
    out = jdit.dit_forward(
        params, FULL, jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(text_mask.numpy()), jnp.asarray(spk_mask.numpy()),
        kvt, kvs)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-3)


def test_fullwidth_blockwise_forward_parity(torch_and_jax):
    """Latent-prefix KV + start_pos query RoPE at full width: the RoPE
    tables rotate the FIRST 64 of 128 head-dim pairs only (reference
    model.py:199-202) — an off-by-one in that split only shows at real
    head_dim."""
    import torch

    tm, params = torch_and_jax
    x, t, ids, text_mask, spk, spk_mask = _mk_inputs()
    start_pos = 8
    x = x[:, :8]
    g = torch.Generator().manual_seed(7)
    prefix = torch.randn(1, 16, FULL.latent_size, generator=g)

    with torch.no_grad():
        kv_t = tm.get_kv_cache_text(ids, text_mask)
        kv_s = tm.get_kv_cache_speaker(spk)
        kv_l = tm.get_kv_cache_latent(prefix)
        ref = tm(x=x, t=t, text_mask=text_mask, speaker_mask=spk_mask,
                 kv_cache_text=kv_t, kv_cache_speaker=kv_s,
                 start_pos=start_pos, kv_cache_latent=kv_l).numpy()

    from echo_tts_tpu.core.rope import precompute_rope

    kvt = jdit.get_kv_cache_text(params, FULL, jnp.asarray(ids.numpy()),
                                 jnp.asarray(text_mask.numpy()))
    kvs = jdit.get_kv_cache_speaker(params, FULL, jnp.asarray(spk.numpy()))
    kvl = jdit.get_kv_cache_latent(params, FULL, jnp.asarray(prefix.numpy()))
    cos, sin = precompute_rope(FULL.head_dim, start_pos + 8)
    rope_q = (cos[start_pos:], sin[start_pos:])
    n_lat = kvl[0].shape[3]  # (L, B, H, T, Dh)
    latent_positions = np.arange(n_lat) * FULL.speaker_patch_size
    latent_mask = jnp.asarray((latent_positions < start_pos)[None])
    out = jdit.dit_forward(
        params, FULL, jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(text_mask.numpy()), jnp.asarray(spk_mask.numpy()),
        kvt, kvs, rope_q=rope_q, kv_latent=kvl, latent_mask=latent_mask)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-3)


def test_fullwidth_sampler_parity(torch_and_jax):
    """2-step Euler with the full option surface (dual CFG window, temporal
    rescale, speaker-KV force scale) at real widths."""
    import torch

    tm, params = torch_and_jax
    ref_inf = load_reference_inference_module()
    _, _, ids, text_mask, spk, spk_mask = _mk_inputs(seed=2)
    sc = SamplerConfig(num_steps=2, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
                       cfg_min_t=0.0, cfg_max_t=1.0, truncation_factor=0.8,
                       rescale_k=1.2, rescale_sigma=3.0,
                       speaker_kv_scale=1.5, speaker_kv_max_layers=1,
                       speaker_kv_min_t=0.3, sequence_length=16)
    rng_seed = 5
    with torch.no_grad():
        ref = ref_inf.sample_euler_cfg_independent_guidances(
            model=tm, speaker_latent=spk, speaker_mask=spk_mask,
            text_input_ids=ids, text_mask=text_mask, rng_seed=rng_seed,
            num_steps=sc.num_steps, cfg_scale_text=sc.cfg_scale_text,
            cfg_scale_speaker=sc.cfg_scale_speaker, cfg_min_t=sc.cfg_min_t,
            cfg_max_t=sc.cfg_max_t, truncation_factor=sc.truncation_factor,
            rescale_k=sc.rescale_k, rescale_sigma=sc.rescale_sigma,
            speaker_kv_scale=sc.speaker_kv_scale,
            speaker_kv_max_layers=sc.speaker_kv_max_layers,
            speaker_kv_min_t=sc.speaker_kv_min_t,
            sequence_length=sc.sequence_length,
        ).numpy()

    gen = torch.Generator(device="cpu").manual_seed(rng_seed)
    noise = torch.randn((1, sc.sequence_length, FULL.latent_size),
                        dtype=torch.float32, generator=gen).numpy()
    out = sample_euler_cfg_independent_guidances(
        params, FULL, sc,
        jnp.asarray(spk.numpy()), jnp.asarray(spk_mask.numpy()),
        jnp.asarray(ids.numpy()), jnp.asarray(text_mask.numpy()),
        jnp.asarray(noise), model_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)
