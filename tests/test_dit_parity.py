"""Seed-matched parity of the JAX EchoDiT vs the PyTorch reference on a tiny
structurally-identical config, fp32 CPU (SURVEY.md §4 items 1-2)."""
import numpy as np
import pytest

from echo_tts_tpu.core.config import DiTConfig
from echo_tts_tpu.checkpoints.convert import convert_dit_state, torch_state_to_numpy
from echo_tts_tpu.models import dit as jdit

from ref_utils import build_torch_dit

import jax.numpy as jnp

CFG = DiTConfig().tiny()


@pytest.fixture(scope="module")
def torch_and_jax():
    import torch

    tm = build_torch_dit(CFG, seed=0)
    params = convert_dit_state(torch_state_to_numpy(tm), CFG)
    params = {k: v for k, v in params.items()}
    return tm, params


def _mk_inputs(seed=1):
    import torch

    g = torch.Generator().manual_seed(seed)
    B, S, T, SPK = 2, 16, 12, 8
    x = torch.randn(B, S, CFG.latent_size, generator=g)
    t = torch.rand(B, generator=g)
    ids = torch.randint(0, CFG.text_vocab_size, (B, T), generator=g)
    text_mask = torch.ones(B, T, dtype=torch.bool)
    text_mask[1, 8:] = False
    spk = torch.randn(B, SPK, CFG.latent_size, generator=g)
    spk_mask = torch.ones(B, SPK, dtype=torch.bool)
    spk_mask[0, 6:] = False
    return x, t, ids, text_mask, spk, spk_mask


def test_kv_cache_text_parity(torch_and_jax):
    import torch

    tm, params = torch_and_jax
    _, _, ids, text_mask, _, _ = _mk_inputs()
    with torch.no_grad():
        ref = tm.get_kv_cache_text(ids, text_mask)
    ref_k = np.stack([k.numpy() for k, _ in ref])
    ref_v = np.stack([v.numpy() for _, v in ref])

    ks, vs = jdit.get_kv_cache_text(params, CFG, jnp.asarray(ids.numpy()),
                                    jnp.asarray(text_mask.numpy()))
    # ours are head-major (L, B, H, S, Dh); reference is (L, B, S, H, Dh)
    ks = np.asarray(ks).transpose(0, 1, 3, 2, 4)
    vs = np.asarray(vs).transpose(0, 1, 3, 2, 4)
    np.testing.assert_allclose(ks, ref_k, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(vs, ref_v, atol=2e-5, rtol=1e-4)


def test_kv_cache_speaker_parity(torch_and_jax):
    import torch

    tm, params = torch_and_jax
    _, _, _, _, spk, _ = _mk_inputs()
    with torch.no_grad():
        ref = tm.get_kv_cache_speaker(spk)
    ref_k = np.stack([k.numpy() for k, _ in ref])

    ks, vs = jdit.get_kv_cache_speaker(params, CFG, jnp.asarray(spk.numpy()))
    ks = np.asarray(ks).transpose(0, 1, 3, 2, 4)
    np.testing.assert_allclose(ks, ref_k, atol=2e-5, rtol=1e-4)


def test_forward_parity(torch_and_jax):
    import torch

    tm, params = torch_and_jax
    x, t, ids, text_mask, spk, spk_mask = _mk_inputs()
    with torch.no_grad():
        kv_t = tm.get_kv_cache_text(ids, text_mask)
        kv_s = tm.get_kv_cache_speaker(spk)
        ref = tm(x=x, t=t, text_mask=text_mask, speaker_mask=spk_mask,
                 kv_cache_text=kv_t, kv_cache_speaker=kv_s).numpy()

    kvt = jdit.get_kv_cache_text(params, CFG, jnp.asarray(ids.numpy()),
                                 jnp.asarray(text_mask.numpy()))
    kvs = jdit.get_kv_cache_speaker(params, CFG, jnp.asarray(spk.numpy()))
    out = jdit.dit_forward(
        params, CFG, jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(text_mask.numpy()), jnp.asarray(spk_mask.numpy()), kvt, kvs)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-3)


def test_forward_with_latent_cache_and_start_pos(torch_and_jax):
    """Blockwise path: latent-prefix KV, start_pos query RoPE offset, and the
    latent_pos < start_pos key gating (reference: model.py:229,243-244)."""
    import torch

    tm, params = torch_and_jax
    x, t, ids, text_mask, spk, spk_mask = _mk_inputs()
    start_pos = 8
    x = x[:, :8]  # a block of 8 queries at offset 8
    g = torch.Generator().manual_seed(7)
    prefix = torch.randn(2, 16, CFG.latent_size, generator=g)  # 16 latents = 4 patches

    with torch.no_grad():
        kv_t = tm.get_kv_cache_text(ids, text_mask)
        kv_s = tm.get_kv_cache_speaker(spk)
        kv_l = tm.get_kv_cache_latent(prefix)
        ref = tm(x=x, t=t, text_mask=text_mask, speaker_mask=spk_mask,
                 kv_cache_text=kv_t, kv_cache_speaker=kv_s,
                 start_pos=start_pos, kv_cache_latent=kv_l).numpy()

    kvt = jdit.get_kv_cache_text(params, CFG, jnp.asarray(ids.numpy()),
                                 jnp.asarray(text_mask.numpy()))
    kvs = jdit.get_kv_cache_speaker(params, CFG, jnp.asarray(spk.numpy()))
    kvl = jdit.get_kv_cache_latent(params, CFG, jnp.asarray(prefix.numpy()))

    from echo_tts_tpu.core.rope import precompute_rope

    cos, sin = precompute_rope(CFG.head_dim, start_pos + 8)
    rope_q = (cos[start_pos:], sin[start_pos:])
    n_lat = kvl[0].shape[3]  # (L, B, H, T, Dh)
    latent_positions = np.arange(n_lat) * CFG.speaker_patch_size
    latent_mask = jnp.asarray((latent_positions < start_pos)[None].repeat(2, 0))

    out = jdit.dit_forward(
        params, CFG, jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(text_mask.numpy()), jnp.asarray(spk_mask.numpy()),
        kvt, kvs, rope_q=rope_q, kv_latent=kvl, latent_mask=latent_mask)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-3)


def test_speaker_kv_scale_equivalence(torch_and_jax):
    """Use-site speaker KV scaling == reference's in-place cache multiply
    (reference: inference.py:420-428,485-486)."""
    import torch

    tm, params = torch_and_jax
    x, t, ids, text_mask, spk, spk_mask = _mk_inputs()
    scale, max_layers = 1.5, 1

    with torch.no_grad():
        kv_t = tm.get_kv_cache_text(ids, text_mask)
        kv_s = tm.get_kv_cache_speaker(spk)
        for i in range(min(max_layers, len(kv_s))):
            kv_s[i][0].mul_(scale)
            kv_s[i][1].mul_(scale)
        ref = tm(x=x, t=t, text_mask=text_mask, speaker_mask=spk_mask,
                 kv_cache_text=kv_t, kv_cache_speaker=kv_s).numpy()

    kvt = jdit.get_kv_cache_text(params, CFG, jnp.asarray(ids.numpy()),
                                 jnp.asarray(text_mask.numpy()))
    kvs = jdit.get_kv_cache_speaker(params, CFG, jnp.asarray(spk.numpy()))
    s_vec = jnp.where(jnp.arange(CFG.num_layers) < max_layers, scale, 1.0)
    out = jdit.dit_forward(
        params, CFG, jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(text_mask.numpy()), jnp.asarray(spk_mask.numpy()),
        kvt, kvs, speaker_kv_scale=s_vec)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-3)
