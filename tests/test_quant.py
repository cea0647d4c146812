"""Opt-in W8A8 int8 trunk quantization (echo_tts_tpu/models/quant.py).

Unit bounds on the quantizers, GEMM-level error, structural checks on the
transformed pytree, and forward-level SNR of the quantized full DiT forward
vs the bf16/fp32 reference path on a tiny model.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from echo_tts_tpu.core.config import DiTConfig
from echo_tts_tpu.models import quant
from echo_tts_tpu.models.dit import (
    dit_forward_cfg,
    get_kv_cache_speaker,
    get_kv_cache_text,
    init_dit_params,
)


def test_quant_rows_roundtrip_bound():
    h = jax.random.normal(jax.random.PRNGKey(0), (7, 33), jnp.float32) * 3.0
    q, s = quant.quant_rows(h)
    assert q.dtype == jnp.int8
    back = q.astype(jnp.float32) * s
    # symmetric rounding: error per element <= half a quantization step
    assert np.all(np.abs(np.asarray(back - h)) <= np.asarray(s) / 2 + 1e-7)
    # scale really is per-row amax/127
    np.testing.assert_allclose(
        np.asarray(s[:, 0]), np.abs(np.asarray(h)).max(axis=1) / 127.0, rtol=1e-6)


def test_quantize_weight_channel_scales():
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 8), jnp.bfloat16)
    qw = quant.quantize_weight(w)
    assert qw["q"].shape == (3, 16, 8) and qw["q"].dtype == jnp.int8
    assert qw["s"].shape == (3, 8)
    back = qw["q"].astype(jnp.float32) * qw["s"][:, None, :]
    err = np.abs(np.asarray(back - w.astype(jnp.float32)))
    assert np.all(err <= np.asarray(qw["s"][:, None, :]) / 2 + 1e-7)


def test_qdot_matches_float_dot():
    key = jax.random.PRNGKey(2)
    h = jax.random.normal(key, (64, 128), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 96), jnp.float32) * 0.05
    exact = h @ w
    got = quant.mm(h, quant.quantize_weight(w))
    rel = np.linalg.norm(np.asarray(got - exact)) / np.linalg.norm(np.asarray(exact))
    assert rel < 0.02, rel


def test_quantize_dit_params_structure():
    cfg = DiTConfig().tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    qp = quant.quantize_dit_params(params)
    attn = qp["blocks"]["attention"]
    for k in ("wq", "wk", "wv", "gate", "wo"):
        assert quant.is_quantized(attn[k]), k
        assert attn[k]["q"].shape == params["blocks"]["attention"][k].shape
    for k in ("w1", "w3", "w2"):
        assert quant.is_quantized(qp["blocks"]["mlp"][k]), k
    # untouched: encoders, KV projections, adaln, norms, in/out proj
    assert not quant.is_quantized(attn["wk_text"])
    assert qp["text_encoder"] is params["text_encoder"]
    assert qp["in_proj"] is params["in_proj"]
    # original pytree unmodified
    assert not quant.is_quantized(params["blocks"]["attention"]["wq"])


def test_quantize_dit_params_encoders_structure_and_kv_snr():
    """encoders=True also quantizes encoder block GEMMs and KV projections;
    the resulting KV caches must track the fp32 ones closely (this noise is
    frozen into the caches for all sampler steps)."""
    cfg = DiTConfig().tiny()
    key = jax.random.PRNGKey(5)
    params = init_dit_params(key, cfg, dtype=jnp.float32)
    qp = quant.quantize_dit_params(params, encoders=True)
    attn = qp["blocks"]["attention"]
    for k in ("wk_text", "wv_text", "wk_speaker", "wv_speaker",
              "wk_latent", "wv_latent"):
        assert quant.is_quantized(attn[k]), k
    enc_attn = qp["text_encoder"]["blocks"]["attention"]
    assert quant.is_quantized(enc_attn["wq"])
    assert quant.is_quantized(qp["speaker_encoder"]["blocks"]["mlp"]["w1"])
    assert not quant.is_quantized(qp["text_encoder"]["embedding"])
    assert not quant.is_quantized(qp["speaker_encoder"]["in_proj"]["w"])

    b, txt, spk = 2, 12, 8
    ks = jax.random.split(key, 3)
    ids = jax.random.randint(ks[0], (b, txt), 0, cfg.text_vocab_size)
    tmask = jnp.ones((b, txt), jnp.bool_)
    spk_lat = jax.random.normal(ks[1], (b, spk, cfg.latent_size), jnp.float32)

    for ref_kv, got_kv in [
        (get_kv_cache_text(params, cfg, ids, tmask),
         get_kv_cache_text(qp, cfg, ids, tmask)),
        (get_kv_cache_speaker(params, cfg, spk_lat),
         get_kv_cache_speaker(qp, cfg, spk_lat)),
    ]:
        for r, g in zip(ref_kv, got_kv):
            r, g = np.asarray(r), np.asarray(g)
            assert np.all(np.isfinite(g))
            rel = np.linalg.norm(g - r) / (np.linalg.norm(r) + 1e-12)
            assert rel < 0.05, rel


@pytest.mark.parametrize("joint_uncond", [False, True])
def test_quantized_forward_snr(joint_uncond):
    """Full CFG forward, quantized vs reference path, tiny model: the int8
    trunk should track the bf16 output closely (relative L2 per branch)."""
    # fp32 on the CPU backend (its thunk runtime lacks BF16xBF16=F32 dots —
    # same policy as the other CPU tests); isolates pure int8 error
    cfg = DiTConfig().tiny()
    key = jax.random.PRNGKey(3)
    params = init_dit_params(key, cfg, dtype=jnp.float32)
    qp = quant.quantize_dit_params(params)

    b, seq, txt, spk = 2, 16, 12, 8
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (b, seq, cfg.latent_size), jnp.float32)
    t = jnp.full((b,), 0.7, jnp.float32)
    ids = jax.random.randint(ks[1], (b, txt), 0, cfg.text_vocab_size)
    tmask = jnp.ones((b, txt), jnp.bool_)
    spk_lat = jax.random.normal(ks[2], (b, spk, cfg.latent_size), jnp.float32)
    smask = jnp.ones((b, spk), jnp.bool_)

    kv_t = get_kv_cache_text(params, cfg, ids, tmask)
    kv_s = get_kv_cache_speaker(params, cfg, spk_lat)

    ref = dit_forward_cfg(params, cfg, x, t, tmask, smask, kv_t, kv_s,
                          joint_uncond=joint_uncond)
    got = dit_forward_cfg(qp, cfg, x, t, tmask, smask, kv_t, kv_s,
                          joint_uncond=joint_uncond)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    ref_np, got_np = np.asarray(ref), np.asarray(got)
    assert np.all(np.isfinite(got_np))
    rel = (np.linalg.norm(got_np - ref_np, axis=(-2, -1))
           / (np.linalg.norm(ref_np, axis=(-2, -1)) + 1e-12))
    # int8 W8A8 adds ~1% error per GEMM — over the 2-layer tiny trunk the
    # branch outputs should stay within a few percent of the fp32 reference
    assert np.all(rel < 0.05), rel
