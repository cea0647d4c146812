"""Distributed-level tests on the simulated 8-device CPU mesh (SURVEY.md §4
item 4): TP-sharded forward == unsharded forward, DP sampling == concatenated
single-device outputs (exact: psum-free), and a sharded train step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from echo_tts_tpu.core.config import DiTConfig, MeshConfig, SamplerConfig
from echo_tts_tpu.models.dit import (
    dit_forward,
    get_kv_cache_speaker,
    get_kv_cache_text,
    init_dit_params,
)
from echo_tts_tpu.parallel.mesh import auto_mesh_config, make_mesh
from echo_tts_tpu.parallel.sharding import batch_pspec, param_pspecs, shard_params
from echo_tts_tpu.sampling.euler_cfg import sample_euler_cfg_independent_guidances
from echo_tts_tpu.train.loop import TrainConfig, make_train_step

CFG = DiTConfig().tiny()


@pytest.fixture(scope="module")
def inputs():
    key = jax.random.PRNGKey(0)
    params = init_dit_params(key, CFG, dtype=jnp.float32)
    B, S, T, SPK = 8, 16, 12, 8
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (B, S, CFG.latent_size))
    t = jnp.full((B,), 0.7)
    ids = jax.random.randint(ks[1], (B, T), 0, 256)
    tmask = jnp.ones((B, T), bool)
    spk = jax.random.normal(ks[2], (B, SPK, CFG.latent_size))
    smask = jnp.ones((B, SPK), bool)
    noise = jax.random.normal(ks[3], (B, S, CFG.latent_size))
    return params, x, t, ids, tmask, spk, smask, noise


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_tp_sharded_forward_matches(inputs):
    params, x, t, ids, tmask, spk, smask, _ = inputs
    kvt = get_kv_cache_text(params, CFG, ids, tmask)
    kvs = get_kv_cache_speaker(params, CFG, spk)
    ref = dit_forward(params, CFG, x, t, tmask, smask, kvt, kvs)

    mesh = make_mesh(MeshConfig(dp=2, tp=2))
    sp = shard_params(params, mesh)
    kvt_s = get_kv_cache_text(sp, CFG, ids, tmask)
    kvs_s = get_kv_cache_speaker(sp, CFG, spk)
    out = dit_forward(sp, CFG, x, t, tmask, smask, kvt_s, kvs_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_dp_sampling_identity(inputs):
    """DP sharded sampling equals single-device batched sampling (independent
    utterances, zero cross-chip comm — SURVEY.md §2.2). Tolerance is fp-noise
    only: partitioning changes XLA fusion/tiling, so bit-exactness across
    compiled executables is not guaranteed even for independent rows."""
    params, _, _, ids, tmask, spk, smask, noise = inputs
    sc = SamplerConfig(num_steps=2, sequence_length=16, truncation_factor=0.8)

    ref = sample_euler_cfg_independent_guidances(
        params, CFG, sc, spk, smask, ids, tmask, noise, model_dtype=jnp.float32)

    mesh = make_mesh(MeshConfig(dp=8, tp=1))
    bspec = lambda a: jax.device_put(a, NamedSharding(mesh, batch_pspec(a.ndim)))
    out = sample_euler_cfg_independent_guidances(
        params, CFG, sc, bspec(spk), bspec(smask), bspec(ids), bspec(tmask),
        bspec(noise), model_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_sharded_train_step(inputs):
    params, x, t, ids, tmask, spk, smask, _ = inputs
    mesh = make_mesh(auto_mesh_config(8, max_tp=2))
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    sp = shard_params(params, mesh)
    batch = {
        "latent": x, "latent_mask": jnp.ones(x.shape[:2], bool),
        "text_input_ids": ids, "text_mask": tmask,
        "speaker_latent": spk, "speaker_mask": smask,
    }
    batch = {k: jax.device_put(v, NamedSharding(mesh, batch_pspec(v.ndim)))
             for k, v in batch.items()}
    tc = TrainConfig(learning_rate=1e-4, warmup_steps=0, total_steps=10)
    opt, step = make_train_step(CFG, tc, model_dtype=jnp.float32)
    opt_state = opt.init(sp)
    p2, _, loss = step(sp, opt_state, jax.random.PRNGKey(0), batch)
    assert np.isfinite(float(loss))


def test_tp_shard_map_pallas_attention(inputs):
    """set_attention_tp: the Pallas kernel (interpret mode on CPU) runs under
    shard_map with heads split over the tp axis and matches the unsharded XLA
    forward. GSPMD alone cannot partition a pallas_call — without the wrapper
    a tp mesh would all-gather the kernel operands onto every device."""
    from echo_tts_tpu.models import dit as dit_mod

    params, x, t, ids, tmask, spk, smask, _ = inputs
    kvt = get_kv_cache_text(params, CFG, ids, tmask)
    kvs = get_kv_cache_speaker(params, CFG, spk)
    ref = dit_forward(params, CFG, x, t, tmask, smask, kvt, kvs,
                      attn_impl="xla")

    mesh = make_mesh(MeshConfig(dp=2, tp=2))  # tiny CFG: 4 heads -> 2/shard
    sp = shard_params(params, mesh)
    kvt_s = get_kv_cache_text(sp, CFG, ids, tmask)
    kvs_s = get_kv_cache_speaker(sp, CFG, spk)
    dit_mod.set_attention_tp(mesh)
    try:
        out = dit_forward(sp, CFG, x, t, tmask, smask, kvt_s, kvs_s,
                          attn_impl="pallas_interpret")
    finally:
        dit_mod.set_attention_tp(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)

    # force-speaker scale goes through the wrapper's scalar operand path
    svec = jnp.full((CFG.num_layers,), 1.5, jnp.float32)
    ref_s = dit_forward(params, CFG, x, t, tmask, smask, kvt, kvs,
                        speaker_kv_scale=svec, attn_impl="xla")
    dit_mod.set_attention_tp(mesh)
    try:
        out_s = dit_forward(sp, CFG, x, t, tmask, smask, kvt_s, kvs_s,
                            speaker_kv_scale=svec,
                            attn_impl="pallas_interpret")
    finally:
        dit_mod.set_attention_tp(None)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s),
                               atol=1e-5, rtol=1e-4)


def test_tp_shards_int8_quantized_leaves(inputs):
    """int8-quantized weights ({"q","s"} dicts, models/quant.py) shard under
    TP by their original weight's name — without this they silently
    replicate and tp>1 loses the HBM split on the very GEMMs int8 targets."""
    from echo_tts_tpu.models.quant import is_quantized, quantize_dit_params

    params, x, t, ids, tmask, spk, smask, _ = inputs
    qp = jax.jit(quantize_dit_params)(params)
    ref = dit_forward(qp, CFG, x, t, tmask, smask,
                      get_kv_cache_text(qp, CFG, ids, tmask),
                      get_kv_cache_speaker(qp, CFG, spk), attn_impl="xla")

    mesh = make_mesh(MeshConfig(dp=2, tp=2))
    sp = shard_params(qp, mesh)
    wq = sp["blocks"]["attention"]["wq"]
    assert is_quantized(wq)
    # column-sharded: q split on its last (output) axis, s on its N axis
    assert wq["q"].sharding.spec == P(None, None, "tp")
    assert wq["s"].sharding.spec == P(None, "tp")
    w2 = sp["blocks"]["mlp"]["w2"]
    assert w2["q"].sharding.spec == P(None, "tp", None)  # row-sharded K

    out = dit_forward(sp, CFG, x, t, tmask, smask,
                      get_kv_cache_text(sp, CFG, ids, tmask),
                      get_kv_cache_speaker(sp, CFG, spk), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
