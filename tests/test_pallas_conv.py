"""Fused residual-chain Pallas kernel vs the XLA shifted-matmul path
(models/s1dac.py:_residual_unit_cl) — interpret mode on CPU, fp32."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from echo_tts_tpu.models.s1dac import _residual_unit_cl
from echo_tts_tpu.ops.pallas_conv import fused_res_chain_cl, res_units_cl


def _make_unit(key, c):
    ks = jax.random.split(key, 6)
    return {
        "snake1": jax.random.uniform(ks[0], (1, c, 1), jnp.float32, 0.2, 1.5),
        "snake2": jax.random.uniform(ks[1], (1, c, 1), jnp.float32, 0.2, 1.5),
        "conv1": {"w": jax.random.normal(ks[2], (c, c, 7)) * 0.05,
                  "b": jax.random.normal(ks[3], (c,)) * 0.1},
        "conv2": {"w": jax.random.normal(ks[4], (c, c, 1)) * 0.05,
                  "b": jax.random.normal(ks[5], (c,)) * 0.1},
    }


@pytest.mark.parametrize("b,t,c", [(1, 512, 64), (2, 300, 32)])
def test_fused_res_chain_matches_xla(b, t, c):
    key = jax.random.PRNGKey(0)
    units = [_make_unit(jax.random.fold_in(key, i), c) for i in range(3)]
    x = jax.random.normal(jax.random.fold_in(key, 9), (b, t, c), jnp.float32)

    ref = x
    for u, d in zip(units, (1, 3, 9)):
        ref = _residual_unit_cl(ref, u, dilation=d)

    got = fused_res_chain_cl(x, units, (1, 3, 9), tile_t=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_res_units_per_unit_split_matches_chain():
    # force the per-unit path via a tiny weight budget
    import echo_tts_tpu.ops.pallas_conv as pc

    key = jax.random.PRNGKey(1)
    c = 32
    units = [_make_unit(jax.random.fold_in(key, i), c) for i in range(3)]
    x = jax.random.normal(jax.random.fold_in(key, 7), (1, 320, c), jnp.float32)

    chained = fused_res_chain_cl(x, units, (1, 3, 9), tile_t=256, interpret=True)
    old = pc._CHAIN_WEIGHT_BYTES
    pc._CHAIN_WEIGHT_BYTES = 0
    try:
        split = res_units_cl(x, units, (1, 3, 9), interpret=True)
    finally:
        pc._CHAIN_WEIGHT_BYTES = old
    np.testing.assert_allclose(np.asarray(split), np.asarray(chained),
                               rtol=2e-5, atol=2e-5)


def test_decoder_pallas_matches_xla_path():
    """Full decode_zq with the Pallas res-chain (interpret) vs the XLA path."""
    from echo_tts_tpu.bench.init_ae import init_ae_params
    from echo_tts_tpu.core.config import AEConfig
    from echo_tts_tpu.models import s1dac

    cfg = AEConfig().tiny()
    params = init_ae_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    z_q = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.latent_dim, 12))

    s1dac.set_conv_impl("xla")
    try:
        ref = s1dac.decode_zq(params, cfg, z_q)
    finally:
        s1dac.set_conv_impl("auto")
    s1dac.set_conv_impl("pallas_interpret")
    try:
        got = s1dac.decode_zq(params, cfg, z_q)
    finally:
        s1dac.set_conv_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
