"""Unit pins for core/layers.py.

`low_rank_adaln` is the per-layer reference implementation (reference:
model.py:46-83); the trunk consumes the batched `precompute_adaln` +
`modulate_rms` pair instead — this pins their equivalence layer by layer.
"""
import jax
import jax.numpy as jnp
import numpy as np

from echo_tts_tpu.core.layers import (
    low_rank_adaln,
    modulate_rms,
    precompute_adaln,
)

L, B, G, S, D, R = 4, 2, 3, 16, 64, 8
EPS = 1e-6


def _adaln_params(key, dtype):
    ks = jax.random.split(key, 6)

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.05).astype(dtype)

    return {
        "shift_down": w(ks[0], (L, D, R)),
        "scale_down": w(ks[1], (L, D, R)),
        "gate_down": w(ks[2], (L, D, R)),
        "shift_up": {"w": w(ks[3], (L, R, D)), "b": jnp.zeros((L, D), dtype)},
        "scale_up": {"w": w(ks[4], (L, R, D)), "b": jnp.zeros((L, D), dtype)},
        "gate_up": {"w": w(ks[5], (L, R, D)), "b": jnp.zeros((L, D), dtype)},
    }


def test_precompute_adaln_matches_per_layer():
    key = jax.random.PRNGKey(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        p = _adaln_params(key, dtype)
        cond = jax.random.normal(jax.random.fold_in(key, 1), (B, 1, 3 * D),
                                 dtype)
        x = jax.random.normal(jax.random.fold_in(key, 2), (G, B, S, D), dtype)

        shift, scale, gate = precompute_adaln(cond, p)
        assert shift.shape == (L, B, 1, D)
        for l in range(L):
            pl = jax.tree_util.tree_map(lambda a: a[l], p)
            x_ref, gate_ref = low_rank_adaln(x, cond, pl, EPS)
            x_new = modulate_rms(x, shift[l], scale[l], EPS)
            np.testing.assert_allclose(
                np.asarray(x_new, np.float32), np.asarray(x_ref, np.float32),
                atol=2e-6 if dtype == jnp.float32 else 2e-2, rtol=0)
            np.testing.assert_allclose(
                np.asarray(gate[l], np.float32),
                np.asarray(gate_ref, np.float32),
                atol=2e-6 if dtype == jnp.float32 else 2e-2, rtol=0)
