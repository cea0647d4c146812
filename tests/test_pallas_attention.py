"""Kernel-level tests: Pallas fused joint attention vs the XLA einsum path,
interpreter mode on CPU, fp32, tolerance <=1e-5 (SURVEY.md §4 item 3)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.models.dit import _joint_attention_grouped
from echo_tts_tpu.ops.pallas_attention import joint_attention_grouped_pallas


def _mk(g, b, s, h, d, t, seed=0, dtype=jnp.float32):
    # head-major layouts: q/kv_self (G,B,H,S,D), ctx (B,H,T,D)
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    q = jax.random.normal(ks[0], (g, b, h, s, d), dtype)
    k_self = jax.random.normal(ks[1], (g, b, h, s, d), dtype)
    v_self = jax.random.normal(ks[2], (g, b, h, s, d), dtype)
    ctx_k = jax.random.normal(ks[3], (b, h, t, d), dtype)
    ctx_v = jax.random.normal(ks[4], (b, h, t, d), dtype)
    mask = jax.random.bernoulli(ks[5], 0.8, (g, b, t))
    # ensure at least something visible per row is irrelevant: self always visible
    return q, k_self, v_self, ctx_k, ctx_v, mask


@pytest.mark.parametrize("shape", [
    (3, 1, 128, 2, 128, 256),   # aligned
    (3, 2, 100, 2, 128, 200),   # unaligned S and T -> wrapper padding
    (1, 1, 64, 4, 128, 384),    # single branch
])
def test_pallas_matches_xla(shape):
    g, b, s, h, d, t = shape
    args = _mk(g, b, s, h, d, t)
    ref = _joint_attention_grouped(*args)
    out = joint_attention_grouped_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_pallas_fully_masked_ctx():
    """All ctx masked (uncond branches mask whole segments) — softmax must
    fall back to self-only attention, no NaNs."""
    g, b, s, h, d, t = 2, 1, 64, 2, 128, 256
    q, ks_, vs_, kc, vc, _ = _mk(g, b, s, h, d, t, seed=3)
    mask = jnp.zeros((g, b, t), bool)
    ref = _joint_attention_grouped(q, ks_, vs_, kc, vc, mask)
    out = joint_attention_grouped_pallas(q, ks_, vs_, kc, vc, mask, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
