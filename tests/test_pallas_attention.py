"""Kernel-level tests: Pallas fused segmented joint attention vs the XLA
einsum path, interpreter mode on CPU, fp32, tolerance <=1e-5
(SURVEY.md §4 item 3)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.models.dit import _joint_attention_grouped
from echo_tts_tpu.ops.pallas_attention import joint_attention_grouped_pallas


def _mk(g, b, s, h, d, seg_lens, seed=0, dtype=jnp.float32, scales=None):
    # head-major layouts: q/kv_self (G,B,H,S,D), segments (B,H,T,D)
    ks = jax.random.split(jax.random.PRNGKey(seed), 3 + 3 * len(seg_lens))
    q = jax.random.normal(ks[0], (g, b, h, s, d), dtype)
    k_self = jax.random.normal(ks[1], (g, b, h, s, d), dtype)
    v_self = jax.random.normal(ks[2], (g, b, h, s, d), dtype)
    segments = []
    for i, t in enumerate(seg_lens):
        kk = jax.random.normal(ks[3 + 3 * i], (b, h, t, d), dtype)
        vv = jax.random.normal(ks[4 + 3 * i], (b, h, t, d), dtype)
        mm = jax.random.bernoulli(ks[5 + 3 * i], 0.8, (g, b, t))
        sc = None if scales is None else scales[i]
        segments.append((kk, vv, mm, sc))
    return q, k_self, v_self, segments


@pytest.mark.parametrize("shape", [
    (3, 1, 128, 2, 128, (256,)),        # one segment, aligned
    (3, 2, 100, 2, 128, (200, 96)),     # two segments, unaligned S and T
    (1, 1, 64, 4, 128, (384, 128, 64)),  # three segments (latent path)
    (3, 1, 64, 2, 128, (128, 1)),       # degenerate T=1 segment: the
    #   no-speaker serving shape (one speaker patch) — the wrapper pads it
    #   to the sublane multiple (Mosaic miscompiles T=1 dots; bench --check
    #   gates the compiled form on-chip)
    (3, 1, 64, 2, 128, (5, 128)),       # sub-sublane unaligned T
])
def test_pallas_matches_xla(shape):
    g, b, s, h, d, seg_lens = shape
    q, ks_, vs_, segs = _mk(g, b, s, h, d, seg_lens)
    ref = _joint_attention_grouped(q, ks_, vs_, segs)
    out = joint_attention_grouped_pallas(q, ks_, vs_, segs, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_pallas_with_kv_scale():
    """Per-segment use-site KV scale (force speaker) inside the kernel."""
    g, b, s, h, d = 3, 1, 64, 2, 128
    q, ks_, vs_, segs = _mk(g, b, s, h, d, (128, 256), seed=5,
                            scales=[None, jnp.float32(1.5)])
    ref = _joint_attention_grouped(q, ks_, vs_, segs)
    out = joint_attention_grouped_pallas(q, ks_, vs_, segs, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
    # and equals explicit K*s, V*s through the XLA path
    (k1, v1, m1, _), (k2, v2, m2, _) = segs
    segs_manual = [(k1, v1, m1, None), (k2 * 1.5, v2 * 1.5, m2, None)]
    ref2 = _joint_attention_grouped(q, ks_, vs_, segs_manual)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref2),
                               atol=1e-5, rtol=1e-4)


def test_branch_split_segment_skip():
    """CFG branch-split dispatch: segments carrying static skip-branch info
    (5th tuple element) route through per-branch pallas_calls that drop the
    segment entirely; result must match the mask-only grouped path exactly
    (a fully-masked segment contributes exp(-1e30)=0)."""
    from echo_tts_tpu.models import dit as dit_mod

    g, b, s, h, d = 3, 1, 64, 2, 128
    q, ks_, vs_, segs = _mk(g, b, s, h, d, (96, 160), seed=7,
                            scales=[None, jnp.float32(1.3)])
    # branch 1 fully masks segment 0 (text-uncond); branch 2 masks segment 1
    (k1, v1, m1, s1), (k2, v2, m2, s2) = segs
    m1 = m1.at[1].set(False)
    m2 = m2.at[2].set(False)
    segs_mask = [(k1, v1, m1, s1), (k2, v2, m2, s2)]
    segs_skip = [(k1, v1, m1, s1, (1,)), (k2, v2, m2, s2, (2,))]
    ref = _joint_attention_grouped(q, ks_, vs_, segs_mask)
    prev = dit_mod._ATTN_IMPL
    dit_mod.set_attention_impl("pallas_interpret")
    try:
        out = _joint_attention_grouped(q, ks_, vs_, segs_skip)
    finally:
        dit_mod.set_attention_impl(prev)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_pallas_fully_masked_ctx():
    """All ctx masked (uncond branches mask whole segments) — softmax must
    fall back to self-only attention, no NaNs."""
    g, b, s, h, d = 2, 1, 64, 2, 128
    q, ks_, vs_, segs = _mk(g, b, s, h, d, (256,), seed=3)
    k, v, _, _ = segs[0]
    segs = [(k, v, jnp.zeros((g, b, 256), bool), None)]
    ref = _joint_attention_grouped(q, ks_, vs_, segs)
    out = joint_attention_grouped_pallas(q, ks_, vs_, segs, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_bwd_kernel_grads_group_and_scale():
    """Direct bwd-kernel vs jax.vjp(XLA math) over the paths the training
    test cannot reach: G=3 cross-group dk/dv accumulation and a non-unit
    use-site KV scale (interpret mode)."""
    import jax

    from echo_tts_tpu.ops.pallas_attention import (
        _xla_joint_attention_hm,
        joint_attention_grouped_pallas_bwd,
    )

    G, B, H, S, D, T1, T2 = 3, 2, 2, 16, 32, 12, 20
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (G, B, H, S, D), jnp.float32)
    k_self = jax.random.normal(ks[1], (G, B, H, S, D), jnp.float32)
    v_self = jax.random.normal(ks[2], (G, B, H, S, D), jnp.float32)
    k1 = jax.random.normal(ks[3], (B, H, T1, D), jnp.float32)
    v1 = jax.random.normal(ks[4], (B, H, T1, D), jnp.float32)
    k2 = jax.random.normal(ks[5], (B, H, T2, D), jnp.float32)
    v2 = jax.random.normal(ks[6], (B, H, T2, D), jnp.float32)
    m1 = jax.random.bernoulli(ks[7], 0.8, (G, B, T1))
    b1 = jnp.where(m1, 0.0, -1e30).astype(jnp.float32)
    b2 = jnp.zeros((G, B, T2), jnp.float32)
    s1 = jnp.float32(1.0)
    s2 = jnp.float32(1.5)  # non-unit use-site KV scale
    flat = [k1, v1, b1, s1, k2, v2, b2, s2]
    do = jax.random.normal(jax.random.fold_in(key, 9),
                           (G, B, H, S, D), jnp.float32)

    out, vjp = jax.vjp(
        lambda q_, ks_, vs_, *fl: _xla_joint_attention_hm(q_, ks_, vs_, fl),
        q, k_self, v_self, *flat)
    ref = vjp(do)

    dq, dks, dvs, dsegs = joint_attention_grouped_pallas_bwd(
        q, k_self, v_self, flat, do, interpret=True)

    np.testing.assert_allclose(np.asarray(dq), np.asarray(ref[0]),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dks), np.asarray(ref[1]),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dvs), np.asarray(ref[2]),
                               atol=2e-4, rtol=1e-3)
    # segment k/v grads: ref[3:] interleaves (k, v, bias, scale) per segment
    np.testing.assert_allclose(np.asarray(dsegs[0]), np.asarray(ref[3]),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dsegs[1]), np.asarray(ref[4]),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dsegs[2]), np.asarray(ref[7]),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dsegs[3]), np.asarray(ref[8]),
                               atol=2e-4, rtol=1e-3)
