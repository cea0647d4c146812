"""Pallas TPU kernel: fused joint attention with segmented KV.

The DiT hot loop attends 640 queries against [self | latent | text | speaker]
keys (~3k total). The XLA einsum path materializes the (G, B, H, S, T) fp32
logits in HBM (~360 MB/layer at serving shapes) — pure HBM-bandwidth waste
that dominated the step time. This kernel keeps logits and softmax entirely
in VMEM: per (batch, head, q-tile, branch) program it computes

    logits = [q @ k_selfᵀ , q @ k_ctxᵀ·mask]   (MXU, fp32 accum)
    softmax over the concatenated axis            (VPU, fp32)
    out = w_self @ v_self + w_ctx @ v_ctx         (MXU)

Segment semantics (reference: model.py:237-253): self keys are always
visible; ctx keys ([latent|text|speaker] concat) are gated by a per-branch
boolean mask. The CFG group axis G shares the ctx KV (grid-ordered so the
ctx block stays VMEM-resident across branches) — the 3 guidance branches
differ only in masks, so shared ctx is exact (inference.py:479-497).

At these extents (S=640, T≈3k) whole segments fit VMEM, so no online-softmax
streaming is needed (SURVEY.md §5.7); q is tiled at 128 rows for MXU shape.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # plain float: jnp scalars would be captured consts inside the kernel


def _kernel(q_ref, ks_ref, vs_ref, kc_ref, vc_ref, mask_ref, o_ref,
            *, scale: float, s_real: int):
    q = q_ref[0, 0, 0]        # (TQ, D)
    ks = ks_ref[0, 0, 0]      # (S, D)
    vs = vs_ref[0, 0, 0]
    kc = kc_ref[0, 0]         # (T, D)
    vc = vc_ref[0, 0]
    mask = mask_ref[0, 0]     # (T,) bool (int8-backed)

    ls = jax.lax.dot_general(q, ks, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    # mask padded self rows (q was padded to a 128 multiple by the wrapper)
    s_pad = ks.shape[0]
    if s_pad != s_real:
        col = jax.lax.broadcasted_iota(jnp.int32, ls.shape, 1)
        ls = jnp.where(col < s_real, ls, _NEG)

    lc = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    lc = jnp.where(mask[None, :], lc, _NEG)

    m = jnp.maximum(jnp.max(ls, axis=-1, keepdims=True),
                    jnp.max(lc, axis=-1, keepdims=True))
    es = jnp.exp(ls - m)
    ec = jnp.exp(lc - m)
    denom = jnp.sum(es, axis=-1, keepdims=True) + jnp.sum(ec, axis=-1, keepdims=True)
    inv = 1.0 / denom
    ws = (es * inv).astype(vs.dtype)
    wc = (ec * inv).astype(vc.dtype)
    o = jax.lax.dot_general(ws, vs, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + jax.lax.dot_general(wc, vc, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    o_ref[0, 0, 0] = o.astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = -n % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("interpret",))
def joint_attention_grouped_pallas(q, k_self, v_self, ctx_k, ctx_v, ctx_mask,
                                   interpret: bool = False):
    """q/k_self/v_self: (G, B, H, S, D) head-major; ctx_k/ctx_v: (B, H, T, D);
    ctx_mask: (G, B, T) bool. Returns (G, B, H, S, D) in v dtype — same
    contract as models.dit._joint_attention_grouped.

    Unaligned T is handled by Mosaic's internal tile padding (measured at
    these sizes: within noise of a 128-aligned T), so no host-visible padding
    copies of the big ctx tensors; only q rows pad to the tile multiple.
    """
    g, b, h, s, d = q.shape
    t = ctx_k.shape[2]
    scale = 1.0 / (d ** 0.5)
    # prefer 320-row q tiles (640 = 2x320); fall back to 128, then whole-S
    if s % 320 == 0:
        tq = 320
    elif s % 128 == 0:
        tq = 128
    else:
        tq = min(128, max(8, s))

    qt = _pad_to(q, 3, tq)
    kst = _pad_to(k_self, 3, 8)
    vst = _pad_to(v_self, 3, 8)

    s_pad = qt.shape[3]
    s_kv = kst.shape[3]
    n_qt = s_pad // tq

    grid = (b, h, n_qt, g)  # g innermost: ctx block stays resident across branches

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, s_real=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, tq, d), lambda bb, hh, qq, gg: (gg, bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, 1, s_kv, d), lambda bb, hh, qq, gg: (gg, bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, 1, s_kv, d), lambda bb, hh, qq, gg: (gg, bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq, gg: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq, gg: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda bb, hh, qq, gg: (gg, bb, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, tq, d),
                               lambda bb, hh, qq, gg: (gg, bb, hh, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((g, b, h, s_pad, d), v_self.dtype),
        interpret=interpret,
    )(qt, kst, vst, ctx_k, ctx_v, ctx_mask)

    return out[:, :, :, :s]


def flash_attention(q, k, v, mask=None, is_causal: bool = False):
    """Simple (B,S,H,D) fused attention for the encoders — built on the same
    kernel by treating all keys as ctx with an optional mask. Causal handled
    by the caller via mask for now."""
    raise NotImplementedError(
        "encoder-path pallas attention lands with the encoder fusion pass; "
        "use ops.attention.sdpa")
