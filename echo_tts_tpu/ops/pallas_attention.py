"""Pallas TPU kernel: fused joint attention with segmented KV.

The DiT hot loop attends 640 queries against [self | latent | text | speaker]
keys (~3k total). The XLA einsum path materializes the (G, B, H, S, T) fp32
logits in HBM (~360 MB/layer at serving shapes) — pure HBM-bandwidth waste
that dominated the step time. This kernel keeps logits and softmax entirely
in VMEM: per (batch, head, q-tile, branch) program it computes

    logits = [q @ k_selfᵀ , q @ k_segᵀ·scale·mask ...]   (MXU, fp32 accum)
    softmax over the concatenated axis                    (VPU, fp32)
    out = w_self @ v_self + Σ scale·(w_seg @ v_seg)       (MXU)

Segment semantics (reference: model.py:237-253): self keys are always
visible; each context segment ([latent], text, speaker) keeps its own
boolean mask and optional use-site KV scale (the "force speaker" multiplier,
reference inference.py:420-428 — logits·s and value-contribution·s ≡ K·s,
V·s). Segments arrive SEPARATELY — no concatenated-context copy per layer —
and the CFG group axis G shares every segment's KV (grid-ordered so ctx
blocks stay VMEM-resident across branches; the 3 guidance branches differ
only in masks, inference.py:479-497).

Masks enter the kernel as ADDITIVE fp32 biases (0 / -1e30), not bools: a
bool `jnp.where` select on the (TQ, T) logits costs ~0.7 ms/layer in Mosaic
(lane-broadcast relayout of the i1 mask) — 2.9x the whole kernel's dot time
— while a broadcast fp32 add is free (scripts/bench_attention_variants.py).
exp(l + (-1e30) - m_row) underflows to exactly 0, so the result is
bit-identical to the select for any finite logits.

At these extents (S=640, T≈3k) whole segments fit VMEM, so no online-softmax
streaming is needed (SURVEY.md §5.7); q is tiled for MXU shape.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # plain float: jnp scalars would be captured consts inside the kernel
# exp2 with log2(e) folded into the softmax scale: Mosaic's exp2 lowering is
# a few VPU ops cheaper than exp (measured 0.345 vs 0.363 ms/layer,
# scripts/bench_attention_variants.py); exp(x) == exp2(x*log2e) to fp32
# rounding, well inside the 2e-5 parity tolerances
_LOG2E = 1.4426950408889634


def _kernel(*refs, scale: float, s_real: int, nseg: int, seq_major: bool,
            has_self_len: bool = False):
    if has_self_len:
        sl_ref, refs = refs[0], refs[1:]
    q_ref, ks_ref, vs_ref = refs[0], refs[1], refs[2]
    seg_refs = refs[3:3 + 4 * nseg]
    o_ref = refs[3 + 4 * nseg]

    if seq_major:
        # blocks are head-sized lane slices of (G, B, S, H*D) — the
        # projections' natural layout; no XLA head-major transpose copies
        # around the kernel (Mosaic wants the last two block dims tiled, so
        # the head is a lane-block of the flattened H*D axis, D=128-aligned)
        q = q_ref[0, 0]           # (TQ, D)
        ks = ks_ref[0, 0]         # (S, D)
        vs = vs_ref[0, 0]
    else:
        q = q_ref[0, 0, 0]        # (TQ, D)
        ks = ks_ref[0, 0, 0]      # (S, D)
        vs = vs_ref[0, 0, 0]

    ls = jax.lax.dot_general(q, ks, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    # mask padded self rows (q/k_self padded to a tile multiple by the
    # wrapper) — arithmetic bias, not a select (selects relayout; docstring).
    # With has_self_len the visible self extent is PER-ROW (continuous
    # batching: a row finishing mid-group samples a full-size block but only
    # its first self_len positions are its real sequence; the rest must not
    # be attended or the valid positions' values drift from a solo run).
    s_pad = ks.shape[0]
    if has_self_len:
        sl = sl_ref[pl.program_id(0)]  # grid dim 0 is batch
        col = jax.lax.broadcasted_iota(jnp.int32, ls.shape, 1)
        pad_bias = jnp.maximum(jnp.minimum(
            (sl - 1 - col).astype(jnp.float32), 0.0), -1.0) * (-_NEG)
        ls = ls + pad_bias
    elif s_pad != s_real:
        col = jax.lax.broadcasted_iota(jnp.int32, ls.shape, 1)
        pad_bias = jnp.maximum(jnp.minimum(
            (s_real - 1 - col).astype(jnp.float32), 0.0), -1.0) * (-_NEG)
        ls = ls + pad_bias

    logits = [ls]
    scales = []
    for i in range(nseg):
        k_ref, v_ref, m_ref, s_ref = seg_refs[4 * i : 4 * i + 4]
        k = k_ref[0, 0]       # (T, D)
        m = m_ref[0, 0, 0]    # (T,) fp32 additive bias (0 / -1e30); dummy
        #                        axis so the block's trailing dims match
        s_kv = s_ref[0]       # scalar from SMEM
        scales.append(s_kv)
        l = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        l = l * s_kv
        l = l + m[None, :]
        logits.append(l)

    m_row = logits[0].max(axis=-1, keepdims=True)
    for l in logits[1:]:
        m_row = jnp.maximum(m_row, l.max(axis=-1, keepdims=True))
    exps = [jnp.exp2(l - m_row) for l in logits]
    denom = exps[0].sum(axis=-1, keepdims=True)
    for e in exps[1:]:
        denom = denom + e.sum(axis=-1, keepdims=True)
    inv = 1.0 / denom

    o = jax.lax.dot_general((exps[0] * inv).astype(vs.dtype), vs,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    for i in range(nseg):
        v = seg_refs[4 * i + 1][0, 0]
        w = (exps[i + 1] * inv).astype(v.dtype)
        contrib = jax.lax.dot_general(w, v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        o = o + contrib * scales[i]
    if seq_major:
        o_ref[0, 0] = o.astype(o_ref.dtype)
    else:
        o_ref[0, 0, 0] = o.astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = -n % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def joint_attention_grouped_pallas(q, k_self, v_self, segments,
                                   interpret: bool = False,
                                   layout: str = "hm", self_len=None):
    """q/k_self/v_self: (G, B, H, S, D) head-major (layout="hm") or
    (G, B, S, H, D) seq-major (layout="sm" — the projections' natural shape;
    skips the XLA transpose copies around the kernel, the head slice is a
    lane-aligned block since D=128). segments: list of
    (k (B, H, T, D), v, mask (G, B, T) bool, scale scalar or None).
    Returns the same layout as q, in v dtype — same contract as
    models.dit._joint_attention_grouped.

    self_len: optional (B,) int32 — per-row visible extent of the SELF keys
    (continuous batching: a row on its final partial block must not attend
    the block positions past its own budget). None = all self keys visible.

    Unaligned T is handled by Mosaic's internal tile padding (measured within
    noise of a 128-aligned T at these sizes), so no host-visible padding of
    the big KV tensors; only q rows pad to the tile multiple.
    """
    seq_major = layout == "sm"
    if seq_major:
        g, b, s, h, d = q.shape
        s_axis = 2
        # flatten heads into lanes: the kernel slices head hh as the 128-wide
        # lane block at offset hh*d (free reshape, contiguous)
        q = q.reshape(g, b, s, h * d)
        k_self = k_self.reshape(g, b, k_self.shape[2], h * d)
        v_self = v_self.reshape(g, b, v_self.shape[2], h * d)
    else:
        g, b, h, s, d = q.shape
        s_axis = 3
    nseg = len(segments)
    scale = _LOG2E / (d ** 0.5)
    # q-tile: whole-S for the 640-query serving shape (measured 7% faster
    # than 2x320 after the bias-mask change — scripts/bench_attention_variants
    # 2026-08-20; the pre-bias numbers had tq=640 at parity), else 320/128
    if s == 640:
        tq = 640
    elif s % 320 == 0:
        tq = 320
    elif s % 128 == 0:
        tq = 128
    else:
        tq = min(128, max(8, s))

    qt = _pad_to(q, s_axis, tq)
    kst = _pad_to(k_self, s_axis, 8)
    vst = _pad_to(v_self, s_axis, 8)
    s_pad = qt.shape[s_axis]
    s_kv = kst.shape[s_axis]
    n_qt = s_pad // tq

    grid = (b, h, n_qt, g)  # g innermost: ctx blocks stay resident across branches

    if seq_major:
        in_specs = [
            pl.BlockSpec((1, 1, tq, d), lambda bb, hh, qq, gg: (gg, bb, qq, hh)),
            pl.BlockSpec((1, 1, s_kv, d), lambda bb, hh, qq, gg: (gg, bb, 0, hh)),
            pl.BlockSpec((1, 1, s_kv, d), lambda bb, hh, qq, gg: (gg, bb, 0, hh)),
        ]
    else:
        in_specs = [
            pl.BlockSpec((1, 1, 1, tq, d), lambda bb, hh, qq, gg: (gg, bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, 1, s_kv, d), lambda bb, hh, qq, gg: (gg, bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, 1, s_kv, d), lambda bb, hh, qq, gg: (gg, bb, hh, 0, 0)),
        ]
    args = [qt, kst, vst]
    if self_len is not None:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = [jnp.asarray(self_len, jnp.int32).reshape(b)] + args
    for k, v, mask, s_kv_scale in segments:
        # pad tiny segments to the 8-sublane multiple: a degenerate T (the
        # no-speaker serving shape is ONE speaker patch, T=1) makes Mosaic
        # emit a broadcast-based dot that fails element-type verification
        # ('vector.broadcast' bf16->f32, caught by the r5 trace bench —
        # every prior TPU run used T>=768 segments). Padded keys carry a
        # -1e30 bias, identical to a masked-off key. Aligned T is untouched.
        if k.shape[2] % 8:
            k = _pad_to(k, 2, 8)
            v = _pad_to(v, 2, 8)
            if mask.dtype == jnp.bool_:
                mask = _pad_to(mask, 2, 8)  # False-padded -> -1e30 below
            else:
                pad_w = [(0, 0)] * mask.ndim
                pad_w[2] = (0, -mask.shape[2] % 8)
                mask = jnp.pad(mask, pad_w, constant_values=_NEG)
        t = k.shape[2]
        in_specs += [
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq, gg: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq, gg: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, 1, t), lambda bb, hh, qq, gg: (gg, bb, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        if s_kv_scale is None:
            s_arr = jnp.ones((1,), jnp.float32)
        else:
            s_arr = jnp.asarray(s_kv_scale, jnp.float32).reshape(1)
        # bool -> additive fp32 bias outside the kernel (XLA-land, ~KBs);
        # in-kernel bool selects relayout at ~0.7 ms/layer (module docstring).
        # Callers may pass a pre-built fp32 bias instead of a bool mask
        # (the trainable custom_vjp path keeps everything float).
        if mask.dtype == jnp.bool_:
            bias = jnp.where(mask, jnp.float32(0.0), jnp.float32(_NEG))
        else:
            bias = mask.astype(jnp.float32)
        args += [k, v, bias[:, :, None, :], s_arr]

    if seq_major:
        out_spec = pl.BlockSpec((1, 1, tq, d),
                                lambda bb, hh, qq, gg: (gg, bb, qq, hh))
        out_shape = jax.ShapeDtypeStruct((g, b, s_pad, h * d), v_self.dtype)
    else:
        out_spec = pl.BlockSpec((1, 1, 1, tq, d),
                                lambda bb, hh, qq, gg: (gg, bb, hh, qq, 0))
        out_shape = jax.ShapeDtypeStruct((g, b, h, s_pad, d), v_self.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, s_real=s, nseg=nseg,
                          seq_major=seq_major,
                          has_self_len=self_len is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)

    if seq_major:
        return out[:, :, :s].reshape(g, b, s, h, d)
    return out[:, :, :, :s]


# ---------------------------------------------------------------------------
# Trainable wrapper: kernel forward, XLA-math backward
# ---------------------------------------------------------------------------
#
# The kernel has no autodiff rule; training differentiates the trunk. This
# custom_vjp runs the Pallas kernel in BOTH forward passes (primal and the
# remat recompute) and the Pallas backward kernel (below) for gradients —
# logits never materialize in HBM. _xla_joint_attention_hm remains as the
# reference math the tests check both directions against. Masks enter as
# fp32 additive biases so every primal is float (bool primals would need
# float0 cotangents).

import functools as _functools


def _xla_joint_attention_hm(q, k_self, v_self, flat_segments):
    """Reference math for the kernel, head-major (G, B, H, S, D); biases are
    fp32 additive (0 / -1e30). Must mirror the kernel exactly up to fp
    rounding (exp2 vs exp is a rounding-level difference)."""
    g, b, h, s, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    ls = jnp.einsum("gbhsd,gbhtd->gbhst", q, k_self,
                    preferred_element_type=jnp.float32) * scale
    logits = [ls]
    nseg = len(flat_segments) // 4
    for i in range(nseg):
        k, v, bias, s_kv = flat_segments[4 * i: 4 * i + 4]
        l = jnp.einsum("gbhsd,bhtd->gbhst", q, k,
                       preferred_element_type=jnp.float32) * scale
        l = l * s_kv + bias[:, :, None, None, :]
        logits.append(l)
    w = jax.nn.softmax(jnp.concatenate(logits, axis=-1), axis=-1
                       ).astype(v_self.dtype)
    out = jnp.einsum("gbhst,gbhtd->gbhsd", w[..., :s], v_self,
                     preferred_element_type=jnp.float32)
    off = s
    for i in range(nseg):
        k, v, bias, s_kv = flat_segments[4 * i: 4 * i + 4]
        t = k.shape[2]
        o = jnp.einsum("gbhst,bhtd->gbhsd", w[..., off:off + t], v,
                       preferred_element_type=jnp.float32)
        out = out + o * s_kv
        off += t
    return out.astype(v_self.dtype)


@_functools.lru_cache(maxsize=8)
def _make_trainable_attention(nseg: int, interpret: bool):
    @jax.custom_vjp
    def attn(q, k_self, v_self, *flat):
        segments = [(flat[4 * i], flat[4 * i + 1], flat[4 * i + 2],
                     flat[4 * i + 3]) for i in range(nseg)]
        return joint_attention_grouped_pallas(q, k_self, v_self, segments,
                                              interpret=interpret, layout="hm")

    def fwd(q, k_self, v_self, *flat):
        return attn(q, k_self, v_self, *flat), (q, k_self, v_self, flat)

    def bwd_pallas(res, g):
        q, k_self, v_self, flat = res
        dq, dks, dvs, dsegs = joint_attention_grouped_pallas_bwd(
            q, k_self, v_self, list(flat), g, interpret=interpret)
        grads = [dq, dks, dvs]
        for i in range(nseg):
            bias, s_kv = flat[4 * i + 2], flat[4 * i + 3]
            # zero cotangents for biases/scales: mask- and config-derived,
            # never parameters (see module comment above _bwd_kernel)
            grads += [dsegs[2 * i], dsegs[2 * i + 1],
                      jnp.zeros_like(bias), jnp.zeros_like(s_kv)]
        return tuple(grads)

    attn.defvjp(fwd, bwd_pallas)
    return attn


def joint_attention_grouped_trainable(q, k_self, v_self, segments,
                                      interpret: bool = False):
    """Differentiable entry: Pallas kernels in both directions.
    q/k_self/v_self head-major (G, B, H, S, D); segments as in
    joint_attention_grouped_pallas (bool masks converted to biases here)."""
    flat = []
    for k, v, mask, s_kv in segments:
        bias = jnp.where(mask, jnp.float32(0.0), jnp.float32(_NEG)) \
            if mask.dtype == jnp.bool_ else mask.astype(jnp.float32)
        s_arr = jnp.float32(1.0) if s_kv is None else jnp.asarray(s_kv, jnp.float32)
        flat += [k, v, bias, s_arr]
    return _make_trainable_attention(len(segments), interpret)(
        q, k_self, v_self, *flat)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------
#
# Grads of the segmented joint attention, entirely in VMEM: one program per
# (batch, head) recomputes logits/softmax over the FULL query extent and the
# CFG group loop, so every output (dq, dk_self/dv_self per group, dk/dv per
# segment accumulated over groups and rows) is written exactly once — no
# cross-program accumulation. The XLA-math VJP this replaces materializes the
# (G,B,H,S,T) logits in HBM twice per layer (its own fwd + bwd).
#
# Cotangents for the additive mask biases and the scalar KV scales are
# returned as zeros: they derive from boolean masks / config constants, never
# from parameters (the grad tests check all parameter gradients plus the
# direct bwd-vs-XLA-vjp comparison over G>1 / scaled-KV shapes).


def _bwd_kernel(*refs, scale: float, s_real: int, nseg: int, g_total: int):
    q_ref, ks_ref, vs_ref, do_ref = refs[0], refs[1], refs[2], refs[3]
    seg_refs = refs[4:4 + 4 * nseg]
    dq_ref, dks_ref, dvs_ref = refs[4 + 4 * nseg: 7 + 4 * nseg]
    dseg_refs = refs[7 + 4 * nseg:]

    seg_acc = [None] * (2 * nseg)  # fp32 dk/dv accumulators across groups
    for g in range(g_total):
        q = q_ref[g, 0, 0]        # (S, D)
        ks = ks_ref[g, 0, 0]
        vs = vs_ref[g, 0, 0]
        do = do_ref[g, 0, 0].astype(jnp.float32)

        l_self = jax.lax.dot_general(q, ks, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
        s_pad = ks.shape[0]
        if s_pad != s_real:
            col = jax.lax.broadcasted_iota(jnp.int32, l_self.shape, 1)
            pad_bias = jnp.maximum(jnp.minimum(
                (s_real - 1 - col).astype(jnp.float32), 0.0), -1.0) * (-_NEG)
            l_self = l_self + pad_bias

        logits = [l_self]
        scales = []
        for i in range(nseg):
            k_ref, v_ref, m_ref, s_ref = seg_refs[4 * i: 4 * i + 4]
            k = k_ref[0, 0]
            s_kv = s_ref[0]
            scales.append(s_kv)
            l = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            l = l * s_kv + m_ref[g, 0, 0][None, :]
            logits.append(l)

        m_row = logits[0].max(axis=-1, keepdims=True)
        for l in logits[1:]:
            m_row = jnp.maximum(m_row, l.max(axis=-1, keepdims=True))
        exps = [jnp.exp(l - m_row) for l in logits]
        denom = exps[0].sum(axis=-1, keepdims=True)
        for e in exps[1:]:
            denom = denom + e.sum(axis=-1, keepdims=True)
        inv = 1.0 / denom
        ps = [e * inv for e in exps]  # fp32 softmax weights per segment

        # dp per segment (value-contribution scale folds into dp)
        dps = [jax.lax.dot_general(do, vs.astype(jnp.float32),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)]
        for i in range(nseg):
            v = seg_refs[4 * i + 1][0, 0]
            dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dps.append(dp * scales[i])

        r = (dps[0] * ps[0]).sum(axis=-1, keepdims=True)
        for dp, p in zip(dps[1:], ps[1:]):
            r = r + (dp * p).sum(axis=-1, keepdims=True)
        dls = [p * (dp - r) for p, dp in zip(ps, dps)]  # d logits (original l)

        in_dt = q.dtype
        dq = jax.lax.dot_general(dls[0].astype(in_dt), ks,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        for i in range(nseg):
            k = seg_refs[4 * i][0, 0]
            contrib = jax.lax.dot_general(dls[i + 1].astype(in_dt), k,
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            dq = dq + contrib * (scale * scales[i])
        dq_ref[g, 0, 0] = dq.astype(dq_ref.dtype)

        dks = jax.lax.dot_general(dls[0].astype(in_dt), q,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) * scale
        dks_ref[g, 0, 0] = dks.astype(dks_ref.dtype)
        dvs = jax.lax.dot_general(ps[0].astype(in_dt), do.astype(in_dt),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dvs_ref[g, 0, 0] = dvs.astype(dvs_ref.dtype)

        for i in range(nseg):
            dk = jax.lax.dot_general(dls[i + 1].astype(in_dt), q,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) \
                * (scale * scales[i])
            dv = jax.lax.dot_general(ps[i + 1].astype(in_dt), do.astype(in_dt),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) \
                * scales[i]
            seg_acc[2 * i] = dk if seg_acc[2 * i] is None else seg_acc[2 * i] + dk
            seg_acc[2 * i + 1] = (dv if seg_acc[2 * i + 1] is None
                                  else seg_acc[2 * i + 1] + dv)

    for i in range(nseg):
        dseg_refs[2 * i][0, 0] = seg_acc[2 * i].astype(dseg_refs[2 * i].dtype)
        dseg_refs[2 * i + 1][0, 0] = seg_acc[2 * i + 1].astype(
            dseg_refs[2 * i + 1].dtype)


def joint_attention_grouped_pallas_bwd(q, k_self, v_self, flat_segments, do,
                                       interpret: bool = False):
    """Backward pass (head-major). flat_segments: [k, v, bias(G,B,T) fp32,
    scale scalar]*nseg. Returns (dq, dk_self, dv_self, [dk_i, dv_i]*nseg)."""
    g, b, h, s, d = q.shape
    nseg = len(flat_segments) // 4
    scale = 1.0 / (d ** 0.5)

    qt = _pad_to(q, 3, 8)
    kst = _pad_to(k_self, 3, 8)
    vst = _pad_to(v_self, 3, 8)
    dot_ = _pad_to(do, 3, 8)
    s_pad = qt.shape[3]

    grid = (b, h)
    gbh_spec = pl.BlockSpec((g, 1, 1, s_pad, d), lambda bb, hh: (0, bb, hh, 0, 0))
    in_specs = [gbh_spec, gbh_spec, gbh_spec, gbh_spec]
    args = [qt, kst, vst, dot_]
    out_specs = [gbh_spec, gbh_spec, gbh_spec]
    out_shapes = [jax.ShapeDtypeStruct((g, b, h, s_pad, d), q.dtype)] * 3
    seg_ts = []
    for i in range(nseg):
        k, v, bias, s_kv = flat_segments[4 * i: 4 * i + 4]
        seg_ts.append(k.shape[2])
        # same degenerate-T guard as the forward wrapper (a 1-patch
        # no-speaker segment breaks Mosaic's dot lowering): pad to the
        # 8-sublane multiple with -1e30 bias; dk/dv crop back below
        if k.shape[2] % 8:
            k = _pad_to(k, 2, 8)
            v = _pad_to(v, 2, 8)
            pad_w = [(0, 0)] * bias.ndim
            pad_w[2] = (0, -bias.shape[2] % 8)
            bias = jnp.pad(bias, pad_w, constant_values=_NEG)
        t = k.shape[2]
        in_specs += [
            pl.BlockSpec((1, 1, t, d), lambda bb, hh: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh: (bb, hh, 0, 0)),
            pl.BlockSpec((g, 1, 1, t), lambda bb, hh: (0, bb, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        args += [k, v, bias[:, :, None, :],
                 jnp.asarray(s_kv, jnp.float32).reshape(1)]
        out_specs += [
            pl.BlockSpec((1, 1, t, d), lambda bb, hh: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh: (bb, hh, 0, 0)),
        ]
        out_shapes += [jax.ShapeDtypeStruct(k.shape, k.dtype),
                       jax.ShapeDtypeStruct(v.shape, v.dtype)]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, s_real=s, nseg=nseg,
                          g_total=g),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    dq, dks, dvs = outs[0][:, :, :, :s], outs[1][:, :, :, :s], outs[2][:, :, :, :s]
    dsegs = []
    for i in range(nseg):
        dsegs += [outs[3 + 2 * i][:, :, :seg_ts[i]],
                  outs[4 + 2 * i][:, :, :seg_ts[i]]]
    return dq, dks, dvs, dsegs
