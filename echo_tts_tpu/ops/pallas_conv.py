"""Pallas TPU kernel: fused causal residual-unit chain for the S1-DAC
decoder/encoder conv stacks (reference: autoencoder.py:879-900).

A residual unit is `x + conv1x1(snake(conv7_dil(snake(x))))`. The XLA
shifted-matmul formulation (models/s1dac.py:_residual_unit_cl) runs each of
the 7 taps as a separate HBM-level GEMM with pad/slice copies between them —
at the decoder tail (C=96..192, T up to 1.3M rows) that is 15+ HBM passes
over ~250 MB tensors per unit, measured ~22 TFLOP/s (scripts/ablate_dit.py).

This kernel runs a whole chain of residual units (dilations 1,3,9) over one
time-tile entirely in VMEM: one HBM read of the tile (+ a halo from the
previous tile), all snakes/taps/residuals on-chip, one HBM write.

Halo correctness: each program loads [t0 - H, t0 + TQ) where H covers the
chain's total receptive extent (sum of 6*dilation per unit, rounded up to the
sublane tile). Every unit is computed over the full window with zero padding
at the *window* edge; rows whose true left context was cut off are garbage,
but they live strictly inside the discarded [0, H) prefix — row r of unit u's
output only reads rows >= r - 6*d_u, so the garbage never propagates into
[H, H + TQ). For the first tile the zero pad IS the causal pad.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# sin²(t) as a range-reduced polynomial. Mosaic's math.sin lowering costs
# ~70% of the whole residual-chain kernel (scripts/bench_conv_kernel_variants
# .py: 44 -> 13 ms/chain with sin removed); sin² is π-periodic and even, so
# with r = t/π, f = r - round(r) ∈ [-½, ½], z = f² ∈ [0, ¼]:
#     sin²(t) = z · P(z)
# where P is a degree-6 least-squares fit on Chebyshev nodes
# (max |err| 2.3e-10 — below fp32 eps, vs the 2e-5 kernel-parity tolerance).
_INV_PI = 0.3183098861837907
_SIN2_P = (9.869604400158666, -32.469696645585955, 42.72838511692447,
           -30.12175436025362, 13.206610352068088, -3.9130777124895926,
           0.7419801209608292)


def _sin2(t):
    r = t * _INV_PI
    f = r - jnp.round(r)
    z = f * f
    p = jnp.float32(_SIN2_P[-1])
    for c in _SIN2_P[-2::-1]:
        p = p * z + jnp.float32(c)
    return z * p


def _res_chain_kernel(zb_ref, x_cur, x_prev, a1, a2, w7, b7, w1, b1, o_ref, *,
                      dilations: Sequence[int], halo: int, kernel_size: int):
    bb = pl.program_id(0)
    ii = pl.program_id(1)
    cur = x_cur[0]                      # (TQ, C)
    prev_tail = x_prev[0][-halo:, :]    # (H, C) — garbage when ii == 0
    prev_tail = jnp.where(ii == 0, jnp.zeros_like(prev_tail), prev_tail)
    x = jnp.concatenate([prev_tail, cur], axis=0)  # (H + TQ, C)
    twin = x.shape[0]
    in_dtype = x.dtype
    # Tile 0's window is [synthetic zero prefix (halo rows) | sequence rows].
    # The prefix stands for each conv's own causal zero pad and must be
    # re-zeroed after every unit (unit outputs are nonzero on zero input —
    # biases — but the reference zero-pads each conv's OWN input). zb_ref is
    # the count of EXTRA leading SEQUENCE rows with the same
    # stands-for-the-pad meaning: streaming callers whose sequence starts
    # with a zero-initialized carried tail pass the tail length at stream
    # start (the tail rows sit at window rows [halo, halo+zb) — window
    # coordinates include the prefix) and 0 mid-stream.
    row = jax.lax.broadcasted_iota(jnp.int32, (twin, 1), 0)
    live = jnp.logical_or(ii > 0, row >= halo + zb_ref[bb])

    for u, d in enumerate(dilations):
        # snake1 (fp32 on the VPU, cast back for the MXU)
        xf = x.astype(jnp.float32)
        au = a1[u].astype(jnp.float32)
        y = (xf + (1.0 / (au + 1e-9)) * _sin2(au * xf)).astype(in_dtype)
        # dilated k-tap causal conv as tap-shifted in-VMEM matmuls
        pad = (kernel_size - 1) * d
        yp = jnp.concatenate(
            [jnp.zeros((pad,) + y.shape[1:], in_dtype), y], axis=0)
        acc = jnp.broadcast_to(b7[u].astype(jnp.float32)[None, :],
                               (twin, b7.shape[-1]))
        for j in range(kernel_size):
            acc = acc + jax.lax.dot(yp[j * d : j * d + twin], w7[u, j],
                                    preferred_element_type=jnp.float32)
        # snake2
        a2u = a2[u].astype(jnp.float32)
        y = acc + (1.0 / (a2u + 1e-9)) * _sin2(a2u * acc)
        # 1x1 conv + residual
        y = jax.lax.dot(y.astype(in_dtype), w1[u],
                        preferred_element_type=jnp.float32) + b1[u].astype(jnp.float32)
        x = (x.astype(jnp.float32) + y).astype(in_dtype)
        x = jnp.where(live, x, jnp.zeros_like(x))

    o_ref[0] = x[halo:, :]


def chain_ctx(dilations: Sequence[int] = (1, 3, 9), kernel_size: int = 7) -> int:
    """Left-context rows a residual-unit chain needs for exact streaming:
    the kernel's halo (receptive extent rounded to the sublane tile). The
    streaming decode (models/s1dac.py) carries this many rows of chain INPUT
    between chunks and passes zero_below accordingly."""
    return _round_up(sum((kernel_size - 1) * d for d in dilations), 16)


def fused_res_chain_cl(x: jnp.ndarray, units: Sequence[dict],
                       dilations: Sequence[int], *, kernel_size: int = 7,
                       tile_t: int = 2048, interpret: bool = False,
                       zero_below=None) -> jnp.ndarray:
    """Apply a chain of causal residual units to channels-last x (B, T, C).

    units: list of param dicts {snake1 (1,C,1), conv1 {w (O,I,K), b}, snake2,
    conv2 {w (O,I,1), b}} — same pytree as models.s1dac._residual_unit_cl.
    Matches the XLA path bit-for-tolerance (tests/test_pallas_conv.py).

    zero_below: optional traced int32, scalar or (B,) per-row — EXTRA leading
    SEQUENCE rows (beyond the kernel's own synthetic zero prefix, which is
    always re-zeroed) re-zeroed after every unit because they stand for the
    causal zero pad.
    Default (None/0) = x starts the sequence with no carried rows. Streaming
    callers whose x is [carried tail | chunk] pass the tail length
    (chain_ctx(...)) when the stream starts — zero-initialized tail rows ARE
    the pad — and 0 mid-stream (the tail then holds real context).
    """
    b, t, c = x.shape
    n = len(units)
    assert len(dilations) == n

    halo = _round_up(sum((kernel_size - 1) * d for d in dilations), 16)
    if zero_below is None:
        zero_below = 0
    # scalar or (B,) per-row (continuous batching: rows of one device batch
    # at different stream positions); the kernel indexes by the batch
    # program id either way
    zb = jnp.broadcast_to(jnp.asarray(zero_below, jnp.int32).reshape(-1), (b,))
    # shrink the time tile as channels grow so window temps + weights fit
    # VMEM (~0.4 MB per in/out block, several fp32 temps of window size)
    tq = tile_t
    while tq > 256 and tq * c * x.dtype.itemsize > 512 * 1024:
        tq //= 2
    pad_t = _round_up(max(t, tq), tq) - t
    xp = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0))) if pad_t else x
    nt = xp.shape[1] // tq

    a1 = jnp.stack([u["snake1"].reshape(-1) for u in units])          # (U, C)
    a2 = jnp.stack([u["snake2"].reshape(-1) for u in units])
    w7 = jnp.stack([jnp.transpose(u["conv1"]["w"], (2, 1, 0)) for u in units])
    b7 = jnp.stack([u["conv1"].get("b", jnp.zeros((c,), x.dtype)) for u in units])
    w1 = jnp.stack([jnp.transpose(u["conv2"]["w"], (2, 1, 0))[0] for u in units])
    b1 = jnp.stack([u["conv2"].get("b", jnp.zeros((c,), x.dtype)) for u in units])

    grid = (b, nt)

    out = pl.pallas_call(
        functools.partial(_res_chain_kernel, dilations=tuple(dilations),
                          halo=halo, kernel_size=kernel_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq, c), lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec((1, tq, c), lambda bb, ii: (bb, jnp.maximum(ii - 1, 0), 0)),
            pl.BlockSpec((n, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((n, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((n, kernel_size, c, c), lambda bb, ii: (0, 0, 0, 0)),
            pl.BlockSpec((n, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((n, c, c), lambda bb, ii: (0, 0, 0)),
            pl.BlockSpec((n, c), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, c), lambda bb, ii: (bb, ii, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=interpret,
    )(zb, xp, xp, a1, a2, w7, b7, w1, b1)
    return out[:, :t] if pad_t else out


# chain the 3 units in one kernel while their conv7 weights fit ~8 MB of VMEM
_CHAIN_WEIGHT_BYTES = 8 * 1024 * 1024


def res_units_cl(x: jnp.ndarray, units: Sequence[dict],
                 dilations: Sequence[int] = (1, 3, 9), *,
                 kernel_size: int = 7, interpret: bool = False,
                 zero_below=None) -> jnp.ndarray:
    """Dispatch: one fused chain when weights fit VMEM, else per-unit calls
    (C=768's 25 MB of conv7 weights exceed VMEM). zero_below (see
    fused_res_chain_cl) applies per call either way — each unit re-zeroes its
    own pre-sequence rows, which is exactly the reference's per-conv pad."""
    c = x.shape[-1]
    wbytes = len(units) * kernel_size * c * c * x.dtype.itemsize
    if wbytes <= _CHAIN_WEIGHT_BYTES:
        return fused_res_chain_cl(x, units, dilations,
                                  kernel_size=kernel_size, interpret=interpret,
                                  zero_below=zero_below)
    for u, d in zip(units, dilations):
        x = fused_res_chain_cl(x, [u], (d,), kernel_size=kernel_size,
                               interpret=interpret, zero_below=zero_below)
    return x
