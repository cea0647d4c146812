"""Rotary position embeddings, TPU-native.

The reference builds complex-valued `freqs_cis` tables and does complex
multiplies (reference: model.py:9-24). Complex dtypes lower poorly on TPU, so
we keep real (cos, sin) tables in fp32 and do the 2x2 rotation explicitly —
identical math, MXU/VPU friendly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def precompute_rope(dim: int, end: int, theta: float = 10000.0):
    """(cos, sin) tables of shape (end, dim//2), fp32.

    Matches reference model.py:9-14: freqs = theta ** -(2i/dim), angles = t*f.
    Computed host-side in float64 then cast, so long tables stay accurate.
    """
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    t = np.arange(end, dtype=np.float64)
    angles = np.outer(t, freqs)
    return (
        jnp.asarray(np.cos(angles), dtype=jnp.float32),
        jnp.asarray(np.sin(angles), dtype=jnp.float32),
    )


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate x of shape (..., B, S, H, D) by per-position tables.

    Tables are (S, D//2) shared across the batch, or (B, S, D//2) PER-ROW —
    the continuous-batching path, where concurrent streams in one device
    batch sit at different absolute positions (each row's table is gathered
    at its own start offset).

    Pairs are adjacent lanes (x0,x1),(x2,x3),... matching the reference's
    `view_as_complex(x.reshape(..., -1, 2))` (model.py:17-24). Math in fp32,
    result cast back to x.dtype.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xr = xf[..., 0::2]
    xi = xf[..., 1::2]
    if cos.ndim == 2:
        c = cos[:, None, :]  # (S, 1, D//2) broadcasting over batch and heads
        s = sin[:, None, :]
    else:
        c = cos[:, :, None, :]  # (B, S, 1, D//2): per-row positions; a
        s = sin[:, :, None, :]  # leading group axis on x still broadcasts
    or_ = xr * c - xi * s
    oi_ = xr * s + xi * c
    out = jnp.stack([or_, oi_], axis=-1).reshape(x.shape)
    return out.astype(dtype)


def apply_rope_half_heads(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """RoPE on the FIRST HALF of heads only — the DiT joint-attention variant
    (reference: model.py:199-202 `_apply_rotary_half`). x: (B, S, H, D)."""
    h = x.shape[-2] // 2
    return jnp.concatenate([apply_rope(x[..., :h, :], cos, sin), x[..., h:, :]], axis=-2)
