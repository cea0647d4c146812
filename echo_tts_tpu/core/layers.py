"""Core functional layers shared by the DiT and its encoders.

Everything here is a pure function over explicit parameter pytrees. The
fp32 "islands" inside the bf16 flow replicate the reference's cast sites
exactly (reference: model.py:76-83, 100-104) — required for seeded parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """fp32 RMS-norm with learned scale; weight may be (D,) or (H, Dh) for
    QK-norm (reference: model.py:86-104)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    xf = xf * weight.astype(jnp.float32)
    return xf.astype(dtype)


def timestep_embedding(t: jnp.ndarray, embed_size: int) -> jnp.ndarray:
    """Sinusoidal flow-time embedding, freqs 1000*exp(-ln(1e4)*k/half)
    (reference: model.py:27-43). t: (B,) -> (B, embed_size), dtype of t."""
    half = embed_size // 2
    freqs = 1000.0 * jnp.exp(
        -jnp.log(jnp.float32(10000.0)) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[..., None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    return emb.astype(t.dtype)


def low_rank_adaln(x: jnp.ndarray, cond_embed: jnp.ndarray, p: dict, eps: float):
    """LowRankAdaLN (reference: model.py:46-83).

    cond_embed: (B, 1, 3D) chunked into shift/scale/gate, each refined by a
    rank-r SiLU bottleneck with residual; x is fp32-RMS-normalized (no learned
    weight) then modulated; gate is tanh. Returns (x_mod, gate).
    """
    shift, scale, gate = jnp.split(cond_embed, 3, axis=-1)

    def refine(y, down, up_w, up_b):
        z = jax.nn.silu(y)
        z = z @ down
        z = z @ up_w + up_b
        return z + y

    shift = refine(shift, p["shift_down"], p["shift_up"]["w"], p["shift_up"]["b"])
    scale = refine(scale, p["scale_down"], p["scale_up"]["w"], p["scale_up"]["b"])
    gate = refine(gate, p["gate_down"], p["gate_up"]["w"], p["gate_up"]["b"])

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    xf = xf * (scale.astype(jnp.float32) + 1.0) + shift.astype(jnp.float32)

    gate = jnp.tanh(gate)
    return xf.astype(dtype), gate


def swiglu_mlp(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """w2(silu(w1 x) * w3 x) (reference: model.py:296-308)."""
    return (jax.nn.silu(x @ p["w1"]) * (x @ p["w3"])) @ p["w2"]


def precompute_adaln(cond_embed: jnp.ndarray, p: dict):
    """All-layer batched AdaLN refinement (same math as `low_rank_adaln`'s
    refine, reference model.py:46-75, but with the layer axis L batched into
    three einsum pairs instead of 6 tiny rank-r GEMMs per layer inside the
    trunk scan — the per-layer (B,3D)x(D,r) GEMMs are latency-bound at B=1).

    cond_embed: (B, 1, 3D); p: stacked AdaLN params with leading L axis.
    Returns (shift, scale, gate) each (L, B, 1, D); gate is already tanh'ed
    (model.py:79). Consumed per layer by `modulate_rms`.
    """
    shift, scale, gate = jnp.split(cond_embed, 3, axis=-1)

    def refine(y, down, up):
        z = jax.nn.silu(y)
        z = jnp.einsum("bod,ldr->lbor", z, down)
        z = jnp.einsum("lbor,lrd->lbod", z, up["w"]) + up["b"][:, None, None]
        return z + y[None]

    shift = refine(shift, p["shift_down"], p["shift_up"])
    scale = refine(scale, p["scale_down"], p["scale_up"])
    gate = jnp.tanh(refine(gate, p["gate_down"], p["gate_up"]))
    return shift, scale, gate


def modulate_rms(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray,
                 eps: float) -> jnp.ndarray:
    """fp32 weightless RMS-norm + shift/scale modulation — the per-layer tail
    of LowRankAdaLN (reference: model.py:76-78) with the refinements
    precomputed by `precompute_adaln`."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    xf = xf * (scale.astype(jnp.float32) + 1.0) + shift.astype(jnp.float32)
    return xf.astype(dtype)
