"""Attention ops for TPU.

`sdpa` — plain XLA einsum-softmax attention. XLA fuses this well for the
encoder extents in Echo-TTS (<=1600 tokens, run once per request); the DiT
hot loop uses the Pallas fused segmented kernel instead
(ops/pallas_attention.py, dispatched inside models/dit.py).

Contract (mirrors reference F.scaled_dot_product_attention use at
model.py:148-154, 255-261): q (B,S,H,D), k/v (B,T,H,D), boolean key mask
(B,T) where True = attend, optional causal. Logits accumulate in fp32.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = jnp.float32(-1e30)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    is_causal: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, S, H, D) layouts.

    mask: optional bool (B, T) key mask (True = visible), matching the
    reference's `mask[:, None, None]` broadcast (model.py:144-147, 252-253).
    """
    *_, s, _h, d = q.shape
    t = k.shape[-3]
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale

    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, _NEG_INF)
    if is_causal:
        # torch is_causal uses a lower-triangular S x T mask anchored top-left
        causal = jnp.tril(jnp.ones((s, t), dtype=jnp.bool_))
        logits = jnp.where(causal[None, None], logits, _NEG_INF)

    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhst,bthd->bshd", weights.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)
