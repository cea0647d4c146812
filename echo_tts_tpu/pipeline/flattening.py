"""End-of-speech "flattening point" detector, vectorized in XLA.

The reference scans Python-side per frame — a host sync and O(T*W) eager loop
(reference: inference.py:315-338). Here windowed mean/std come from cumulative
sums and the first qualifying index from one argmax — single fused kernel, no
host round-trip.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("window_size",))
def find_flattening_point(
    data: jnp.ndarray,          # (T, C) latents, fp32
    target_value: float = 0.0,
    window_size: int = 20,
    std_threshold: float = 0.05,
    mean_tol: float = 0.1,
) -> jnp.ndarray:
    """First index i in [0, T) whose [i, i+W) window (zero-padded past T) has
    unbiased std < std_threshold and |mean - target| < mean_tol; else T
    (reference: inference.py:315-330, torch .std() is Bessel-corrected)."""
    t, c = data.shape
    w = window_size
    n = w * c
    padded = jnp.concatenate([data, jnp.zeros((w, c), data.dtype)], axis=0)
    row_sum = jnp.sum(padded, axis=1)
    row_sq = jnp.sum(padded * padded, axis=1)
    cs = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(row_sum)])
    cq = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(row_sq)])
    win_sum = cs[w:] - cs[:-w]      # (T+1,) -> use first T
    win_sq = cq[w:] - cq[:-w]
    win_sum, win_sq = win_sum[:t], win_sq[:t]
    mean = win_sum / n
    var = (win_sq - n * mean * mean) / (n - 1)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    ok = jnp.logical_and(std < std_threshold, jnp.abs(mean - target_value) < mean_tol)
    first = jnp.argmax(ok)
    return jnp.where(jnp.any(ok), first, t).astype(jnp.int32)


def crop_audio_to_flattening_point(audio, latent, samples_per_latent: int = 2048):
    """reference: inference.py:333-338. audio (..., T_samples), latent (T, C).
    Host-side crop (dynamic output length)."""
    fp = int(find_flattening_point(latent))
    return audio[..., : fp * samples_per_latent]
