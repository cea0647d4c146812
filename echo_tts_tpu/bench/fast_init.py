"""Fast host-side random initialization for benchmarks.

`jax.random` init of 2.4B params through the remote-compile tunnel costs
minutes; benches only need correctly-shaped, well-scaled values. We take the
pytree structure from `jax.eval_shape` over the real initializer and fill it
with numpy RNG on the host, then device_put once.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np


def fast_random_like(init_fn: Callable[[], Any], seed: int = 0,
                     scale: float = 0.02) -> Any:
    """Shapes/dtypes from init_fn (never executed on device), values from
    numpy: ~N(0, scale) for weight-like leaves, ones for 1-D scale vectors."""
    shapes = jax.eval_shape(init_fn)
    rng = np.random.default_rng(seed)

    def fill(leaf):
        if leaf.ndim <= 1:
            return np.ones(leaf.shape, dtype=np.float32).astype(leaf.dtype)
        return (scale * rng.standard_normal(leaf.shape, dtype=np.float32)
                ).astype(leaf.dtype)

    host = jax.tree_util.tree_map(fill, shapes)
    return jax.tree_util.tree_map(jax.device_put, host)
