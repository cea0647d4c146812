"""PCA latent projection: 1024-d z_q <-> 80-d model latents
(reference: inference.py:116-135, 223-244). Always fp32 (inference.py:227,234)."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PCAState:
    components: jnp.ndarray  # (80, 1024)
    mean: jnp.ndarray        # (1024,)
    latent_scale: float

    @staticmethod
    def from_arrays(components, mean, latent_scale) -> "PCAState":
        return PCAState(jnp.asarray(components, jnp.float32),
                        jnp.asarray(mean, jnp.float32), float(latent_scale))

    @staticmethod
    def from_safetensors(path: str) -> "PCAState":
        """Schema of the reference's pca_state.safetensors
        (reference: inference.py:123-135)."""
        from safetensors.numpy import load_file

        t = load_file(path)
        return PCAState.from_arrays(t["pca_components"], t["pca_mean"],
                                    float(np.asarray(t["latent_scale"])))

    @staticmethod
    def random(key_seed: int = 0, latent_dim: int = 1024, out_dim: int = 80) -> "PCAState":
        """Random projection for benches/tests without weights: orthonormal
        rows when out_dim <= latent_dim, plain gaussian otherwise (tiny test
        configs have latent_dim < out_dim)."""
        rng = np.random.default_rng(key_seed)
        if out_dim <= latent_dim:
            q, _ = np.linalg.qr(rng.standard_normal((latent_dim, latent_dim)))
            comp = q[:out_dim]
        else:
            comp = 0.3 * rng.standard_normal((out_dim, latent_dim))
        return PCAState.from_arrays(comp, rng.standard_normal(latent_dim) * 0.01, 1.0)


jax.tree_util.register_pytree_node(
    PCAState,
    lambda p: ((p.components, p.mean), p.latent_scale),
    lambda scale, children: PCAState(children[0], children[1], scale),
)


def project(pca: PCAState, z_q: jnp.ndarray) -> jnp.ndarray:
    """(B, 1024, T) channels-first z_q -> (B, T, 80) model latents
    (reference: inference.py:223-229)."""
    z = z_q.astype(jnp.float32).transpose(0, 2, 1)
    z = (z - pca.mean) @ pca.components.T
    return z * pca.latent_scale


def deproject(pca: PCAState, latents: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 80) -> (B, 1024, T) (reference: inference.py:232-235)."""
    z = (latents.astype(jnp.float32) / pca.latent_scale) @ pca.components + pca.mean
    return z.transpose(0, 2, 1)
