"""Flow-matching (rectified-flow, v-prediction) training loss
(reference: train_utils.py:282-371).

Quirk consciously fixed (SURVEY.md §7.4): the reference divides the masked
loss sum by the valid-element count TWICE (train_utils.py:356 AND 364); we
normalize once. NaN guards become `jnp.where` (no host sync).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from echo_tts_tpu.core.config import DiTConfig
from echo_tts_tpu.models.dit import dit_forward, get_kv_cache_speaker, get_kv_cache_text


def compute_diffusion_loss(
    params: dict,
    cfg: DiTConfig,
    rng: jax.Array,
    latent_target: jnp.ndarray,    # (B, T, 80) fp32
    latent_mask: jnp.ndarray,      # (B, T) bool
    text_input_ids: jnp.ndarray,
    text_mask: jnp.ndarray,
    speaker_latent: jnp.ndarray,
    speaker_mask: jnp.ndarray,
    model_dtype=jnp.bfloat16,
    train_encoders: bool = False,
    time_weight_range=(1.4, 0.8),
    t: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """t ~ U(0,1)^2 (front-loaded), x_t = (1-t)x0 + t*eps, target v = eps-x0,
    per-position linear time weighting, masked mean. t/noise injectable for
    seed-matched parity tests (RNG contract, SURVEY.md §4 item 1)."""
    b, t_len, d = latent_target.shape
    k_t, k_eps = jax.random.split(rng)

    if t is None:
        t = jax.random.uniform(k_t, (b,)) ** 2.0
    if noise is None:
        noise = jax.random.normal(k_eps, latent_target.shape, dtype=jnp.float32)
    te = t[:, None, None]
    x_t = (1.0 - te) * latent_target + te * noise
    v_target = noise - latent_target

    # conditioning caches; encoders frozen by default, mirroring the
    # reference's no_grad KV build (train_utils.py:331-333)
    enc_params = params if train_encoders else jax.lax.stop_gradient(params)
    kv_text = get_kv_cache_text(enc_params, cfg, text_input_ids, text_mask)
    kv_speaker = get_kv_cache_speaker(enc_params, cfg,
                                      speaker_latent.astype(model_dtype))
    if not train_encoders:
        kv_text = jax.lax.stop_gradient(kv_text)
        kv_speaker = jax.lax.stop_gradient(kv_speaker)

    # remat the trunk: without it the scan's backward saves every layer's
    # intermediates and full-size finetuning runs out of HBM.
    # The plain Pallas kernel has no autodiff rule, so training passes an
    # explicit differentiable impl: on TPU the custom-VJP wrapper (Pallas
    # forward AND backward kernels), elsewhere plain XLA. The configured
    # impl is respected when it is already differentiable.
    from echo_tts_tpu.models import dit as dit_mod

    configured = dit_mod._ATTN_IMPL
    if configured == "auto":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        train_impl = "pallas_vjp" if (on_tpu and cfg.head_dim % 128 == 0) else "xla"
    elif configured in ("pallas", "pallas_vjp"):
        train_impl = "pallas_vjp"
    elif configured in ("pallas_interpret", "pallas_vjp_interpret"):
        train_impl = "pallas_vjp_interpret"
    else:
        train_impl = "xla"
    v_pred = dit_forward(
        params, cfg, x_t.astype(model_dtype), t.astype(model_dtype),
        text_mask, speaker_mask, kv_text, kv_speaker, remat=True,
        attn_impl=train_impl)

    err = jnp.square(v_pred.astype(jnp.float32) - v_target)
    w = jnp.linspace(time_weight_range[0], time_weight_range[1], t_len)
    err = err * w[None, :, None]
    err = err * latent_mask[..., None].astype(jnp.float32)

    num_valid = jnp.sum(latent_mask) * d
    loss = jnp.sum(err) / jnp.maximum(num_valid, 1)
    # NaN/Inf guard -> zero loss (reference: train_utils.py:361-369), branchless
    return jnp.where(jnp.isfinite(loss), loss, 0.0)
