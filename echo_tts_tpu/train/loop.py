"""Training loop: optax AdamW + warmup-cosine + global-norm clipping with
NaN-step skipping (reference: train_utils.py:379-543, echo_tts_tinydata.ipynb
hyperparameters). Works in two modes: full-parameter or LoRA side-car (only
the adapters receive gradients, base frozen — reference lora.py:51-54)."""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from echo_tts_tpu.core.config import DiTConfig
from echo_tts_tpu.train.loss import compute_diffusion_loss
from echo_tts_tpu.train.lora import LoRAConfig, apply_lora


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-5        # notebook cell 7
    weight_decay: float = 0.01
    max_grad_norm: float = 0.4         # reference train_utils.py:435
    warmup_steps: int = 100
    total_steps: int = 1000
    min_lr_ratio: float = 0.1          # reference train_utils.py:526-543
    gradient_accumulation_steps: int = 1


def cosine_schedule_with_warmup(tc: TrainConfig):
    """reference: train_utils.py:526-543."""

    def sched(step):
        warm = step / jnp.maximum(tc.warmup_steps, 1)
        progress = (step - tc.warmup_steps) / jnp.maximum(
            tc.total_steps - tc.warmup_steps, 1)
        cos = jnp.maximum(tc.min_lr_ratio,
                          0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        return tc.learning_rate * jnp.where(step < tc.warmup_steps, warm, cos)

    return sched


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    opt = optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        optax.adamw(learning_rate=cosine_schedule_with_warmup(tc),
                    weight_decay=tc.weight_decay),
    )
    # NaN/Inf gradient steps are skipped, not applied
    # (reference: train_utils.py:489-513)
    opt = optax.apply_if_finite(opt, max_consecutive_errors=100)
    if tc.gradient_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, tc.gradient_accumulation_steps)
    return opt


def make_train_step(cfg: DiTConfig, tc: TrainConfig, model_dtype=jnp.bfloat16,
                    lora_cfg: Optional[LoRAConfig] = None,
                    train_encoders: bool = False):
    """Returns (optimizer, jitted step).

    Full mode:  step(params, opt_state, rng, batch) -> (params, opt_state, loss)
    LoRA mode:  step(base_params, lora, opt_state, rng, batch) -> (lora, ...)
    batch: dict with latent, latent_mask, text_input_ids, text_mask,
    speaker_latent, speaker_mask.
    """
    opt = make_optimizer(tc)

    def loss_from(params, rng, batch):
        return compute_diffusion_loss(
            params, cfg, rng,
            batch["latent"], batch["latent_mask"],
            batch["text_input_ids"], batch["text_mask"],
            batch["speaker_latent"], batch["speaker_mask"],
            model_dtype=model_dtype, train_encoders=train_encoders)

    if lora_cfg is None:

        @jax.jit
        def step(params, opt_state, rng, batch):
            loss, grads = jax.value_and_grad(loss_from)(params, rng, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return opt, step

    @jax.jit
    def lora_step(base_params, lora, opt_state, rng, batch):
        def lora_loss(lora):
            params_eff = apply_lora(base_params, lora, lora_cfg)
            return loss_from(params_eff, rng, batch)

        loss, grads = jax.value_and_grad(lora_loss)(lora)
        updates, opt_state = opt.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return opt, lora_step
