#!/usr/bin/env python
"""Full-size LoRA finetune train-step bench on the real TPU.

Proves the remat'd trunk fits HBM at serving scale and measures steps/s —
the finetune story (reference: echo_tts_tinydata.ipynb, 16 GB+ GPU envelope).
Shapes: batch 8, 640 target latents, 768 text bytes, 640 speaker latents
(30 s reference audio, the dataset default — train/data.py).

Relay-safe timing (memory: axon-tpu-relay-pitfalls): each timed step gets a
distinct salted batch so the relay cannot serve a cached execution.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from echo_tts_tpu.core.config import DiTConfig
from echo_tts_tpu.models.dit import init_dit_params
from echo_tts_tpu.train.loop import TrainConfig, make_train_step
from echo_tts_tpu.train.lora import LoRAConfig, init_lora

B, SEQ, TEXT, SPK = 8, 640, 768, 640


def main():
    cfg = DiTConfig(has_latent_modules=False)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: init_dit_params(k, cfg, dtype=jnp.bfloat16))(key)
    jax.block_until_ready(params)
    print("# params ready", file=sys.stderr)

    lc = LoRAConfig(rank=16, alpha=32.0)
    lora = init_lora(jax.random.PRNGKey(1), params, lc)
    opt, step = make_train_step(cfg, TrainConfig(learning_rate=5e-5), lora_cfg=lc)
    opt_state = opt.init(lora)

    def batch(i):
        k = jax.random.fold_in(key, 100 + i)
        ks = jax.random.split(k, 3)
        return {
            "latent": jax.random.normal(ks[0], (B, SEQ, cfg.latent_size), jnp.float32),
            "latent_mask": jnp.ones((B, SEQ), jnp.bool_),
            "text_input_ids": jax.random.randint(ks[1], (B, TEXT), 0, 256),
            "text_mask": jnp.ones((B, TEXT), jnp.bool_),
            "speaker_latent": jax.random.normal(ks[2], (B, SPK, cfg.latent_size), jnp.float32),
            "speaker_mask": jnp.ones((B, SPK), jnp.bool_),
        }

    t0 = time.time()
    lora, opt_state, loss = step(params, lora, opt_state, jax.random.PRNGKey(2), batch(0))
    print(f"# compile+first step {time.time()-t0:.1f}s loss={float(loss):.4f}",
          file=sys.stderr)

    times = []
    for i in range(3):
        t0 = time.time()
        lora, opt_state, loss = step(params, lora, opt_state,
                                     jax.random.fold_in(key, i), batch(i + 1))
        float(loss)  # fence
        times.append(time.time() - t0)
    ms = min(times) * 1e3
    print(f"# step {ms:.0f}ms, {B/min(times):.1f} samples/s, loss={float(loss):.4f}",
          file=sys.stderr)
    import json

    print(json.dumps({"metric": "LoRA train step, B=8 @640 latents",
                      "value": round(ms, 1), "unit": "ms"}))


if __name__ == "__main__":
    main()
