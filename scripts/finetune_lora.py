#!/usr/bin/env python
"""LoRA fine-tuning driver — the reference ships this flow as a Colab
notebook (reference: echo_tts_tinydata.ipynb: transcribe -> dataset ->
LoRA r16/alpha32 -> AdamW 5e-5 cosine -> best-val checkpoint). Same flow as a
script.

Usage:
  python scripts/finetune_lora.py --audio-dir DIR --transcripts t.json \
      --dit dit.safetensors --ae ae.safetensors --pca pca.safetensors \
      --out lora_best.npz [--epochs 20] [--rank 16] [--lr 5e-5]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio-dir", required=True)
    ap.add_argument("--transcripts", help="json {audio_path: text}; omit to run ASR")
    ap.add_argument("--dit", required=True)
    ap.add_argument("--ae", required=True)
    ap.add_argument("--pca", required=True)
    ap.add_argument("--out", default="lora_best.npz")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--alpha", type=float, default=32.0)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--val-frac", type=float, default=0.15)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (this image pins a TPU "
                         "plugin; the env var alone is not honored)")
    args = ap.parse_args()

    if args.cpu or os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # must run before any backend use — the pinned axon TPU plugin
        # otherwise claims the backend and every jit goes through the relay
        jax.config.update("jax_platforms", "cpu")

    from echo_tts_tpu.checkpoints.io import load_ae_from_safetensors, load_dit_from_safetensors
    from echo_tts_tpu.models.pca import PCAState
    from echo_tts_tpu.train.data import (
        EchoTTSDataset, batches, batches_prefetch, collate,
        prepare_samples_from_directory,
        transcribe_audio_files)
    from echo_tts_tpu.train.loop import TrainConfig, make_train_step
    from echo_tts_tpu.train.lora import LoRAConfig, init_lora, save_lora_checkpoint
    from echo_tts_tpu.train.loss import compute_diffusion_loss

    # bf16 on TPU (the reference trains under bf16 autocast,
    # train_utils.py:460-465); fp32 on CPU — the CPU XLA backend has no
    # bf16-accumulating dot
    model_dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    dit_params, dit_cfg = load_dit_from_safetensors(
        args.dit, delete_blockwise_modules=True, dtype=model_dtype)
    ae_params, ae_cfg = load_ae_from_safetensors(args.ae)
    pca = PCAState.from_safetensors(args.pca)

    if args.transcripts:
        with open(args.transcripts) as f:
            transcripts = json.load(f)
    else:
        from echo_tts_tpu.train.data import AUDIO_EXTENSIONS
        from pathlib import Path

        paths = [str(p) for ext in AUDIO_EXTENSIONS
                 for p in Path(args.audio_dir).glob(f"*{ext}")]
        transcripts = transcribe_audio_files(sorted(paths))

    samples = prepare_samples_from_directory(args.audio_dir, transcripts)
    print(f"{len(samples)} samples")
    rng = np.random.default_rng(args.seed)
    rng.shuffle(samples)
    n_val = max(1, int(len(samples) * args.val_frac))
    val_samples, train_samples = samples[:n_val], samples[n_val:]

    ds = EchoTTSDataset(train_samples, ae_params, ae_cfg, pca)
    val_ds = EchoTTSDataset(val_samples, ae_params, ae_cfg, pca)

    steps_per_epoch = max(1, len(ds) // args.batch_size)
    tc = TrainConfig(learning_rate=args.lr, warmup_steps=steps_per_epoch,
                     total_steps=steps_per_epoch * args.epochs)
    lc = LoRAConfig(rank=args.rank, alpha=args.alpha)
    lora = init_lora(jax.random.PRNGKey(args.seed), dit_params, lc)
    opt, step = make_train_step(dit_cfg, tc, model_dtype=model_dtype,
                                lora_cfg=lc)
    opt_state = opt.init(lora)

    def val_loss(lora):
        from echo_tts_tpu.train.lora import apply_lora

        params_eff = apply_lora(dit_params, lora, lc)
        tot, n = 0.0, 0
        for b in batches(val_ds, args.batch_size, np.random.default_rng(0)):
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            tot += float(compute_diffusion_loss(
                params_eff, dit_cfg, jax.random.PRNGKey(0),
                jb["latent"], jb["latent_mask"], jb["text_input_ids"],
                jb["text_mask"], jb["speaker_latent"], jb["speaker_mask"],
                model_dtype=model_dtype))
            n += 1
        return tot / max(n, 1)

    best = float("inf")
    key = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs):
        tot, n = 0.0, 0
        # producer thread collates the next batches while the device steps
        for b in batches_prefetch(ds, args.batch_size, rng, prefetch=2):
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            key, sub = jax.random.split(key)
            lora, opt_state, loss = step(dit_params, lora, opt_state, sub, jb)
            tot += float(loss)
            n += 1
        vl = val_loss(lora)
        print(f"epoch {epoch}: train {tot / max(n, 1):.4f} val {vl:.4f}")
        if vl < best:
            best = vl
            save_lora_checkpoint(args.out, lora, lc,
                                 extra={"epoch": epoch, "val_loss": vl})
            print(f"  saved {args.out}")


if __name__ == "__main__":
    main()
