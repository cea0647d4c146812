#!/usr/bin/env python
"""One-time checkpoint conversion: reference torch safetensors -> native npz
pytrees (weight-norm folded, blockwise optionally stripped, dtype policy
applied) for fast reload without conversion cost (SURVEY.md §5.4).

Usage:
  python scripts/convert_checkpoint.py dit  pytorch_model.safetensors dit.npz \
      [--delete-blockwise] [--dtype bf16]
  python scripts/convert_checkpoint.py ae   fish.safetensors ae.npz [--dtype f32]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # honor the env var BEFORE backend init: this image pins an axon TPU
    # plugin that otherwise claims the backend and routes every op through
    # the remote relay (memory: axon-tpu-relay-pitfalls) — conversion is
    # host-side work and must not depend on relay availability
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

DTYPES = {"bf16": jnp.bfloat16, "f32": jnp.float32, "f16": jnp.float16}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["dit", "ae"])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--delete-blockwise", action="store_true")
    ap.add_argument("--dtype", default=None, choices=list(DTYPES))
    args = ap.parse_args()

    from echo_tts_tpu.checkpoints.io import (
        load_ae_from_safetensors,
        load_dit_from_safetensors,
        save_pytree,
    )

    if args.kind == "dit":
        dtype = DTYPES[args.dtype or "bf16"]
        params, cfg = load_dit_from_safetensors(
            args.src, dtype=dtype,
            delete_blockwise_modules=args.delete_blockwise)
    else:
        dtype = DTYPES[args.dtype or "f32"]
        params, cfg = load_ae_from_safetensors(args.src, dtype=dtype)

    save_pytree(args.dst, params)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(params))
    print(f"wrote {args.dst}: {n/1e6:.1f}M params, dtype {dtype.__name__}")


if __name__ == "__main__":
    main()
