#!/usr/bin/env python
"""Hot-path breakdown on the real TPU: times the DiT CFG forward, a pure
matmul skeleton with identical GEMM shapes (MXU upper bound), the KV builds,
and the vocoder stage by stage. Guides kernel work — run ad hoc, prints a
table to stderr and one JSON line to stdout.

Relay-safe timing (memory: axon-tpu-relay-pitfalls): every measurement loops
inside one jit over data-dependent inputs (iteration index folded in) and
fetches a scalar; repeats use distinct inputs so the relay cannot serve a
cached execution.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from echo_tts_tpu.core.config import AEConfig, DiTConfig
from echo_tts_tpu.bench.init_ae import init_ae_params
from echo_tts_tpu.models import s1dac
from echo_tts_tpu.models.dit import (
    dit_forward,
    dit_forward_cfg,
    get_kv_cache_speaker,
    get_kv_cache_text,
    init_dit_params,
)

SEQ, TEXT, SPK = 640, 768, 6400
INNER = 8  # loop reps inside each timed jit


def timed(name, fn, *args, reps=3):
    """fn must be a jitted callable (args..., salt:int32) -> scalar."""
    fn(*args, jnp.int32(0)).block_until_ready()  # compile
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        float(fn(*args, jnp.int32(r + 1)))
        best = min(best, time.perf_counter() - t0)
    ms = best / INNER * 1e3
    print(f"{name:44s} {ms:9.2f} ms", file=sys.stderr)
    return ms


def main():
    dit_cfg = DiTConfig(has_latent_modules=False)
    ae_cfg = AEConfig()
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: init_dit_params(k, dit_cfg, dtype=jnp.bfloat16))(key)
    ae = jax.jit(lambda k: init_ae_params(k, ae_cfg, dtype=jnp.bfloat16))(
        jax.random.fold_in(key, 1))
    jax.block_until_ready((params, ae))

    ids = jax.random.randint(key, (1, TEXT), 0, 256)
    tmask = jnp.ones((1, TEXT), jnp.bool_)
    smask = jnp.ones((1, SPK), jnp.bool_)
    slat = jax.random.normal(key, (1, SPK, dit_cfg.latent_size), jnp.bfloat16)

    kv_text = get_kv_cache_text(params, dit_cfg, ids, tmask)
    kv_speaker = get_kv_cache_speaker(params, dit_cfg, slat)
    jax.block_until_ready((kv_text, kv_speaker))
    x0 = jax.random.normal(key, (1, SEQ, dit_cfg.latent_size), jnp.float32)

    res = {}

    # ---- DiT forwards ------------------------------------------------------
    @jax.jit
    def fwd_cfg(params, kv_text, kv_speaker, x0, salt):
        def body(x, i):
            t = jnp.full((1,), 0.7, jnp.float32).astype(jnp.bfloat16)
            v = dit_forward_cfg(params, dit_cfg, x.astype(jnp.bfloat16),
                                t, tmask, smask, kv_text, kv_speaker)
            return x + 1e-6 * (v[0] + v[1] - v[2]), None

        x, _ = jax.lax.scan(body, x0 + 1e-6 * salt, jnp.arange(INNER))
        return x.sum()

    res["cfg3_forward"] = timed("3-branch CFG forward", fwd_cfg, params,
                                kv_text, kv_speaker, x0)

    @jax.jit
    def fwd_single(params, kv_text, kv_speaker, x0, salt):
        def body(x, i):
            t = jnp.full((1,), 0.3, jnp.float32).astype(jnp.bfloat16)
            v = dit_forward(params, dit_cfg, x.astype(jnp.bfloat16),
                            t, tmask, smask, kv_text, kv_speaker)
            return x + 1e-6 * v, None

        x, _ = jax.lax.scan(body, x0 + 1e-6 * salt, jnp.arange(INNER))
        return x.sum()

    res["single_forward"] = timed("1-branch forward", fwd_single, params,
                                  kv_text, kv_speaker, x0)

    # ---- matmul skeleton: identical GEMMs, no attention/norm/rope ---------
    def skeleton(tokens):
        @jax.jit
        def run(params, x0, salt):
            blocks = params["blocks"]

            def body(x, p):
                a, m = p["attention"], p["mlp"]
                q = x @ a["wq"]
                k = x @ a["wk"]
                v = x @ a["wv"]
                gte = x @ a["gate"]
                o = (q + k + v + gte) @ a["wo"]
                x = x + o
                h = jax.nn.silu(x @ m["w1"]) * (x @ m["w3"])
                return x + h @ m["w2"], None

            x, _ = jax.lax.scan(
                lambda x, i: (jax.lax.scan(body, x, blocks)[0] * (1 + 1e-7 * i), None),
                x0 + 1e-6 * salt, jnp.arange(INNER))
            return x.sum()

        x0s = jax.random.normal(key, (tokens, dit_cfg.model_size), jnp.bfloat16)
        return run, x0s

    run3, x3 = skeleton(3 * SEQ)
    res["skeleton_1920tok"] = timed("matmul skeleton @1920 tok", run3, params, x3)
    run1, x1 = skeleton(SEQ)
    res["skeleton_640tok"] = timed("matmul skeleton @640 tok", run1, params, x1)

    # ---- KV builds ---------------------------------------------------------
    @jax.jit
    def kvb(params, ids, slat, salt):
        def body(c, i):
            kt = get_kv_cache_text(params, dit_cfg, ids + 0 * (i + salt), tmask)
            ks = get_kv_cache_speaker(params, dit_cfg,
                                      slat * (1 + 1e-6 * (i + salt)))
            return c + kt[0].mean() + ks[0].mean(), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))
        return c

    res["kv_build"] = timed("KV build (text+speaker)", kvb, params, ids, slat)

    # ---- vocoder stages ----------------------------------------------------
    zq = jax.random.normal(key, (1, ae_cfg.latent_dim, SEQ), jnp.bfloat16)

    def stage(name, f, x_in):
        @jax.jit
        def run(ae, x, salt):
            def body(c, i):
                y = f(ae, x * (1 + 1e-6 * (i + salt)))
                return c + y.mean().astype(jnp.float32), None

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))
            return c

        res[name] = timed(name, run, ae, x_in)

    stage("voc_post_module",
          lambda ae, z: s1dac._q_transformer(ae, ae_cfg, "post_module", z), zq)
    post = s1dac._q_transformer(ae, ae_cfg, "post_module", zq)
    stage("voc_upsample", lambda ae, z: s1dac._upsample(ae, ae_cfg, z), post)
    up = s1dac._upsample(ae, ae_cfg, post)
    stage("voc_decoder", lambda ae, z: s1dac.decoder_forward(ae, ae_cfg, z), up)
    stage("voc_total", lambda ae, z: s1dac.decode_zq(ae, ae_cfg, z), zq)

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
