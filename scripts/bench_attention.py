#!/usr/bin/env python
"""Micro-bench for the fused joint-attention kernel at serving shapes.

scripts/ablate_dit.py shows attention costs ~33.5 ms of the 62 ms 3-branch
CFG forward (24 layers -> ~1.4 ms/layer) while its matmul FLOPs are ~0.45
ms/layer — this script times kernel variants to find the gap: q-tile size,
softmax max-subtraction, per-branch segment skipping (uncond branches mask
whole segments — computing then discarding them is ~22% wasted work).

Diagnostic only. Relay-safe timing (memory: axon-tpu-relay-pitfalls).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from echo_tts_tpu.ops.pallas_attention import joint_attention_grouped_pallas

G, B, H, S, D = 3, 1, 16, 640, 128
T_TEXT, T_SPK = 768, 1600
LAYERS = 8  # loop reps inside the jit (stands in for the 24-layer scan)


def timed(name, fn, *args, reps=3):
    fn(*args, jnp.int32(0)).block_until_ready()
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        float(fn(*args, jnp.int32(r + 1)))
        best = min(best, time.perf_counter() - t0)
    ms = best / LAYERS * 1e3
    print(f"{name:48s} {ms:9.3f} ms/layer   ({ms*24:6.1f} ms/24L)",
          file=sys.stderr)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (G, B, H, S, D), jnp.bfloat16)
    k_self = jax.random.normal(ks[1], (G, B, H, S, D), jnp.bfloat16)
    v_self = jax.random.normal(ks[2], (G, B, H, S, D), jnp.bfloat16)
    kt = jax.random.normal(ks[3], (B, H, T_TEXT, D), jnp.bfloat16)
    vt = jax.random.normal(ks[4], (B, H, T_TEXT, D), jnp.bfloat16)
    ksp = jax.random.normal(ks[5], (B, H, T_SPK, D), jnp.bfloat16)
    vsp = jax.random.normal(ks[6], (B, H, T_SPK, D), jnp.bfloat16)
    # CFG masks: cond all-true; text-uncond zeroes text; spk-uncond zeroes spk
    tm = jnp.stack([jnp.ones((B, T_TEXT), jnp.bool_),
                    jnp.zeros((B, T_TEXT), jnp.bool_),
                    jnp.ones((B, T_TEXT), jnp.bool_)])
    sm = jnp.stack([jnp.ones((B, T_SPK), jnp.bool_),
                    jnp.ones((B, T_SPK), jnp.bool_),
                    jnp.zeros((B, T_SPK), jnp.bool_)])

    res = {}

    def bench(name, call):
        @jax.jit
        def run(q, k_self, v_self, kt, vt, ksp, vsp, salt):
            def body(x, i):
                o = call(x, k_self, v_self, kt, vt, ksp, vsp)
                return x + 1e-6 * o, None

            x, _ = jax.lax.scan(body, q + 1e-6 * salt, jnp.arange(LAYERS))
            return x.sum().astype(jnp.float32)

        res[name] = timed(name, run, q, k_self, v_self, kt, vt, ksp, vsp)

    # 1. current production kernel
    bench("base kernel", lambda q, k, v, kt, vt, ksp, vsp:
          joint_attention_grouped_pallas(
              q, k, v, [(kt, vt, tm, None), (ksp, vsp, sm, None)]))

    # 2. per-branch calls with exact segment sets (skip fully-masked segs)
    def per_branch(q, k, v, kt, vt, ksp, vsp):
        oc = joint_attention_grouped_pallas(
            q[0:1], k[0:1], v[0:1],
            [(kt, vt, tm[0:1], None), (ksp, vsp, sm[0:1], None)])
        ot = joint_attention_grouped_pallas(
            q[1:2], k[1:2], v[1:2], [(ksp, vsp, sm[0:1], None)])
        os_ = joint_attention_grouped_pallas(
            q[2:3], k[2:3], v[2:3], [(kt, vt, tm[0:1], None)])
        return jnp.concatenate([oc, ot, os_], axis=0)

    bench("per-branch exact segments", per_branch)

    # 3. XLA reference path
    from echo_tts_tpu.models import dit

    def xla_call(q, k, v, kt, vt, ksp, vsp):
        dit.set_attention_impl("xla")
        try:
            return dit._joint_attention_grouped(
                q, k, v, [(kt, vt, tm, None), (ksp, vsp, sm, None)])
        finally:
            dit.set_attention_impl("auto")

    bench("xla einsum", xla_call)

    import json
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
