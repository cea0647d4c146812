#!/usr/bin/env python
"""Is the fused res-chain kernel VPU-transcendental-bound?

Decoder res chains run at ~25 TFLOP/s even fully fused in VMEM
(scripts/ablate_dit.py --dec-only). Hypothesis: the snake activation's
hardware `sin` dominates (6 full-window sins per chain per tile; TPU
transcendentals are multi-cycle). Variants at the blk2 shape (C=192,
T=655360):

  exact — production kernel (jnp.sin)
  none  — snake replaced by identity (isolates matmul+copy cost)
  poly  — sin^2(ax) = (1-cos(2ax))/2 with range-reduced Taylor cos
          (~1e-6 abs err, all single-cycle VPU FMAs)

Also prints max |poly - exact| on random data. Diagnostic only.
"""
import functools
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

from jax.experimental import pallas as pl

from echo_tts_tpu.ops import pallas_conv as pc

INNER = 8
C, T = 192, 655360


def _snake_poly(xf, alpha):
    """x + (1 - cos(2 a x)) / (2 (a + 1e-9)), Taylor-cos after range
    reduction; fp32 FMAs only."""
    z = (2.0 * alpha) * xf
    n = jnp.round(z * (1.0 / (2.0 * np.pi)))
    r = z - n * (2.0 * np.pi)
    u = r * r
    # cos r = 1 - u/2 + u^2/24 - ... + u^7/14! (Horner)
    c = jnp.float32(-1.0 / 87178291200.0)
    for coef in (1.0 / 479001600.0, -1.0 / 3628800.0, 1.0 / 40320.0,
                 -1.0 / 720.0, 1.0 / 24.0, -0.5):
        c = c * u + jnp.float32(coef)
    cosr = c * u + 1.0
    return xf + (1.0 - cosr) * (0.5 / (alpha + 1e-9))


def make_kernel(snake_mode):
    def kern(x_cur, x_prev, a1, a2, w7, b7, w1, b1, o_ref, *,
             dilations, halo, kernel_size):
        ii = pl.program_id(1)
        cur = x_cur[0]
        prev_tail = x_prev[0][-halo:, :]
        prev_tail = jnp.where(ii == 0, jnp.zeros_like(prev_tail), prev_tail)
        x = jnp.concatenate([prev_tail, cur], axis=0)
        twin = x.shape[0]
        in_dtype = x.dtype
        row = jax.lax.broadcasted_iota(jnp.int32, (twin, 1), 0)
        live = jnp.logical_or(ii > 0, row >= halo)

        def snk(xf, a):
            if snake_mode == "none":
                return xf
            if snake_mode == "poly":
                return _snake_poly(xf, a)
            return xf + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(a * xf))

        for u, d in enumerate(dilations):
            xf = x.astype(jnp.float32)
            y = snk(xf, a1[u].astype(jnp.float32)).astype(in_dtype)
            pad = (kernel_size - 1) * d
            yp = jnp.concatenate(
                [jnp.zeros((pad,) + y.shape[1:], in_dtype), y], axis=0)
            acc = jnp.broadcast_to(b7[u].astype(jnp.float32)[None, :],
                                   (twin, b7.shape[-1]))
            for j in range(kernel_size):
                acc = acc + jax.lax.dot(yp[j * d: j * d + twin], w7[u, j],
                                        preferred_element_type=jnp.float32)
            y = snk(acc, a2[u].astype(jnp.float32))
            y = jax.lax.dot(y.astype(in_dtype), w1[u],
                            preferred_element_type=jnp.float32) + b1[u].astype(jnp.float32)
            x = (x.astype(jnp.float32) + y).astype(in_dtype)
            x = jnp.where(live, x, jnp.zeros_like(x))
        o_ref[0] = x[halo:, :]

    return kern


def timed(name, fn, *args, reps=3):
    fn(*args, jnp.int32(0)).block_until_ready()
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        float(fn(*args, jnp.int32(r + 1)))
        best = min(best, time.perf_counter() - t0)
    ms = best / INNER * 1e3
    print(f"{name:36s} {ms:9.2f} ms", file=sys.stderr)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, T, C), jnp.bfloat16)
    units = []
    for i in range(3):
        ks = jax.random.split(jax.random.fold_in(key, i), 6)
        units.append({
            "snake1": jax.random.uniform(ks[0], (1, C, 1), jnp.bfloat16, 0.2, 1.5),
            "snake2": jax.random.uniform(ks[1], (1, C, 1), jnp.bfloat16, 0.2, 1.5),
            "conv1": {"w": (jax.random.normal(ks[2], (C, C, 7)) * 0.05).astype(jnp.bfloat16),
                      "b": (jax.random.normal(ks[3], (C,)) * 0.1).astype(jnp.bfloat16)},
            "conv2": {"w": (jax.random.normal(ks[4], (C, C, 1)) * 0.05).astype(jnp.bfloat16),
                      "b": (jax.random.normal(ks[5], (C,)) * 0.1).astype(jnp.bfloat16)},
        })

    res = {}
    for mode in ("exact", "none", "poly"):
        kern = make_kernel(mode)
        orig = pc._res_chain_kernel
        pc._res_chain_kernel = kern
        try:
            @jax.jit
            def run(x, salt):
                def body(c, i):
                    y = pc.fused_res_chain_cl(x * (1 + 1e-6 * (i + salt)),
                                              units, (1, 3, 9))
                    return c + y.mean().astype(jnp.float32), None

                c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))
                return c

            res[mode] = timed(f"res chain C={C} snake={mode}", run, x)
        finally:
            pc._res_chain_kernel = orig

    # accuracy of the poly approximation at activation scale
    xs = jnp.linspace(-20.0, 20.0, 200001, dtype=jnp.float32)
    a = jnp.float32(1.3)
    exact = xs + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(a * xs))
    poly = _snake_poly(xs, a)
    err = float(jnp.max(jnp.abs(exact - poly)))
    print(f"poly snake max abs err on [-20,20], a=1.3: {err:.3e}", file=sys.stderr)

    import json
    res["poly_err"] = err
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
