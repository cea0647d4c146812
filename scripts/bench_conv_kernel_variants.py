#!/usr/bin/env python
"""Variant ablation for the fused residual-chain conv kernel (S1-DAC
decoder tail). The bias-mask finding in the attention kernel
(scripts/bench_attention_variants.py: in-kernel selects cost ~3x the dots)
suggests the res-chain kernel's per-unit `jnp.where(live, ...)` select and
fp32 snake sin may dominate its 3x gap to the misaligned-MXU ceiling.

Slope timing (t64*64 - t8*8)/56 cancels the relay's fixed per-execution
overhead. Shapes: the decoder's two hottest stages, ch192 @ T=655360 and
ch96 @ T=1310720 (scripts/ablate_dit.py: 47.5 / 40.9 ms).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

KS = 7
DILS = (1, 3, 9)


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(x_cur, x_prev, a1, a2, w7, b7, w1, b1, o_ref, *,
            dilations, halo, live_mode, snake_dtype, use_sin, tap_offsets,
            pack_taps=False):
    ii = pl.program_id(1)
    cur = x_cur[0]
    prev_tail = x_prev[0][-halo:, :]
    prev_tail = jnp.where(ii == 0, jnp.zeros_like(prev_tail), prev_tail)
    x = jnp.concatenate([prev_tail, cur], axis=0)
    twin = x.shape[0]
    in_dtype = x.dtype
    row = jax.lax.broadcasted_iota(jnp.int32, (twin, 1), 0)
    if live_mode == "where":
        live = jnp.logical_or(ii > 0, row >= halo)
    elif live_mode == "mult":
        # fp32 0/1 column vector; ii>0 makes everything live
        live_f = jnp.minimum(
            jnp.maximum((row - halo + 1).astype(jnp.float32)
                        + 1e9 * (ii > 0).astype(jnp.float32), 0.0), 1.0)
    # live_mode == "off": skip re-zeroing (WRONG at tile 0; bounds only)

    def snk(z, a):
        if not use_sin:
            return z * a  # stand-in, wrong math: bounds sin cost
        zf = z.astype(snake_dtype)
        af = a.astype(snake_dtype)
        if use_sin == "poly":
            from echo_tts_tpu.ops.pallas_conv import _sin2
            return zf + (1.0 / (af + 1e-9)) * _sin2(af * zf)
        return (zf + (1.0 / (af + 1e-9)) * jnp.square(jnp.sin(af * zf)))

    for u, d in enumerate(dilations):
        y = snk(x, a1[u]).astype(in_dtype)
        pad = (KS - 1) * d
        yp = jnp.concatenate(
            [jnp.zeros((pad,) + y.shape[1:], in_dtype), y], axis=0)
        if pack_taps:
            # im2col in VMEM: one (twin, KS*C) @ (KS*C, C) dot — K grows from
            # C (1.5 MXU K-tiles at C=192) to KS*C (fully tiled)
            xcat = jnp.concatenate(
                [yp[j * d: j * d + twin] for j in range(KS)], axis=1)
            acc = jax.lax.dot(
                xcat, w7[u].reshape(KS * w7.shape[-2], w7.shape[-1]),
                preferred_element_type=jnp.float32) \
                + b7[u].astype(jnp.float32)[None, :]
        else:
            acc = jnp.broadcast_to(b7[u].astype(jnp.float32)[None, :],
                                   (twin, b7.shape[-1]))
            for j in range(KS):
                off = (j * d) if tap_offsets else 0  # offset 0: aligned, WRONG math
                acc = acc + jax.lax.dot(yp[off: off + twin], w7[u, j],
                                        preferred_element_type=jnp.float32)
        y = snk(acc, a2[u].astype(jnp.float32))
        y = jax.lax.dot(y.astype(in_dtype), w1[u],
                        preferred_element_type=jnp.float32) + b1[u].astype(jnp.float32)
        x = (x.astype(jnp.float32) + y).astype(in_dtype)
        if live_mode == "where":
            x = jnp.where(live, x, jnp.zeros_like(x))
        elif live_mode == "mult":
            x = x * live_f.astype(in_dtype)

    o_ref[0] = x[halo:, :]


def _kernel_cf(x_cur, x_prev, a1, a2, w7, b7, w1, b1, o_ref, *,
               dilations, halo, use_sin):
    """Channels-first layout: x (C, T) — time on LANES, so the per-tap shift
    is a lane shift (cheap shuffle) instead of an unaligned sublane slice
    (whole-window relayout)."""
    ii = pl.program_id(1)
    cur = x_cur[0]                       # (C, TQ)
    prev_tail = x_prev[0][:, -halo:]
    prev_tail = jnp.where(ii == 0, jnp.zeros_like(prev_tail), prev_tail)
    x = jnp.concatenate([prev_tail, cur], axis=1)   # (C, H + TQ)
    twin = x.shape[1]
    in_dtype = x.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (1, twin), 1)
    live_f = jnp.minimum(
        jnp.maximum((col - halo + 1).astype(jnp.float32)
                    + 1e9 * (ii > 0).astype(jnp.float32), 0.0), 1.0)

    def snk(z, a):
        # a: (C,) per-channel alpha -> column (C, 1), broadcast over lanes
        zf = z.astype(jnp.float32)
        af = a.astype(jnp.float32)[:, None]
        out = zf + (1.0 / (af + 1e-9)) * jnp.square(jnp.sin(af * zf))
        return out if use_sin else zf * af

    for u, d in enumerate(dilations):
        y = snk(x, a1[u]).astype(in_dtype)
        pad = (KS - 1) * d
        yp = jnp.concatenate(
            [jnp.zeros(y.shape[:1] + (pad,), in_dtype), y], axis=1)
        acc = jnp.broadcast_to(b7[u].astype(jnp.float32)[:, None],
                               (b7.shape[-1], twin))
        for j in range(KS):
            # w7[u, j]: (C_in, C_out); contract C_in with xs rows
            acc = acc + jax.lax.dot_general(
                w7[u, j], yp[:, j * d: j * d + twin],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        y = snk(acc, a2[u])
        y = jax.lax.dot_general(w1[u], y.astype(in_dtype),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) \
            + b1[u].astype(jnp.float32)[:, None]
        x = (x.astype(jnp.float32) + y).astype(in_dtype)
        x = x * live_f.astype(in_dtype)

    o_ref[0] = x[:, halo:]


def res_chain_cf(x, units, *, use_sin=True, tile_t=2048):
    """x: (B, C, T) channels-first."""
    b, c, t = x.shape
    n = len(units)
    halo = _round_up(sum((KS - 1) * d for d in DILS), 128)
    tq = tile_t
    pad_t = _round_up(max(t, tq), tq) - t
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad_t))) if pad_t else x
    nt = xp.shape[2] // tq

    a1 = jnp.stack([u["snake1"].reshape(-1) for u in units])
    a2 = jnp.stack([u["snake2"].reshape(-1) for u in units])
    # (U, K, C_in, C_out)
    w7 = jnp.stack([jnp.transpose(u["conv1"]["w"], (2, 1, 0)) for u in units])
    b7 = jnp.stack([u["conv1"]["b"] for u in units])
    w1 = jnp.stack([jnp.transpose(u["conv2"]["w"], (2, 1, 0))[0] for u in units])
    b1 = jnp.stack([u["conv2"]["b"] for u in units])

    out = pl.pallas_call(
        functools.partial(_kernel_cf, dilations=DILS, halo=halo,
                          use_sin=use_sin),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, c, tq), lambda bb, ii: (bb, 0, ii)),
            pl.BlockSpec((1, c, tq), lambda bb, ii: (bb, 0, jnp.maximum(ii - 1, 0))),
            pl.BlockSpec((n, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((n, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((n, KS, c, c), lambda bb, ii: (0, 0, 0, 0)),
            pl.BlockSpec((n, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((n, c, c), lambda bb, ii: (0, 0, 0)),
            pl.BlockSpec((n, c), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, tq), lambda bb, ii: (bb, 0, ii)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
    )(xp, xp, a1, a2, w7, b7, w1, b1)
    return out[:, :, :t] if pad_t else out


def res_chain(x, units, *, live_mode="where", snake_dtype=jnp.float32,
              tile_t=None, use_sin=True, tap_offsets=True, pack_taps=False):
    b, t, c = x.shape
    n = len(units)
    halo = _round_up(sum((KS - 1) * d for d in DILS), 16)
    if tile_t is None:  # production sizing rule
        tq = 2048
        while tq > 256 and tq * c * x.dtype.itemsize > 512 * 1024:
            tq //= 2
    else:
        tq = tile_t
    pad_t = _round_up(max(t, tq), tq) - t
    xp = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0))) if pad_t else x
    nt = xp.shape[1] // tq

    a1 = jnp.stack([u["snake1"].reshape(-1) for u in units])
    a2 = jnp.stack([u["snake2"].reshape(-1) for u in units])
    w7 = jnp.stack([jnp.transpose(u["conv1"]["w"], (2, 1, 0)) for u in units])
    b7 = jnp.stack([u["conv1"]["b"] for u in units])
    w1 = jnp.stack([jnp.transpose(u["conv2"]["w"], (2, 1, 0))[0] for u in units])
    b1 = jnp.stack([u["conv2"]["b"] for u in units])

    out = pl.pallas_call(
        functools.partial(_kernel, dilations=DILS, halo=halo,
                          live_mode=live_mode, snake_dtype=snake_dtype,
                          use_sin=use_sin, tap_offsets=tap_offsets,
                          pack_taps=pack_taps),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, tq, c), lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec((1, tq, c), lambda bb, ii: (bb, jnp.maximum(ii - 1, 0), 0)),
            pl.BlockSpec((n, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((n, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((n, KS, c, c), lambda bb, ii: (0, 0, 0, 0)),
            pl.BlockSpec((n, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((n, c, c), lambda bb, ii: (0, 0, 0)),
            pl.BlockSpec((n, c), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, c), lambda bb, ii: (bb, ii, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
    )(xp, xp, a1, a2, w7, b7, w1, b1)
    return out[:, :t] if pad_t else out


def timed_slope(name, make_run, *args, reps=3):
    times = {}
    for inner in (8, 64):
        fn = make_run(inner)
        fn(*args, jnp.int32(0)).block_until_ready()
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            float(fn(*args, jnp.int32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        times[inner] = best
    ms = (times[64] * 1e3 - times[8] * 1e3) / 56.0
    print(f"{name:44s} {ms:9.3f} ms/chain  [t8={times[8]*1e3:.1f}"
          f" t64={times[64]*1e3:.1f}]", file=sys.stderr, flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    res = {}
    shapes = ((192, 655360), (96, 1310720))
    if "--c192" in sys.argv:
        shapes = ((192, 655360),)
    elif "--c96" in sys.argv:
        shapes = ((96, 1310720),)
    for c, t in shapes:
        ks = jax.random.split(jax.random.fold_in(key, c), 16)
        units = []
        for u in range(3):
            units.append({
                "snake1": jax.random.normal(ks[4 * u], (1, c, 1), jnp.bfloat16) * 0.1 + 1.0,
                "conv1": {"w": jax.random.normal(ks[4 * u + 1], (c, c, KS), jnp.bfloat16) * 0.05,
                          "b": jnp.zeros((c,), jnp.bfloat16)},
                "snake2": jax.random.normal(ks[4 * u + 2], (1, c, 1), jnp.bfloat16) * 0.1 + 1.0,
                "conv2": {"w": jax.random.normal(ks[4 * u + 3], (c, c, 1), jnp.bfloat16) * 0.05,
                          "b": jnp.zeros((c,), jnp.bfloat16)},
            })
        x = jax.random.normal(ks[12], (1, t, c), jnp.bfloat16)
        flat = []
        fdef = []
        for u in units:
            flat += [u["snake1"], u["conv1"]["w"], u["conv1"]["b"],
                     u["snake2"], u["conv2"]["w"], u["conv2"]["b"]]

        def rebuild(fs):
            out = []
            for i in range(3):
                s1, w7, b7, s2, w1, b1 = fs[6 * i: 6 * i + 6]
                out.append({"snake1": s1, "conv1": {"w": w7, "b": b7},
                            "snake2": s2, "conv2": {"w": w1, "b": b1}})
            return out

        def bench(name, **kw):
            def make_run(inner):
                @jax.jit
                def run(x, salt, *fs):
                    units = rebuild(fs)

                    def body(z, i):
                        y = res_chain(z, units, **kw)
                        return z + (1e-6 * salt.astype(z.dtype)) * y, None
                    z, _ = jax.lax.scan(body, x, jnp.arange(inner))
                    return z.mean().astype(jnp.float32)
                return lambda x, *rest: run(x, rest[-1], *rest[:-1])
            res[f"c{c} {name}"] = timed_slope(f"c{c} {name}", make_run, x, *flat)

        def bench_cf(name, **kw):
            xcf = jnp.transpose(x, (0, 2, 1))

            def make_run(inner):
                @jax.jit
                def run(xcf, salt, *fs):
                    units = rebuild(fs)

                    def body(z, i):
                        y = res_chain_cf(z, units, **kw)
                        return z + (1e-6 * salt.astype(z.dtype)) * y, None
                    z, _ = jax.lax.scan(body, xcf, jnp.arange(inner))
                    return z.mean().astype(jnp.float32)
                return lambda xx, *rest: run(xx, rest[-1], *rest[:-1])
            res[f"c{c} {name}"] = timed_slope(f"c{c} {name}", make_run, xcf,
                                              *flat)

        bench("poly 7-dots (prod)", use_sin="poly")
        bench("poly packed-taps", use_sin="poly", pack_taps=True)

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
