#!/usr/bin/env python
"""Variant ablation for the fused joint-attention Pallas kernel.

Methodology note (this supersedes the first version of this script): a
single timed execution through the axon relay carries a fixed ~10-30 ms
RPC/dispatch overhead, which at INNER=8 iterations swamps ~1 ms/layer
kernels. Every number here is therefore a SLOPE: time the same jit at
INNER=8 and INNER=64 and report (t64*64 - t8*8)/56 — constant overhead
cancels exactly.

Variants probed:
  - mask representation: bool `where` (production) vs additive fp32 bias
    vs arithmetic (m-1)*BIG — Mosaic bool select showed a ~1 ms/layer cost
    in the first-pass numbers
  - exp vs exp2 (folded log2e)
  - segmented ctx (text+speaker separate) vs pre-concatenated single ctx
  - q-tile 320 vs 640

Diagnostic only. Relay-safe timing (memory: axon-tpu-relay-pitfalls).
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
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

G, B, H, S, D = 3, 1, 16, 640, 128
T_TEXT, T_SPK = 768, 1600
_NEG = -1e30


def timed_slope(name, make_run, *args, reps=3):
    """make_run(inner) -> jitted fn(args..., salt) -> scalar."""
    times = {}
    for inner in (8, 64):
        t0 = time.perf_counter()
        fn = make_run(inner)
        fn(*args, jnp.int32(0)).block_until_ready()
        print(f"  [{name} inner={inner}] compile+warm "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            float(fn(*args, jnp.int32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        times[inner] = best
    ms = (times[64] * 1e3 - times[8] * 1e3) / 56.0
    print(f"{name:46s} {ms:9.3f} ms/layer  ({ms*24:6.1f} ms/24L)"
          f"   [t8={times[8]*1e3:.1f} t64={times[64]*1e3:.1f}]",
          file=sys.stderr)
    return ms


def _kernel_var(*refs, scale, nseg, mask_mode, use_exp2, hg=1, probe="full",
                k_t=False):
    q_ref, ks_ref, vs_ref = refs[0], refs[1], refs[2]
    seg_refs = refs[3:3 + 3 * nseg]
    o_ref = refs[3 + 3 * nseg]

    # k_t: keys arrive PRE-TRANSPOSED as (D, T) so the QK dot contracts
    # q's lanes against k's sublanes with no in-kernel relayout
    kdims = (((1,), (0,)), ((), ())) if k_t else (((1,), (1,)), ((), ()))

    eff_scale = scale * (1.4426950408889634 if use_exp2 else 1.0)
    for hj in range(hg):
        q = q_ref[0, 0, hj]
        ks = ks_ref[0, 0, hj]
        vs = vs_ref[0, 0, hj]

        ls = jax.lax.dot_general(q, ks, kdims,
                                 preferred_element_type=jnp.float32) * eff_scale
        logits = [ls]
        for i in range(nseg):
            k_ref, v_ref, m_ref = seg_refs[3 * i: 3 * i + 3]
            k = k_ref[0, hj]
            l = jax.lax.dot_general(q, k, kdims,
                                    preferred_element_type=jnp.float32) * eff_scale
            m = m_ref[0, 0, 0]
            if mask_mode == "where":
                l = jnp.where(m.astype(jnp.bool_)[None, :], l, _NEG)
            elif mask_mode == "bias":
                l = l + m[None, :]      # m is fp32 additive bias (0 / -1e30)
            elif mask_mode == "arith":
                l = l + (m[None, :] - 1.0) * 1e30   # m is fp32 0/1
            elif mask_mode == "none":
                pass
            logits.append(l)

        if probe == "dots":
            # MXU-only probe: fake weights derived from logits without any
            # exp/max/sum VPU work (scale keeps values finite)
            exps = [(l * 1e-9).astype(vs.dtype) for l in logits]
            o = jax.lax.dot_general(exps[0], vs, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            for i in range(nseg):
                v = seg_refs[3 * i + 1][0, hj]
                o = o + jax.lax.dot_general(exps[i + 1], v,
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
            o_ref[0, 0, hj] = o.astype(o_ref.dtype)
            continue

        m_row = logits[0].max(axis=-1, keepdims=True)
        for l in logits[1:]:
            m_row = jnp.maximum(m_row, l.max(axis=-1, keepdims=True))
        efn = jnp.exp2 if use_exp2 else jnp.exp
        exps = [efn(l - m_row) for l in logits]
        denom = exps[0].sum(axis=-1, keepdims=True)
        for e in exps[1:]:
            denom = denom + e.sum(axis=-1, keepdims=True)
        inv = 1.0 / denom

        if probe == "noav":
            # q@k + softmax, no a@v dots: reduce exps to a (tq, d) output
            o = (exps[0] * inv)[:, :o_ref.shape[-1]]
            for i in range(nseg):
                o = o + (exps[i + 1] * inv)[:, :o_ref.shape[-1]]
            o_ref[0, 0, hj] = o.astype(o_ref.dtype)
            continue

        if probe == "fold":
            # epilogue fold: dot the RAW exps (range (0,1], bf16-safe) and
            # normalize the (tq, d) OUTPUT once — removes the (tq, ~3k)
            # exps*inv VPU multiplies per segment (the only remaining
            # non-dot work besides max/exp/sum)
            o = jax.lax.dot_general(exps[0].astype(vs.dtype), vs,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            for i in range(nseg):
                v = seg_refs[3 * i + 1][0, hj]
                o = o + jax.lax.dot_general(exps[i + 1].astype(v.dtype), v,
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
            o_ref[0, 0, hj] = (o * inv).astype(o_ref.dtype)
            continue

        o = jax.lax.dot_general((exps[0] * inv).astype(vs.dtype), vs,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        for i in range(nseg):
            v = seg_refs[3 * i + 1][0, hj]
            o = o + jax.lax.dot_general((exps[i + 1] * inv).astype(v.dtype), v,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        o_ref[0, 0, hj] = o.astype(o_ref.dtype)


def attention_var(q, k_self, v_self, segments, *, tq, mask_mode="where",
                  use_exp2=False, hg=1, probe="full", k_t=False):
    g, b, h, s, d = q.shape
    nseg = len(segments)
    scale = 1.0 / (d ** 0.5)
    n_qt = s // tq
    grid = (b, h // hg, n_qt, g)
    if k_t:  # keys pre-transposed to (..., D, T) outside the kernel
        k_self = k_self.swapaxes(-1, -2)
        ks_spec = pl.BlockSpec((1, 1, hg, d, s), lambda bb, hh, qq, gg: (gg, bb, hh, 0, 0))
    else:
        ks_spec = pl.BlockSpec((1, 1, hg, s, d), lambda bb, hh, qq, gg: (gg, bb, hh, 0, 0))
    in_specs = [
        pl.BlockSpec((1, 1, hg, tq, d), lambda bb, hh, qq, gg: (gg, bb, hh, qq, 0)),
        ks_spec,
        pl.BlockSpec((1, 1, hg, s, d), lambda bb, hh, qq, gg: (gg, bb, hh, 0, 0)),
    ]
    args = [q, k_self, v_self]
    for k, v, mask in segments:
        t = k.shape[2]
        if k_t:
            k = k.swapaxes(-1, -2)
            kseg_spec = pl.BlockSpec((1, hg, d, t), lambda bb, hh, qq, gg: (bb, hh, 0, 0))
        else:
            kseg_spec = pl.BlockSpec((1, hg, t, d), lambda bb, hh, qq, gg: (bb, hh, 0, 0))
        in_specs += [
            kseg_spec,
            pl.BlockSpec((1, hg, t, d), lambda bb, hh, qq, gg: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, 1, t), lambda bb, hh, qq, gg: (gg, bb, 0, 0)),
        ]
        if mask_mode == "where":
            m_arr = mask
        elif mask_mode == "bias":
            m_arr = jnp.where(mask, 0.0, _NEG).astype(jnp.float32)
        else:
            m_arr = mask.astype(jnp.float32)
        args += [k, v, m_arr[:, :, None, :]]
    return pl.pallas_call(
        functools.partial(_kernel_var, scale=scale, nseg=nseg,
                          mask_mode=mask_mode, use_exp2=use_exp2, hg=hg,
                          probe=probe, k_t=k_t),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, hg, tq, d),
                               lambda bb, hh, qq, gg: (gg, bb, hh, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((g, b, h, s, d), v_self.dtype),
    )(*args)


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
    tm = jnp.stack([jnp.ones((B, T_TEXT), jnp.bool_),
                    jnp.zeros((B, T_TEXT), jnp.bool_),
                    jnp.ones((B, T_TEXT), jnp.bool_)])
    sm = jnp.stack([jnp.ones((B, T_SPK), jnp.bool_),
                    jnp.ones((B, T_SPK), jnp.bool_),
                    jnp.zeros((B, T_SPK), jnp.bool_)])
    kc = jnp.concatenate([kt, ksp], axis=2)
    vc = jnp.concatenate([vt, vsp], axis=2)
    cm = jnp.concatenate([tm, sm], axis=2)

    res = {}

    only = None  # --only SUBSTR: run just matching variants (compile time
    if "--only" in sys.argv:  # through the relay is minutes for the full set)
        only = sys.argv[sys.argv.index("--only") + 1].lower()

    def bench(name, call, segs):
        """call(x, k_self, v_self, segments); segment arrays are jit ARGS,
        never closures — closed-over arrays become HLO constants and the
        relay chokes on the upload (memory: axon-tpu-relay-pitfalls)."""
        if only is not None and only not in name.lower():
            return
        flat = [a for seg in segs for a in seg]

        def make_run(inner):
            @jax.jit
            def run(q, k_self, v_self, salt, *flat_segs):
                segments = [tuple(flat_segs[3 * i: 3 * i + 3])
                            for i in range(len(flat_segs) // 3)]

                def body(x, i):
                    o = call(x, k_self, v_self, segments)
                    return x + (1e-6 * salt.astype(jnp.bfloat16)) * o, None
                x, _ = jax.lax.scan(body, q, jnp.arange(inner))
                return x.sum().astype(jnp.float32)
            return run

        def make_run_salt_last(inner):
            inner_run = make_run(inner)
            return lambda q, k_self, v_self, *rest: inner_run(
                q, k_self, v_self, rest[-1], *rest[:-1])
        res[name] = timed_slope(name, make_run_salt_last, q, k_self, v_self,
                                *flat)

    segs2 = [(kt, vt, tm), (ksp, vsp, sm)]
    segs1 = [(kc, vc, cm)]

    bench("2seg tq=320 bias (prod)", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=320, mask_mode="bias"), segs2)
    bench("2seg tq=320 bias DOTS-only", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=320, mask_mode="bias",
                        probe="dots"), segs2)
    bench("2seg tq=320 bias kT", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=320, mask_mode="bias", k_t=True), segs2)
    bench("2seg tq=320 bias kT DOTS-only", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=320, mask_mode="bias", k_t=True,
                        probe="dots"), segs2)
    bench("2seg tq=640 bias kT", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=640, mask_mode="bias", k_t=True), segs2)
    bench("2seg tq=320 bias NO-AV", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=320, mask_mode="bias",
                        probe="noav"), segs2)
    bench("2seg tq=320 bias exp2", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=320, mask_mode="bias",
                        use_exp2=True), segs2)
    bench("2seg tq=640 bias", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=640, mask_mode="bias"), segs2)
    # production config as of 2026-08-20: tq=640 + exp2 + additive bias
    bench("2seg tq=640 bias exp2 (prod)", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=640, mask_mode="bias",
                        use_exp2=True), segs2)
    # round-4 softmax-epilogue attack: normalize the output, not the weights
    bench("2seg tq=640 bias exp2 FOLD", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=640, mask_mode="bias",
                        use_exp2=True, probe="fold"), segs2)
    bench("2seg tq=320 bias exp2 FOLD", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=320, mask_mode="bias",
                        use_exp2=True, probe="fold"), segs2)
    # single pre-concatenated ctx segment (concat happens once per utterance
    # at KV-build time, not per layer): one (640, 2368) dot + one exp block
    # instead of two of each
    bench("1seg tq=640 bias exp2", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=640, mask_mode="bias",
                        use_exp2=True), segs1)
    bench("1seg tq=320 bias exp2", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=320, mask_mode="bias",
                        use_exp2=True), segs1)
    bench("1seg tq=640 bias DOTS-only", lambda q, k, v, s:
          attention_var(q, k, v, s, tq=640, mask_mode="bias",
                        probe="dots"), segs1)

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
