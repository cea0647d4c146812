"""Probe: does int4 weight storage work through the axon relay, and does it
actually halve the weight-read time of a weight-pass-bound GEMM chain?

The streaming (blockwise) path is weight-pass-bound (BASELINE.md 2026-08-21:
~76% of streaming wall is per-block Euler re-reading the trunk weights), and
int8 weights bought +29% there. int4 weights would halve trunk weight bytes
again — IF (a) XLA:TPU lowers s4 storage without materializing a widened
copy in HBM each pass, and (b) accuracy survives with per-group scales.

This script answers (a) with three probes at trunk shapes:
  1. correctness: s4->s8 widen + int8 dot == reference int8 dot
  2. rate: weight-pass-bound chain (batch 64 activations x 24 stacked
     (2048, 2048) weights under lax.scan, many iters in one jit) timed for
     bf16 / int8 / int4-widened weights. If int4 time ~= half int8 time the
     widen is fused into the weight read; if ~= int8 the read dominates
     unchanged; if >> int8, XLA materializes the widened copy — negative.
  3. same chain with unpacked int4-in-int8 storage (no s4 dtype) as a
     fallback datapoint.

Run: python scripts/probe_int4.py  (TPU; ~1 min)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

L, K, N, B = 24, 2048, 2048, 64
ITERS = 50


def timed(fn, h0, w):
    """Relay-safe timing: the chain returns a SCALAR; fetch it inside the
    timed region (block_until_ready does not force execution through the
    relay) and salt h0 per call (the relay caches identical executions)."""
    float(np.asarray(fn(h0, w)))  # compile + first run
    t0 = time.perf_counter()
    out = float(np.asarray(fn(h0 + 1e-6, w)))
    return out, time.perf_counter() - t0


def chain(conv):
    """ITERS passes over all L weights, data-dependent, one jit."""

    @jax.jit
    def run(h0, ws):
        def outer(h, _):
            def body(h, w):
                q = jnp.clip(jnp.round(h * 127.0), -127, 127).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    q, conv(w), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                h = acc.astype(jnp.float32) / (127.0 * 127.0 * K)
                return h, ()
            h, _ = jax.lax.scan(body, h, ws)
            return h, ()
        h, _ = jax.lax.scan(outer, h0, (), length=ITERS)
        return h.sum()
    return run


def chain_bf16():
    @jax.jit
    def run(h0, ws):
        def outer(h, _):
            def body(h, w):
                h = (h.astype(jnp.bfloat16) @ w).astype(jnp.float32) / K
                return h, ()
            h, _ = jax.lax.scan(body, h, ws)
            return h, ()
        h, _ = jax.lax.scan(outer, h0, (), length=ITERS)
        return h.sum()
    return run


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    w8 = rng.integers(-7, 8, size=(L, K, N), dtype=np.int8)  # int4 range
    h0 = jnp.asarray(rng.standard_normal((B, K)), jnp.float32) * 0.1

    # 1. correctness of s4 storage
    try:
        w4 = jnp.asarray(w8, jnp.int4)
        a = jnp.asarray(rng.integers(-127, 128, size=(B, K), dtype=np.int8))
        ref = jax.lax.dot_general(a, jnp.asarray(w8), (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        got = jax.lax.dot_general(a, w4.astype(jnp.int8),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        ok = bool(jnp.all(ref == got))
        print(f"s4 correctness: {'OK' if ok else 'MISMATCH'}")
    except Exception as e:
        print("s4 storage FAILED:", repr(e))
        w4 = None

    gb_bf16 = L * K * N * 2 * ITERS / 1e9
    fl = chain_bf16()
    _, t = timed(fl, h0, jnp.asarray(w8, jnp.bfloat16))
    print(f"bf16 chain:        {t*1e3:8.1f} ms  ({gb_bf16/t:6.1f} GB/s weight stream)")

    f8 = chain(lambda w: w)
    _, t8 = timed(f8, h0, jnp.asarray(w8))
    print(f"int8 chain:        {t8*1e3:8.1f} ms  ({gb_bf16/2/t8:6.1f} GB/s)")

    if w4 is not None:
        try:
            f4 = chain(lambda w: w.astype(jnp.int8))
            _, t4 = timed(f4, h0, w4)
            print(f"int4(s4) chain:    {t4*1e3:8.1f} ms  ({gb_bf16/4/t4:6.1f} GB/s)  "
                  f"vs int8 {'WIN' if t4 < 0.8*t8 else 'no win' if t4 < 1.2*t8 else 'SLOWER'}")
        except Exception as e:
            print("s4 chain FAILED:", repr(e))

    # s4 storage created ON DEVICE (host->device s4 transfer crashes the
    # relay client; conversion inside a jit sidesteps that). If XLA keeps
    # the buffer s4 in HBM and fuses the widen into the dot's weight read,
    # this chain should run ~2x the int8 chain's weight stream.
    try:
        w4d = jax.jit(lambda w: w.astype(jnp.int4))(jnp.asarray(w8))
        jax.block_until_ready(w4d)
        f4d = chain(lambda w: w.astype(jnp.int8))
        _, t4d = timed(f4d, h0, w4d)
        print(f"int4(s4 on-dev):   {t4d*1e3:8.1f} ms  ({gb_bf16/4/t4d:6.1f} GB/s)  "
              f"vs int8 {'WIN' if t4d < 0.8*t8 else 'no win' if t4d < 1.2*t8 else 'SLOWER'}")
        # native s4 x s8 dot (no explicit widen) — does XLA accept it?
        try:
            fnat = chain(lambda w: w)
            _, tn = timed(fnat, h0, w4d)
            print(f"int4 native dot:   {tn*1e3:8.1f} ms  ({gb_bf16/4/tn:6.1f} GB/s)  "
                  f"vs int8 {'WIN' if tn < 0.8*t8 else 'no win' if tn < 1.2*t8 else 'SLOWER'}")
        except Exception as e:
            print("native s4 dot FAILED:", repr(e).splitlines()[0][:200])
    except Exception as e:
        print("on-device s4 FAILED:", repr(e).splitlines()[0][:200])

    # packed two-nibbles-per-int8 fallback: (L, K//2, N) storage, unpack in jit
    wp = ((w8[:, 0::2].astype(np.int8) & 0xF) |
          ((w8[:, 1::2].astype(np.int8) & 0xF) << 4)).astype(np.int8)

    def unpack(w):  # (K//2, N) -> (K, N) int8, sign-extended nibbles
        lo = (w << 4).astype(jnp.int8) >> 4
        hi = w >> 4
        return jnp.stack([lo, hi], axis=1).reshape(K, N)

    try:
        fp = chain(unpack)
        _, tp = timed(fp, h0, jnp.asarray(wp))
        print(f"packed-nibble:     {tp*1e3:8.1f} ms  ({gb_bf16/4/tp:6.1f} GB/s)  "
              f"vs int8 {'WIN' if tp < 0.8*t8 else 'no win' if tp < 1.2*t8 else 'SLOWER'}")
    except Exception as e:
        print("packed chain FAILED:", repr(e))


if __name__ == "__main__":
    main()
