#!/usr/bin/env python
"""Ablation profiler for the DiT CFG forward and the vocoder decoder.

The hot-path breakdown (scripts/profile_breakdown.py) shows the 3-branch CFG
forward at ~62 ms vs ~32 ms for a pure-matmul skeleton with identical GEMMs
(+~9-11 ms of attention FLOPs) — ~20 ms of per-step non-matmul overhead.
This script toggles individual features of the block body (attention impl,
AdaLN, RoPE, QK-norm, sigmoid gate, head-major transposes) to localize it,
and times each decoder stage (stem / per-block tconv + res-units / head) to
rank vocoder kernel work. Diagnostic only — not part of the library.

Relay-safe timing (memory: axon-tpu-relay-pitfalls): loops inside one jit
over salted inputs, fetches a scalar.
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

from functools import partial

from echo_tts_tpu.core.config import AEConfig, DiTConfig
from echo_tts_tpu.core.layers import low_rank_adaln, rms_norm, swiglu_mlp, timestep_embedding
from echo_tts_tpu.core.rope import apply_rope_half_heads, precompute_rope
from echo_tts_tpu.bench.init_ae import init_ae_params
from echo_tts_tpu.models import s1dac
from echo_tts_tpu.models.dit import (
    _joint_attention_grouped,
    get_kv_cache_speaker,
    get_kv_cache_text,
    init_dit_params,
    set_attention_impl,
)

SEQ, TEXT, SPK = 640, 768, 6400
INNER = 8
G = 3


def timed(name, fn, *args, reps=3):
    fn(*args, jnp.int32(0)).block_until_ready()
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        float(fn(*args, jnp.int32(r + 1)))
        best = min(best, time.perf_counter() - t0)
    ms = best / INNER * 1e3
    print(f"{name:46s} {ms:9.2f} ms", file=sys.stderr)
    return ms


def make_fwd(cfg: DiTConfig, *, attn: str, adaln: bool, rope: bool,
             qknorm: bool, out_gate: bool):
    """Grouped trunk forward with feature toggles (mirrors
    models.dit._dit_forward_grouped)."""
    h_, dh, eps = cfg.num_heads, cfg.head_dim, cfg.norm_eps

    def fwd(params, x, t, text_mask, spk_mask, kv_text, kv_speaker):
        g, b, s, _ = x.shape
        cos_q, sin_q = precompute_rope(dh, s)
        cond = timestep_embedding(t, cfg.timestep_embed_size)
        cm = params["cond_module"]
        cond = jax.nn.silu(cond @ cm["w0"])
        cond = jax.nn.silu(cond @ cm["w1"])
        cond = (cond @ cm["w2"])[:, None]
        x = x @ params["in_proj"]["w"] + params["in_proj"]["b"]
        kt_k, kt_v = kv_text
        ks_k, ks_v = kv_speaker
        per = {"p": params["blocks"], "kt_k": kt_k, "kt_v": kt_v,
               "ks_k": ks_k, "ks_v": ks_v}

        def body(x, per):
            p = per["p"]
            a = p["attention"]
            if adaln:
                h, attn_gate = low_rank_adaln(x, cond, p["attention_adaln"], eps)
            else:
                h, attn_gate = rms_norm(x, params["out_norm"], eps), 1.0
            q = (h @ a["wq"]).reshape(g, b, s, h_, dh)
            k_self = (h @ a["wk"]).reshape(g, b, s, h_, dh)
            v_self = (h @ a["wv"]).reshape(g, b, s, h_, dh)
            gate = h @ a["gate"]
            if qknorm:
                q = rms_norm(q, a["q_norm"], eps)
                k_self = rms_norm(k_self, a["k_norm"], eps)
            if rope:
                q = apply_rope_half_heads(q, cos_q, sin_q)
                k_self = apply_rope_half_heads(k_self, cos_q, sin_q)
            if attn == "none":
                o = v_self.reshape(g, b, s, cfg.model_size)
            else:
                q = q.transpose(0, 1, 3, 2, 4)
                k_self = k_self.transpose(0, 1, 3, 2, 4)
                v_self = v_self.transpose(0, 1, 3, 2, 4)
                segments = [(per["kt_k"], per["kt_v"], text_mask, None),
                            (per["ks_k"], per["ks_v"], spk_mask, None)]
                o = _joint_attention_grouped(q, k_self, v_self, segments)
                o = o.transpose(0, 1, 3, 2, 4).reshape(g, b, s, cfg.model_size)
            if out_gate:
                o = o * jax.nn.sigmoid(gate)
            x = x + attn_gate * (o @ a["wo"])
            if adaln:
                h, mlp_gate = low_rank_adaln(x, cond, p["mlp_adaln"], eps)
            else:
                h, mlp_gate = rms_norm(x, params["out_norm"], eps), 1.0
            x = x + mlp_gate * swiglu_mlp(h, p["mlp"])
            return x, None

        x, _ = jax.lax.scan(body, x, per)
        x = rms_norm(x, params["out_norm"], eps)
        x = x @ params["out_proj"]["w"] + params["out_proj"]["b"]
        return x.astype(jnp.float32)

    return fwd


def main():
    dec_only = "--dec-only" in sys.argv
    cfg = DiTConfig(has_latent_modules=False)
    ae_cfg = AEConfig()
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: init_dit_params(k, cfg, dtype=jnp.bfloat16))(key)
    ae = jax.jit(lambda k: init_ae_params(k, ae_cfg, dtype=jnp.bfloat16))(
        jax.random.fold_in(key, 1))
    jax.block_until_ready((params, ae))

    ids = jax.random.randint(key, (1, TEXT), 0, 256)
    tmask = jnp.ones((1, TEXT), jnp.bool_)
    smask_lat = jnp.ones((1, SPK), jnp.bool_)
    slat = jax.random.normal(key, (1, SPK, cfg.latent_size), jnp.bfloat16)
    kv_text = get_kv_cache_text(params, cfg, ids, tmask)
    kv_speaker = get_kv_cache_speaker(params, cfg, slat)
    jax.block_until_ready((kv_text, kv_speaker))

    spk_patches = SPK // cfg.speaker_patch_size
    text_m = jnp.broadcast_to(tmask[None], (G, 1, TEXT))
    spk_m = jnp.broadcast_to(jnp.ones((1, spk_patches), jnp.bool_)[None],
                             (G, 1, spk_patches))
    x0 = jax.random.normal(key, (G, 1, SEQ, cfg.latent_size), jnp.float32)

    res = {}

    def bench_variant(name, **toggles):
        impl = toggles.pop("impl", None)
        fwd = make_fwd(cfg, **toggles)
        if impl:
            set_attention_impl(impl)

        @jax.jit
        def run(params, kv_text, kv_speaker, x0, salt):
            def body(x, i):
                t = jnp.full((1,), 0.7, jnp.float32).astype(jnp.bfloat16)
                v = fwd(params, x.astype(jnp.bfloat16), t, text_m, spk_m,
                        kv_text, kv_speaker)
                return x + 1e-6 * v, None

            x, _ = jax.lax.scan(body, x0 + 1e-6 * salt, jnp.arange(INNER))
            return x.sum()

        res[name] = timed(name, run, params, kv_text, kv_speaker, x0)
        set_attention_impl("auto")

    if not dec_only:
        bench_variant("base (pallas attn)", attn="pallas", adaln=True, rope=True,
                      qknorm=True, out_gate=True, impl="pallas")
        bench_variant("xla attn", attn="xla", adaln=True, rope=True,
                      qknorm=True, out_gate=True, impl="xla")
        bench_variant("attn=none", attn="none", adaln=True, rope=True,
                      qknorm=True, out_gate=True)
        bench_variant("no adaln", attn="pallas", adaln=False, rope=True,
                      qknorm=True, out_gate=True, impl="pallas")
        bench_variant("no rope", attn="pallas", adaln=True, rope=False,
                      qknorm=True, out_gate=True, impl="pallas")
        bench_variant("no qknorm", attn="pallas", adaln=True, rope=True,
                      qknorm=False, out_gate=True, impl="pallas")
        bench_variant("no out_gate", attn="pallas", adaln=True, rope=True,
                      qknorm=True, out_gate=False, impl="pallas")
        bench_variant("bare (attn none, no extras)", attn="none", adaln=False,
                      rope=False, qknorm=False, out_gate=False)

    # ---- vocoder decoder stages -------------------------------------------
    p = ae["decoder"]

    def stage(name, f, x_in):
        @jax.jit
        def run(ae, x, salt):
            def body(c, i):
                # keep the salt in x's dtype — an fp32 promotion here doubles
                # VMEM in the Pallas res-chain kernel (measured OOM at C=768)
                y = f(ae, x * (1 + 1e-6 * (i + salt)).astype(x.dtype))
                return c + y.mean().astype(jnp.float32), None

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))
            return c

        res[name] = timed(name, run, ae, x_in)

    # decoder input: latents after post_module+upsample: (1, 1024, 2560)
    x = jax.random.normal(key, (1, ae_cfg.latent_dim, 4 * SEQ), jnp.bfloat16)
    stage("dec stem (1024->1536 @2560)",
          lambda ae, z: s1dac.causal_conv(z, ae["decoder"]["stem"], kernel_size=7), x)
    x = s1dac.causal_conv(x, p["stem"], kernel_size=7)

    for i, stride in enumerate(ae_cfg.decoder_rates):
        blk = p["blocks"][i]
        in_ch = x.shape[1]
        out_ch = blk["up"]["w"].shape[1]
        t_in = x.shape[2]

        def tconv_stage(ae, z, i=i, stride=stride):
            b = ae["decoder"]["blocks"][i]
            z = s1dac.snake(z, b["snake"])
            return s1dac._causal_tconv_phase_cl(
                z.transpose(0, 2, 1), b["up"]["w"], b["up"].get("b"),
                kernel_size=2 * stride, stride=stride).transpose(0, 2, 1)

        stage(f"dec blk{i} tconv {in_ch}->{out_ch} @{t_in}", tconv_stage, x)
        x = tconv_stage(ae, x)
        t_out = x.shape[2]

        def res_stage(ae, z, i=i):
            b = ae["decoder"]["blocks"][i]
            z = z.transpose(0, 2, 1)
            z = s1dac._res_chain_cl(z, b["res_units"])
            return z.transpose(0, 2, 1)

        stage(f"dec blk{i} res x3 ch{out_ch} @{t_out}", res_stage, x)
        x = res_stage(ae, x)

    import json
    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
