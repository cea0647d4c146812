"""Headline benchmark: audio-seconds/s/chip for the full Echo-TTS pipeline —
40-step dual-CFG Euler over 640 latents (~29.7 s audio) with full-bucket
text (768) + speaker (6400-latent) conditioning, followed by S1-DAC vocoder
decode (BASELINE.md north star; BASELINE config 2 shape).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_s_per_s_per_chip", "vs_baseline": N}

vs_baseline is the real-time factor (reference baseline = 1.0x real time,
i.e. synthesis as fast as playback): no published reference numbers exist
(BASELINE.md — `published: {}`), so real-time is the meaningful anchor.

Weights are random-init at full scale (zero-egress environment, no HF
access); FLOPs and memory traffic are identical to trained weights. Dtypes
follow the reference's serving config (gradio_app.py:36-43): DiT bf16; AE
bf16 (its documented low-VRAM serving mode, and the BASELINE config-5 bench
setting).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the driver re-runs this every round; warm runs
# skip the ~4 min of XLA compiles. ECHO_TTS_COMPILE_CACHE overrides (the
# --bringup cold measurement points it at an empty temp dir)
_cache_dir = os.environ.get("ECHO_TTS_COMPILE_CACHE", "/root/repo/.jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")

from echo_tts_tpu.core.config import AEConfig, DiTConfig, SamplerConfig
from echo_tts_tpu.models.dit import init_dit_params
from echo_tts_tpu.models.pca import PCAState
from echo_tts_tpu.models.s1dac import decode_zq
from echo_tts_tpu.models import pca as pca_mod
from echo_tts_tpu.sampling.euler_cfg import (
    draw_noise,
    sample_euler_cfg_independent_guidances,
)
from echo_tts_tpu.bench.init_ae import init_ae_params

SEQ = 640
TEXT = 768
SPK = 6400
STEPS = 40


def main():
    # --batch N: N utterances on the one chip (config-5-style serving shape);
    # default 1 is the headline the driver records.
    # --force-speaker: BASELINE config 3 (speaker_kv_scale gating).
    # --blockwise: BASELINE config 4 (2x320 blocks + streamed S1-DAC decode).
    batch = 1
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    force_speaker = "--force-speaker" in sys.argv
    blockwise = "--blockwise" in sys.argv
    uncond_cache = 1
    if "--uncond-cache" in sys.argv:
        uncond_cache = int(sys.argv[sys.argv.index("--uncond-cache") + 1])
    joint_uncond = "--joint-uncond" in sys.argv
    first_steps = None  # opt-in TTFA knob: Euler steps for the FIRST block
    if "--first-steps" in sys.argv:
        first_steps = int(sys.argv[sys.argv.index("--first-steps") + 1])
    int8_enc = "--int8-encoders" in sys.argv  # + encoder/KV-proj GEMMs
    int8 = "--int8" in sys.argv or int8_enc  # opt-in W8A8 trunk (models/quant.py)
    trace = "--trace" in sys.argv
    # --solver midpoint [--steps N]: opt-in RK2 integrator at N steps (2N
    # velocity evals) — the NFE lever orthogonal to int8/first-steps
    # (sampling/euler_cfg.py; quality via scripts/quant_snr.py --solver)
    solver = "euler"
    if "--solver" in sys.argv:
        solver = sys.argv[sys.argv.index("--solver") + 1]
    steps = STEPS
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    dit_cfg = DiTConfig(has_latent_modules=blockwise or trace
                        or "--continuous" in sys.argv)
    ae_cfg = AEConfig()
    sc = SamplerConfig(num_steps=steps, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
                       cfg_min_t=0.5, cfg_max_t=1.0, truncation_factor=0.8,
                       sequence_length=SEQ,
                       # config-3 gating values mirror the reference UI's
                       # Force Speaker mode (gradio_app.py:281-307)
                       speaker_kv_scale=1.5 if force_speaker else None,
                       speaker_kv_min_t=0.5 if force_speaker else None,
                       speaker_kv_max_layers=24 if force_speaker else None,
                       uncond_cache_interval=uncond_cache,
                       joint_uncond=joint_uncond,
                       first_block_steps=first_steps,
                       solver=solver)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    # single fused on-device init executable per model (host->device transfer
    # through the tunnel is slower than on-device RNG)
    dit_params = jax.jit(lambda k: init_dit_params(k, dit_cfg, dtype=jnp.bfloat16))(key)
    if int8 and "--check" not in sys.argv and not trace:
        # --check --int8 keeps the bf16 params: the int8 gate quantizes a
        # separate copy and compares the two paths (--trace lets the Engine
        # quantize, as serving does)
        from echo_tts_tpu.models.quant import quantize_dit_params
        dit_params = jax.jit(
            lambda p: quantize_dit_params(p, encoders=int8_enc))(dit_params)
    ae_params = jax.jit(lambda k: init_ae_params(k, ae_cfg, dtype=jnp.bfloat16))(
        jax.random.fold_in(key, 1))
    jax.block_until_ready((dit_params, ae_params))
    pca = PCAState.random()
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr)

    ks = jax.random.split(key, 3)
    ids = jax.random.randint(ks[0], (batch, TEXT), 0, 256)
    text_mask = jnp.ones((batch, TEXT), jnp.bool_)
    speaker_latent = jax.random.normal(ks[1], (batch, SPK, dit_cfg.latent_size),
                                       dtype=jnp.float32)
    speaker_mask = jnp.ones((batch, SPK), jnp.bool_)
    noise = draw_noise(0, (batch, SEQ, dit_cfg.latent_size))

    import numpy as np

    def force(x):
        # the relay backend defers execution past block_until_ready; a tiny
        # host fetch is the reliable fence (see memory: axon-tpu-relay-pitfalls)
        np.asarray(x[(0,) * (x.ndim - 1) + (slice(0, 1),)])

    if "--bringup" in sys.argv:
        # Serving bring-up measurement (VERDICT r4 item 5): wall-clock and
        # executable count for Engine.warmup with streaming (+ continuous
        # ladder when --continuous). Run twice for the BASELINE table:
        #   warm:  python bench.py --bringup [--continuous ...]
        #   cold:  ECHO_TTS_COMPILE_CACHE=$(mktemp -d) python bench.py --bringup
        # --speaker-buckets includes the full speaker-bucket matrix
        # (the expensive tail); --background measures the critical-set time
        # the server actually blocks on (Engine.warmup background_tail) and
        # then waits out the tail to report both.
        from echo_tts_tpu.core.config import PipelineConfig
        from echo_tts_tpu.pipeline.pipeline import EchoTTS
        from echo_tts_tpu.serve.engine import Engine

        continuous = "--continuous" in sys.argv
        cont_block = 64
        if "--cont-block" in sys.argv:
            cont_block = int(sys.argv[sys.argv.index("--cont-block") + 1])
        blocks = [64, 192]
        if "--blocks" in sys.argv:
            blocks = [int(x) for x in
                      sys.argv[sys.argv.index("--blocks") + 1].split(",")]
        max_batch = batch if batch > 1 else 4
        spk_buckets = "--speaker-buckets" in sys.argv
        background = "--background" in sys.argv

        tts = EchoTTS(dit_params, dit_cfg, ae_params, ae_cfg, pca,
                      model_dtype=jnp.bfloat16, pipe_cfg=PipelineConfig())
        eng = Engine(tts, int8=int8, int8_encoders=int8_enc,
                     max_batch=max_batch, continuous=continuous,
                     continuous_block=cont_block)
        t0 = time.time()
        wall = eng.warmup(sc, include_speaker_buckets=spk_buckets,
                          include_streaming=True,
                          stream_block_size=tuple(blocks),
                          background_tail=background)
        tail_s = None
        if background and eng._warmup_tail is not None:
            eng._warmup_tail.join()
            tail_s = time.time() - t0 - wall
        eng.close()
        combos = getattr(eng, "warmup_combos", None)
        cold = "ECHO_TTS_COMPILE_CACHE" in os.environ
        mode_s = (f"continuous block {cont_block}" if continuous
                  else f"dispatch blocks {'x'.join(map(str, blocks))}")
        print(json.dumps({
            "metric": f"serving bring-up (Engine.warmup), {mode_s}, "
                      f"max_batch={max_batch}, "
                      f"{'full speaker buckets' if spk_buckets else 'no-speaker'}"
                      + (", cold cache" if cold else ", warm cache")
                      + (", background tail" if background else ""),
            "value": round(wall, 1),
            "unit": "s",
            "vs_baseline": round(wall, 1),
            "combos": combos,
            "tail_s": round(tail_s, 1) if tail_s is not None else None,
        }))
        return

    if trace:
        # Arrival-trace serving benchmark (VERDICT r4 item 3): a Poisson
        # arrival process against the real serving Engine, reporting
        # achieved throughput + p50/p95 TTFA/completion at this offered
        # load. Mode comes from the existing flags:
        #   dispatch-batched streaming (default): --batch N --blocks 64,576
        #   continuous block-boundary:            --continuous --cont-block N
        # Levers compose as elsewhere (--int8, --uncond-cache, --first-steps).
        #   --rate R   arrivals per second (Poisson; default 0.4)
        #   --n K      number of requests (default 16)
        #   --mix A;B  alternate requests between two block specs —
        #              heterogeneous traffic: different batch keys
        #              (dispatch) / two interleaving live groups
        #              (continuous, exercises the r5 FIFO-lock fairness)
        from echo_tts_tpu.bench.trace import run_trace
        from echo_tts_tpu.core.config import PipelineConfig
        from echo_tts_tpu.pipeline.pipeline import EchoTTS
        from echo_tts_tpu.serve.engine import Engine

        rate = 0.4
        if "--rate" in sys.argv:
            rate = float(sys.argv[sys.argv.index("--rate") + 1])
        n_req = 16
        if "--n" in sys.argv:
            n_req = int(sys.argv[sys.argv.index("--n") + 1])
        continuous = "--continuous" in sys.argv
        cont_block = 64
        if "--cont-block" in sys.argv:
            cont_block = int(sys.argv[sys.argv.index("--cont-block") + 1])
        blocks = [64, 192]
        if "--blocks" in sys.argv:
            blocks = [int(x) for x in
                      sys.argv[sys.argv.index("--blocks") + 1].split(",")]
        max_batch = batch if batch > 1 else 4
        mix = None
        if "--mix" in sys.argv:
            def _spec(s):
                v = [int(x) for x in s.split(",")]
                return v[0] if len(v) == 1 else tuple(v)
            mix = [_spec(s) for s in
                   sys.argv[sys.argv.index("--mix") + 1].split(";")]

        tts = EchoTTS(dit_params, dit_cfg, ae_params, ae_cfg, pca,
                      model_dtype=jnp.bfloat16, pipe_cfg=PipelineConfig())
        eng = Engine(tts, int8=int8, int8_encoders=int8_enc,
                     max_batch=max_batch, continuous=continuous,
                     continuous_block=cont_block)
        t0 = time.time()
        warm_specs = ([tuple(blocks)] if mix is None else
                      [s if isinstance(s, tuple) else (s,) for s in mix])
        for ws in warm_specs:
            if continuous:
                # the continuous warmup ladder follows continuous_block;
                # point it at each mixed spec's group block so BOTH live
                # groups' executables are warm
                eng.continuous_block = ws[-1]
            eng.warmup(sc, include_speaker_buckets=False,
                       include_streaming=True, stream_block_size=ws)
        eng.continuous_block = cont_block
        print(f"# trace warmup {time.time()-t0:.1f}s", file=sys.stderr)
        try:
            summary = run_trace(eng, sc, n_req, rate,
                                block_size=(cont_block if continuous
                                            else tuple(blocks)),
                                block_size_mix=mix)
        finally:
            eng.close()
        mode_s = (f"continuous block {cont_block}" if continuous
                  else f"dispatch blocks {'x'.join(map(str, blocks))}")
        if mix is not None:
            mode_s += f", mixed keys {mix}"
        levers = []
        if int8:
            levers.append("int8" + ("+enc" if int8_enc else ""))
        if uncond_cache > 1:
            levers.append(f"cache k={uncond_cache}")
        if first_steps:
            levers.append(f"first {first_steps}")
        if solver != "euler" or steps != STEPS:
            levers.append(f"{solver}-{steps}")
        print(json.dumps({
            "metric": f"arrival-trace serving, {mode_s}, max_batch="
                      f"{max_batch}"
                      + (", " + "+".join(levers) if levers else "")
                      + f", rate {rate}/s x {n_req} reqs",
            "value": summary["achieved_audio_s_per_s"],
            "unit": "audio_s_per_s_per_chip",
            "vs_baseline": summary["achieved_audio_s_per_s"],
            **summary,
        }))
        sys.exit(0 if summary["n_ok"] == n_req else 1)

    if "--check" in sys.argv:
        # On-TPU full-shape kernel correctness gate: the numeric tests verify
        # the Pallas kernels in interpret mode at tiny CPU shapes only — a
        # Mosaic shape-dependent miscompile at the serving shapes would ship
        # a wrong headline silently. This runs the COMPILED kernels at the
        # real shapes against the XLA formulations. Run it whenever kernels
        # or serving shapes change (README documents it).
        from echo_tts_tpu.models import s1dac as _s1d
        from echo_tts_tpu.models.dit import (
            dit_forward_cfg, get_kv_cache_speaker, get_kv_cache_text)
        from echo_tts_tpu.models import dit as _dit

        def rel(a, b):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))

        kvt = jax.jit(get_kv_cache_text, static_argnames=("cfg",))(
            dit_params, dit_cfg, ids, text_mask)
        kvs = jax.jit(get_kv_cache_speaker, static_argnames=("cfg",))(
            dit_params, dit_cfg, speaker_latent.astype(jnp.bfloat16))
        x = noise[:, :SEQ].astype(jnp.bfloat16)
        t = jnp.full((batch,), 0.7, jnp.bfloat16)
        outs = {}
        for impl in ("pallas", "xla"):
            _dit.set_attention_impl(impl)
            f = jax.jit(lambda p, x_, t_, tm, sm, kt, ks: dit_forward_cfg(
                p, dit_cfg, x_, t_, tm, sm, kt, ks))  # fresh fn per impl:
            #   the impl global is not part of jit's cache key
            outs[impl] = np.asarray(
                f(dit_params, x, t, text_mask, speaker_mask, kvt, kvs),
                np.float32)
        attn_rel = rel(outs["pallas"], outs["xla"])

        # no-speaker serving shape: ONE speaker patch (T=1 segment). The
        # r5 trace bench caught a Mosaic miscompile here (degenerate-T dot
        # -> 'vector.broadcast' verification failure) that every big-speaker
        # run missed — gate it permanently.
        spk1 = jax.random.normal(jax.random.fold_in(key, 9),
                                 (batch, 4, dit_cfg.latent_size),
                                 dtype=jnp.float32)
        kvs1 = jax.jit(get_kv_cache_speaker, static_argnames=("cfg",))(
            dit_params, dit_cfg, spk1.astype(jnp.bfloat16))
        smask1 = jnp.zeros((batch, 4), jnp.bool_)  # no-speaker: all masked
        outs1 = {}
        for impl in ("pallas", "xla"):
            _dit.set_attention_impl(impl)
            f1 = jax.jit(lambda p, x_, t_, tm, sm, kt, ks: dit_forward_cfg(
                p, dit_cfg, x_, t_, tm, sm, kt, ks))
            outs1[impl] = np.asarray(
                f1(dit_params, x, t, text_mask, smask1, kvt, kvs1),
                np.float32)
        _dit.set_attention_impl("auto")
        attn1_rel = rel(outs1["pallas"], outs1["xla"])
        attn_rel = max(attn_rel, attn1_rel)

        zq = jax.random.normal(jax.random.fold_in(key, 7),
                               (batch, ae_cfg.latent_dim, SEQ),
                               dtype=jnp.bfloat16) * 0.3
        # make bias-driven pad/streaming semantics observable: random init
        # zero-inits conv biases, and unit(0)==0 hid a real streaming
        # pad-re-zero bug. Perturb every decoder res-unit bias (same params
        # feed both paths, so parity math is unchanged).
        ae_chk = jax.tree_util.tree_map(lambda x: x, ae_params)
        bkey = jax.random.fold_in(key, 11)
        for blk in ae_chk["decoder"]["blocks"]:
            for u in blk["res_units"]:
                for cname in ("conv1", "conv2"):
                    bkey, k2 = jax.random.split(bkey)
                    w = u[cname]["w"]
                    u[cname]["b"] = (0.3 * jax.random.normal(
                        k2, (w.shape[0],), jnp.float32)).astype(w.dtype)

        vouts = {}
        for impl in ("xla", "pallas"):
            _s1d.set_conv_impl(impl)
            g = jax.jit(lambda p, z: _s1d.decode_zq(p, ae_cfg, z))
            vouts[impl] = np.asarray(g(ae_chk, zq), np.float32)
        conv_rel = rel(vouts["pallas"], vouts["xla"])

        # streaming gate (impl still "pallas"): the COMPILED stateful decode
        # over the serving block schedule must match the full decode
        # PER BLOCK (a localized first-chunk error disappears into a
        # whole-waveform norm) — the round-3 streaming pad-re-zero bug was
        # invisible to the full-decode gate above and to interpret-mode CPU
        # tests
        st = _s1d.streaming_decode_init(ae_chk, ae_cfg, batch,
                                        dtype=jnp.bfloat16)
        stream_rel, off = 0.0, 0
        spl = ae_cfg.frame_length
        for bs_ in (64, 192, 192, 192):
            a, st = _s1d.decode_zq_stream_step_jit(
                ae_chk, ae_cfg, st, zq[:, :, off:off + bs_], 1024)
            ref_slice = vouts["pallas"][:, :, off * spl:(off + bs_) * spl]
            stream_rel = max(stream_rel, rel(np.asarray(a, np.float32),
                                             ref_slice))
            off += bs_
        _s1d.set_conv_impl("auto")

        # bf16 outputs: rounding alone gives ~1e-3 rel-L2 between two exact
        # formulations; a miscompile gives O(1). 2e-2 cleanly separates.
        ok = attn_rel < 2e-2 and conv_rel < 2e-2 and stream_rel < 2e-2
        print(f"# kernel check @serving shapes: attention rel {attn_rel:.2e},"
              f" vocoder chains rel {conv_rel:.2e},"
              f" streaming decode per-block rel {stream_rel:.2e}",
              file=sys.stderr)

        extra = {}
        if int8:
            # int8 on-chip gate (VERDICT r3 item 5): the COMPILED quantized
            # trunk over the full 40-step serving sampler vs the bf16 path,
            # same noise — the 34.0 / 25.2 int8 headlines must not ship on a
            # silently broken quant dispatch. Envelope: >= 40 dB latent SNR
            # (measured 46-47 dB; scripts/quant_snr.py, random-init caveat
            # in BASELINE.md — the gate bound is deliberately looser).
            from echo_tts_tpu.models.quant import quantize_dit_params

            qparams = jax.jit(lambda p: quantize_dit_params(
                p, encoders=int8_enc))(dit_params)

            def run_lat(p):
                return sample_euler_cfg_independent_guidances(
                    p, dit_cfg, sc, speaker_latent, speaker_mask, ids,
                    text_mask, noise, model_dtype=jnp.bfloat16)

            lat_ref = np.asarray(run_lat(dit_params), np.float32)
            lat_q = np.asarray(run_lat(qparams), np.float32)
            qerr = rel(lat_q, lat_ref)
            int8_snr_db = float(-20.0 * np.log10(qerr + 1e-30))
            int8_ok = int8_snr_db >= 40.0
            ok = ok and int8_ok
            extra = {"int8_latent_rel_l2": round(qerr, 6),
                     "int8_latent_snr_db": round(int8_snr_db, 1),
                     "int8_encoders": int8_enc}
            print(f"# int8 gate @serving shapes: latent rel {qerr:.2e} = "
                  f"{int8_snr_db:.1f} dB SNR over the 40-step sampler "
                  f"({'pass' if int8_ok else 'FAIL'} @ >=40 dB)",
                  file=sys.stderr)

        print(json.dumps({
            "metric": "on-chip kernel-vs-XLA rel error (CFG fwd @640; "
                      "decode_zq @640; streamed decode @64+192x3"
                      + ("; int8 trunk 40-step SNR" if int8 else "") + ")",
            "value": round(max(attn_rel, conv_rel, stream_rel), 8),
            "unit": "rel_l2",
            "vs_baseline": 1.0 if ok else 0.0,
            "pass": ok,
            **extra,
        }))
        sys.exit(0 if ok else 1)

    if "--continuous" in sys.argv:
        # Continuous-batching group step at serving scale (serve/continuous
        # .py): B rows at staggered positions, uniform 64-latent blocks.
        # Reports per-block step time, per-chip throughput (B rows x 64
        # latents per step), and the join cost (_join_row = KV builds +
        # row-state reset, one dispatch).
        from echo_tts_tpu.core.config import PipelineConfig
        from echo_tts_tpu.pipeline.pipeline import (
            EchoTTS,
            _join_row,
            _stream_step_rows,
            init_stream_group,
        )

        bs = 64
        if "--cont-block" in sys.argv:
            bs = int(sys.argv[sys.argv.index("--cont-block") + 1])
        total = SEQ + bs
        tts = EchoTTS(dit_params, dit_cfg, ae_params, ae_cfg, pca,
                      model_dtype=jnp.bfloat16,
                      pipe_cfg=PipelineConfig())
        gs = init_stream_group(tts, batch, total, TEXT, SPK)
        t0 = time.time()
        for r in range(batch):
            gs = _join_row(dit_params, dit_cfg, ae_params, ae_cfg, gs,
                           jnp.int32(r), ids[:1], text_mask[:1],
                           speaker_latent[:1], speaker_mask[:1], jnp.bfloat16)
        jax.block_until_ready(gs["kv_text"])
        t_join_compile = time.time() - t0

        starts0 = np.arange(batch, dtype=np.int32) * bs  # staggered rows
        valids = jnp.full((batch,), bs, jnp.int32)

        def step(gs, starts, noise_i):
            return _stream_step_rows(
                dit_params, dit_cfg, sc, ae_params, ae_cfg, pca, gs,
                jnp.asarray(starts), valids, noise_i, bs, total,
                jnp.bfloat16, max(1024, total))

        n_warm, n_meas = 2, 6
        starts = starts0.copy()
        rngs = [draw_noise(100 + i, (batch, bs, dit_cfg.latent_size))
                for i in range(n_warm + n_meas)]
        for i in range(n_warm):
            gs, audio, block_lat = step(gs, starts, rngs[i])
            jax.device_get((audio, block_lat))
            starts = (starts + bs) % SEQ
        t0 = time.time()
        for i in range(n_warm, n_warm + n_meas):
            gs, audio, block_lat = step(gs, starts, rngs[i])
            jax.device_get((audio, block_lat))  # per-block host fetch as served
            starts = (starts + bs) % SEQ
        step_s = (time.time() - t0) / n_meas

        # join cost: one more admission into a warm group
        t0 = time.time()
        gs = _join_row(dit_params, dit_cfg, ae_params, ae_cfg, gs,
                       jnp.int32(0), ids[:1], text_mask[:1],
                       speaker_latent[:1], speaker_mask[:1], jnp.bfloat16)
        jax.block_until_ready(gs["kv_text"])
        join_s = time.time() - t0

        # fast-join admission (round 5, serve/continuous.py): the joiner's
        # first block samples SOLO inside the admission dispatch, so
        # admission -> first audio = this call (+ the in-flight block
        # remainder), not a full group step. Timed at the serving step
        # count and at the 16-step first_block_steps variant.
        import dataclasses as _dc

        from echo_tts_tpu.pipeline.pipeline import _join_row_first_block

        fast = {}
        for label, sc_j in (("fastjoin_ms", sc),
                            ("fastjoin16_ms",
                             _dc.replace(sc, first_block_steps=None,
                                         num_steps=16))):
            nj = draw_noise(900, (1, bs, dit_cfg.latent_size))
            gs, a_fj, _bl = _join_row_first_block(   # compile
                dit_params, dit_cfg, sc_j, ae_params, ae_cfg, pca, gs,
                0, ids[:1], text_mask[:1], speaker_latent[:1],
                speaker_mask[:1], nj, bs, total, jnp.bfloat16,
                max(1024, total))
            jax.device_get(a_fj)
            t0 = time.time()
            for i in range(3):
                gs, a_fj, _bl = _join_row_first_block(
                    dit_params, dit_cfg, sc_j, ae_params, ae_cfg, pca, gs,
                    0, ids[:1], text_mask[:1], speaker_latent[:1],
                    speaker_mask[:1],
                    draw_noise(901 + i, (1, bs, dit_cfg.latent_size)),
                    bs, total, jnp.bfloat16, max(1024, total))
                jax.device_get(a_fj)
            fast[label] = round((time.time() - t0) / 3 * 1e3, 1)
        print(f"# fast-join admission: {fast['fastjoin_ms']:.0f}ms at "
              f"{STEPS} steps, {fast['fastjoin16_ms']:.0f}ms at 16 steps "
              f"(admission->first-audio; was join+2 steps "
              f"{(join_s + 2*step_s)*1e3:.0f}ms)", file=sys.stderr)

        extra = dict(fast)
        if "--cont-elastic" in sys.argv and batch > 1:
            # elastic group sizing: time the B->B/2 shrink and B/2->B grow
            # gathers the scheduler issues at size transitions
            # (pipeline._resize_group), plus the half-size step — the cost a
            # lone surviving stream actually pays after the group shrinks
            from echo_tts_tpu.pipeline.pipeline import _resize_group

            half = batch // 2
            sh_perm = np.arange(half, dtype=np.int32)
            sh_keep = np.ones((half,), bool)
            gr_perm = np.arange(batch, dtype=np.int32) % half
            gr_keep = np.arange(batch) < half
            # compile both directions, then time an alternating
            # shrink/grow CHAIN (each call's input is the previous call's
            # output, so the relay cannot serve a cached execution) and
            # force it with a scalar fetch — block_until_ready alone does
            # not force execution through the relay (CLAUDE.md)
            gs_h = _resize_group(gs, sh_perm, sh_keep)
            gs_g = _resize_group(gs_h, gr_perm, gr_keep)
            float(np.asarray(gs_g["prefix"].sum()))
            n_pairs = 4
            t0 = time.time()
            for _ in range(n_pairs):
                gs_h = _resize_group(gs_g, sh_perm, sh_keep)
                gs_g = _resize_group(gs_h, gr_perm, gr_keep)
            float(np.asarray(gs_g["prefix"].sum()))
            resize_s = (time.time() - t0) / (2 * n_pairs)

            valids_h = jnp.full((half,), bs, jnp.int32)
            starts_h = np.arange(half, dtype=np.int32) * bs

            def step_h(gs, starts, noise_i):
                return _stream_step_rows(
                    dit_params, dit_cfg, sc, ae_params, ae_cfg, pca, gs,
                    jnp.asarray(starts), valids_h, noise_i, bs, total,
                    jnp.bfloat16, max(1024, total))

            nh = draw_noise(500, (half, bs, dit_cfg.latent_size))
            gs_h, audio, bl = step_h(gs_h, starts_h, nh)     # compile
            jax.device_get((audio, bl))
            t0 = time.time()
            for i in range(3):
                gs_h, audio, bl = step_h(
                    gs_h, (starts_h + (i + 1) * bs) % SEQ,
                    draw_noise(501 + i, (half, bs, dit_cfg.latent_size)))
                jax.device_get((audio, bl))
            half_step_s = (time.time() - t0) / 3
            extra.update({
                     "resize_ms": round(resize_s * 1e3, 1),
                     "half_step_ms": round(half_step_s * 1e3, 1),
                     "half_audio_s_per_s": round(
                         half * bs * ae_cfg.frame_length / ae_cfg.sample_rate
                         / half_step_s, 3)})
            print(f"# elastic: resize {resize_s*1e3:.0f}ms/call (chained "
                  f"mean of {2*n_pairs}), B={half} step "
                  f"{half_step_s*1e3:.0f}ms", file=sys.stderr)

        audio_per_block = bs * ae_cfg.frame_length / ae_cfg.sample_rate
        value = batch * audio_per_block / step_s
        print(f"# continuous group B={batch}, block {bs}: step "
              f"{step_s*1e3:.0f}ms ({value:.2f} audio-s/s/chip), join "
              f"{join_s*1e3:.0f}ms (worst-case admission latency ~= "
              f"{(join_s + 2*step_s)*1e3:.0f}ms to first audio; compile+first "
              f"joins {t_join_compile:.1f}s)", file=sys.stderr)
        print(json.dumps({
            "metric": f"continuous-batching stream group, B={batch} rows x "
                      f"{bs}-latent blocks, audio-s/s/chip",
            "value": round(value, 3),
            "unit": "audio_s_per_s_per_chip",
            "vs_baseline": round(value, 3),
            "step_ms": round(step_s * 1e3, 1),
            "join_ms": round(join_s * 1e3, 1),
            **extra,
        }))
        return

    if blockwise:
        # interleaved streaming: ONE fused executable per block (sample +
        # deproject + STATEFUL vocoder step — pipeline.stream_blocks_fused;
        # the carried decoder state makes vocoder cost O(block), vs the
        # round-2 receptive-field re-decode at ~17x redundant work). Reports
        # time-to-first-audio alongside throughput. --blocks 64,192 uses a
        # small first block for TTFA (last entry repeats to fill 640).
        from echo_tts_tpu.pipeline.pipeline import (
            _block_schedule,
            stream_blocks_fused,
        )
        blocks = (160, 160, 160, 160)
        if "--blocks" in sys.argv:
            spec = [int(x) for x in
                    sys.argv[sys.argv.index("--blocks") + 1].split(",")]
            blocks = tuple(_block_schedule(spec, SEQ,
                                           dit_cfg.speaker_patch_size))
        ttfa = []
        last_audio = {}

        def sample(noise_i):
            noises, off = [], 0
            for bs in blocks:
                noises.append(noise_i[:, off:off + bs])
                off += bs
            t0 = time.time()
            chunks, lat = [], None
            for prefix, chunk, start, bs in stream_blocks_fused(
                    dit_params, dit_cfg, sc, ae_params, ae_cfg, pca,
                    speaker_latent, speaker_mask, ids, text_mask,
                    blocks, noises, jnp.bfloat16):
                force(chunk)
                if not chunks:
                    ttfa.append(time.time() - t0)
                chunks.append(chunk)
                lat = prefix
            last_audio["a"] = jnp.concatenate(chunks, axis=-1)
            return lat

        def decode(lat):  # decode already happened inside the stream
            return last_audio["a"]
    else:
        # fused sampler+vocoder: ONE executable per utterance (the serving
        # path, pipeline._sample_and_decode) — no relay round-trip between
        # sampling and decode
        from echo_tts_tpu.pipeline.pipeline import _sample_and_decode

        def sample(noise_i):
            lat, audio = _sample_and_decode(
                dit_params, dit_cfg, sc, ae_params, ae_cfg, pca,
                speaker_latent, speaker_mask, ids, text_mask, noise_i,
                jnp.bfloat16)
            return lat, audio

        def decode(pair):
            force(pair[1])
            return pair[1]

    def run(noise_i):
        out = sample(noise_i)
        audio = decode(out)
        return out, audio

    t0 = time.time()
    lat, audio = run(noise)
    print(f"# compile+first-run {time.time()-t0:.1f}s", file=sys.stderr)

    # distinct noises per repeat: identical executions can be served from a
    # relay-side cache
    noises = [draw_noise(i + 1, (batch, SEQ, dit_cfg.latent_size))
              for i in range(3)]
    times, sample_t, voc_t = [], [], []
    for i in range(3):
        t0 = time.time()
        out = sample(noises[i])
        if blockwise:
            force(out)
            t1 = time.time()
            audio = decode(out)
            t2 = time.time()
        else:
            audio = decode(out)  # fused: one fence covers sample+vocoder
            t1 = t2 = time.time()
        sample_t.append(t1 - t0)
        voc_t.append(t2 - t1)
        times.append(t2 - t0)

    wall = min(times)
    audio_seconds = batch * SEQ * ae_cfg.frame_length / ae_cfg.sample_rate
    value = audio_seconds / wall
    if blockwise:
        print(f"# sample {min(sample_t)*1e3:.0f}ms ({min(sample_t)*1e3/steps:.1f}ms/step), "
              f"vocoder {min(voc_t)*1e3:.0f}ms, audio {audio.shape}", file=sys.stderr)
    else:
        print(f"# sample+vocoder fused {wall*1e3:.0f}ms "
              f"({wall*1e3/steps:.1f}ms/step incl. decode), audio {audio.shape}",
              file=sys.stderr)
    mode = ""
    if force_speaker:
        mode = ", force-speaker kv_scale=1.5"
    if uncond_cache > 1:
        mode += f", uncond-cache k={uncond_cache}"
    if joint_uncond:
        mode += ", joint-uncond"
    if first_steps:
        mode += f", first-block {first_steps} steps"
    if solver != "euler" or steps != STEPS:
        mode += f", solver {solver}-{steps}"
    if int8:
        mode += ", int8 W8A8 trunk" + ("+encoders" if int8_enc else "")
    if blockwise:
        mode += f", blockwise {'x'.join(str(b) for b in blocks)} streaming"
        print(f"# time-to-first-audio {min(ttfa)*1e3:.0f}ms "
              f"(first {blocks[0]}-latent block = "
              f"{blocks[0]*ae_cfg.frame_length/ae_cfg.sample_rate:.1f}s audio)",
              file=sys.stderr)
    print(json.dumps({
        "metric": ("audio-seconds/s/chip, 40-step dual-CFG Euler @640 latents"
                   " + S1-DAC decode" + (f", batch={batch}" if batch > 1 else "")
                   + mode),
        "value": round(value, 3),
        "unit": "audio_s_per_s_per_chip",
        "vs_baseline": round(value / 1.0, 3),
    }))


if __name__ == "__main__":
    main()
