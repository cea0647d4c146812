#!/usr/bin/env python
"""Full-scale quality check of the opt-in int8 W8A8 trunk (models/quant.py):
run the exact 40-step dual-CFG sampler twice on the SAME noise/conditioning —
bf16 trunk vs int8 trunk — and report latent relative error, latent SNR, and
decoded-waveform relative error. Random-init weights (zero-egress env); the
error statistics measure the quantization scheme itself, since FLOPs, shapes
and activation statistics match the trained model.

Run ad hoc on the TPU; prints one JSON line to stdout.
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

from echo_tts_tpu.core.config import AEConfig, DiTConfig, SamplerConfig
from echo_tts_tpu.bench.init_ae import init_ae_params
from echo_tts_tpu.models import pca as pca_mod
from echo_tts_tpu.models.dit import init_dit_params
from echo_tts_tpu.models.pca import PCAState
from echo_tts_tpu.models.quant import quantize_dit_params
from echo_tts_tpu.models.s1dac import decode_zq
from echo_tts_tpu.sampling.euler_cfg import (
    draw_noise,
    sample_euler_cfg_independent_guidances,
)

SEQ, TEXT, SPK = 640, 768, 6400


def main():
    encoders = "--encoders" in sys.argv  # also quantize encoder/KV-proj GEMMs
    # --blockwise: measure the STREAMING path instead (blockwise sampler +
    # stateful vocoder, blocks 64+192x3) — int8 noise could compound across
    # blocks because each block conditions on the previous quantized outputs
    # through the latent-prefix KV
    blockwise = "--blockwise" in sys.argv
    # --uncond-cache k: ALSO enable uncond-branch caching on the test run
    # (reference stays exact), measuring the TOTAL deviation of the shipped
    # combo mode (int8 + cached unconds) rather than int8 alone
    uncond_k = 1
    if "--uncond-cache" in sys.argv:
        uncond_k = int(sys.argv[sys.argv.index("--uncond-cache") + 1])
    # --bf16: keep the test run's weights bf16 (no int8) — isolates the
    # uncond-cache approximation's own deviation for attribution
    bf16_test = "--bf16" in sys.argv
    # --first-steps k: first streaming block sampled with k Euler steps on
    # the test run (the opt-in TTFA knob; blockwise only)
    first_steps = None
    if "--first-steps" in sys.argv:
        first_steps = int(sys.argv[sys.argv.index("--first-steps") + 1])
    if first_steps and not blockwise:
        sys.exit("--first-steps is a streaming knob; add --blockwise")
    # --solver midpoint [--steps N]: test run uses the opt-in RK2 integrator
    # at N steps (2N velocity evals) against the exact euler-40 reference —
    # the NFE-reduction lever's quality measurement (sampling/euler_cfg.py)
    solver = "euler"
    if "--solver" in sys.argv:
        solver = sys.argv[sys.argv.index("--solver") + 1]
    test_steps = None
    if "--steps" in sys.argv:
        test_steps = int(sys.argv[sys.argv.index("--steps") + 1])
    # --ref-steps N: reference run uses euler-N instead of euler-40 — e.g.
    # midpoint-12 vs euler-80 measures the midpoint trajectory's distance to
    # a FINER integration (whether it is inside euler-40's own
    # discretization-error envelope), not its distance to euler-40
    ref_steps = None
    if "--ref-steps" in sys.argv:
        ref_steps = int(sys.argv[sys.argv.index("--ref-steps") + 1])
    approximated = (uncond_k > 1 or first_steps or solver != "euler"
                    or test_steps is not None or ref_steps is not None)
    if bf16_test and not approximated:
        sys.exit("--bf16 without an approximation flag (--uncond-cache/"
                 "--first-steps/--solver/--steps) compares a run against "
                 "itself (SNR ~ inf)")
    cfg = DiTConfig(has_latent_modules=blockwise)
    ae_cfg = AEConfig()
    sc = SamplerConfig(num_steps=40, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
                       cfg_min_t=0.5, cfg_max_t=1.0, truncation_factor=0.8,
                       sequence_length=SEQ)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: init_dit_params(k, cfg, dtype=jnp.bfloat16))(key)
    qparams = jax.jit(lambda p: quantize_dit_params(p, encoders=encoders))(params)
    ae_params = jax.jit(lambda k: init_ae_params(k, AEConfig(), dtype=jnp.bfloat16))(
        jax.random.fold_in(key, 1))
    pca = PCAState.random()

    ks = jax.random.split(key, 3)
    ids = jax.random.randint(ks[0], (1, TEXT), 0, 256)
    tmask = jnp.ones((1, TEXT), jnp.bool_)
    spk = jax.random.normal(ks[1], (1, SPK, cfg.latent_size), jnp.float32)
    smask = jnp.ones((1, SPK), jnp.bool_)
    noise = draw_noise(0, (1, SEQ, cfg.latent_size))

    if blockwise:
        from echo_tts_tpu.pipeline.pipeline import (
            _block_schedule,
            stream_blocks_fused,
        )

        blocks = _block_schedule((64, 192), SEQ, cfg.speaker_patch_size)
        noises, off = [], 0
        for bs in blocks:
            noises.append(noise[:, off:off + bs])
            off += bs

        def run(p, sc_run):
            chunks, lat = [], None
            for prefix, chunk, _s, _b in stream_blocks_fused(
                    p, cfg, sc_run, ae_params, ae_cfg, pca, spk, smask, ids,
                    tmask, blocks, noises, jnp.bfloat16):
                chunks.append(np.asarray(chunk, np.float32))
                lat = prefix
            return np.asarray(lat), np.concatenate(chunks, axis=-1)
    else:
        def run(p, sc_run):
            lat = sample_euler_cfg_independent_guidances(
                p, cfg, sc_run, spk, smask, ids, tmask, noise,
                model_dtype=jnp.bfloat16)
            z_q = pca_mod.deproject(pca, lat)
            audio = decode_zq(ae_params, ae_cfg, z_q.astype(jnp.bfloat16))
            return np.asarray(lat), np.asarray(audio, dtype=np.float32)

    t0 = time.time()
    import dataclasses
    sc_test = dataclasses.replace(sc, uncond_cache_interval=uncond_k,
                                  first_block_steps=first_steps,
                                  solver=solver,
                                  num_steps=test_steps or sc.num_steps)
    sc_ref = (dataclasses.replace(sc, num_steps=ref_steps) if ref_steps
              else sc)
    lat_ref, audio_ref = run(params, sc_ref)
    lat_q, audio_q = run(params if bf16_test else qparams, sc_test)
    print(f"# two full samples + decode in {time.time()-t0:.1f}s", file=sys.stderr)

    def rel(a, b):
        return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))

    lat_rel = rel(lat_q, lat_ref)
    snr_db = float(-20.0 * np.log10(lat_rel + 1e-12))
    audio_rel = rel(audio_q, audio_ref)
    print(json.dumps({
        "metric": (("bf16" if bf16_test else "int8 W8A8 trunk")
                   + ("+encoders" if encoders else "")
                   + (f"+uncond-cache k={uncond_k}" if uncond_k > 1 else "")
                   + (f"+first-block {first_steps} steps" if first_steps
                      else "")
                   + (f"+{solver}-{test_steps or sc.num_steps}"
                      if solver != "euler" or test_steps else "")
                   + (f" vs bf16 euler-{ref_steps}, " if ref_steps
                      else " vs bf16 exact, ")
                   + ("blockwise 64+192x3 streaming" if blockwise
                      else "exact 40-step sampler") + ", same noise"),
        "latent_rel_l2": round(lat_rel, 4),
        "latent_snr_db": round(snr_db, 1),
        "waveform_rel_l2": round(audio_rel, 4),
    }))


if __name__ == "__main__":
    main()
