#!/usr/bin/env python
"""Offline batch synthesis: a JSONL of requests -> WAV files, batched.

The reference generates one utterance per Gradio click (gradio_app.py:229-430);
this is the bulk-production form: requests are grouped into device batches of
`--max-batch` (one fused sampler+vocoder executable per batch,
pipeline.sample_pipeline_batch) with the speaker-conditioning LRU shared
across the run, so N texts for one voice pay one AE encode.

Input lines: {"id": "utt1", "text": "...", "speaker": "voice.wav"|null,
              "seed": 0}
Usage:
  python scripts/batch_synthesize.py --input reqs.jsonl --outdir out/ \
      --dit dit.safetensors --ae ae.safetensors --pca pca.safetensors \
      [--max-batch 4] [--preset NAME] [--ae-bf16] [--int8]
Smoke mode (random tiny weights, CPU): --random-tiny --cpu
Prints one JSON summary line: files written, audio seconds, wall, audio-s/s.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--dit")
    ap.add_argument("--ae")
    ap.add_argument("--pca")
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--preset")
    ap.add_argument("--presets-file", default="sampler_presets.json")
    ap.add_argument("--ae-bf16", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--normalize-text", action="store_true")
    ap.add_argument("--random-tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--num-steps", type=int)
    ap.add_argument("--sequence-length", type=int)
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from echo_tts_tpu.core.config import (
        AEConfig, DiTConfig, PipelineConfig, SamplerConfig)
    from echo_tts_tpu.models.pca import PCAState
    from echo_tts_tpu.pipeline.audio_io import load_audio, write_wav
    from echo_tts_tpu.pipeline.pipeline import EchoTTS, sample_pipeline_batch
    from echo_tts_tpu.serve.engine import _LRUCache
    from echo_tts_tpu.serve.presets import load_sampler_presets

    if args.random_tiny:
        from echo_tts_tpu.bench.init_ae import init_ae_params
        from echo_tts_tpu.models.dit import init_dit_params

        dit_cfg = DiTConfig().tiny()
        ae_cfg = AEConfig().tiny()
        tts = EchoTTS(
            init_dit_params(jax.random.PRNGKey(0), dit_cfg, jnp.float32), dit_cfg,
            init_ae_params(jax.random.PRNGKey(1), ae_cfg), ae_cfg,
            PCAState.random(latent_dim=ae_cfg.latent_dim,
                            out_dim=dit_cfg.latent_size),
            model_dtype=jnp.float32,
            pipe_cfg=PipelineConfig(max_text_length=64, text_buckets=(64,),
                                    speaker_buckets=(16, 32),
                                    audio_chunk_latents=16))
    else:
        from echo_tts_tpu.checkpoints.io import (
            load_ae_from_safetensors, load_dit_from_safetensors)

        dit_params, dit_cfg = load_dit_from_safetensors(
            args.dit, delete_blockwise_modules=True)
        if args.int8:
            from echo_tts_tpu.models.quant import quantize_dit_params

            dit_params = jax.jit(quantize_dit_params)(dit_params)
        ae_params, ae_cfg = load_ae_from_safetensors(
            args.ae, dtype=jnp.bfloat16 if args.ae_bf16 else jnp.float32)
        tts = EchoTTS(dit_params, dit_cfg, ae_params, ae_cfg,
                      PCAState.from_safetensors(args.pca))

    if args.preset:
        sc = load_sampler_presets(args.presets_file)[args.preset]
    else:
        sc = SamplerConfig()
    overrides = {}
    if args.num_steps:
        overrides["num_steps"] = args.num_steps
    if args.sequence_length:
        overrides["sequence_length"] = args.sequence_length
    if overrides:
        import dataclasses

        sc = dataclasses.replace(sc, **overrides)

    with open(args.input) as f:
        reqs = [json.loads(line) for line in f if line.strip()]
    os.makedirs(args.outdir, exist_ok=True)

    speaker_cache = _LRUCache(16)
    audio_files = {}  # speaker path -> loaded array, shared across batches
    t0 = time.time()
    total_audio = 0.0
    written = []
    for lo in range(0, len(reqs), args.max_batch):
        chunk = reqs[lo:lo + args.max_batch]
        batch = []
        for r in chunk:
            spk = r.get("speaker")
            if spk and spk not in audio_files:
                audio_files[spk] = load_audio(spk)
            batch.append((r["text"], audio_files.get(spk), int(r.get("seed", 0))))
        results = sample_pipeline_batch(
            tts, batch, sc=sc, normalize_text=args.normalize_text,
            speaker_cache=speaker_cache)
        for r, (audio, _norm, _t) in zip(chunk, results):
            rid = str(r.get("id", f"utt{len(written)}"))
            path = os.path.join(args.outdir, rid + ".wav")
            write_wav(path, audio[0], ae_cfg.sample_rate)
            total_audio += audio.shape[-1] / ae_cfg.sample_rate
            written.append(path)
        print(f"# batch {lo // args.max_batch}: {len(chunk)} utterances",
              file=sys.stderr)
    wall = time.time() - t0
    print(json.dumps({
        "files": len(written), "audio_s": round(total_audio, 3),
        "wall_s": round(wall, 3),
        "audio_s_per_s": round(total_audio / max(wall, 1e-9), 3),
        "speaker_encodes": speaker_cache.misses,
        "speaker_cache_hits": speaker_cache.hits,
    }))
    return written


if __name__ == "__main__":
    main()
