#!/usr/bin/env python
"""Serve entry point: load checkpoints, start the HTTP API (and the Gradio UI
when installed). reference analogue: `python gradio_app.py`.

Usage:
  python scripts/serve.py --dit dit.safetensors --ae ae.safetensors \
      --pca pca.safetensors [--port 7860] [--ae-bf16] [--gradio]
Random-weight smoke mode (no checkpoints): --random-tiny
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# persistent compile cache (same policy as bench.py): a server restart
# re-runs warmup, and without the cache every restart re-pays the full
# multi-minute compile set through the relay
_cache_dir = os.environ.get(
    "ECHO_TTS_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dit")
    ap.add_argument("--ae")
    ap.add_argument("--pca")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--ae-bf16", action="store_true",
                    help="bf16 AE (reference low-VRAM mode, gradio_app.py:36-38)")
    ap.add_argument("--keep-blockwise", action="store_true")
    ap.add_argument("--gradio", action="store_true")
    ap.add_argument("--presets", default="sampler_presets.json")
    ap.add_argument("--random-tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (this image pins a TPU plugin; "
                         "the env var alone is not honored)")
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile every shape-bucket executable before "
                         "accepting requests (Engine.warmup)")
    ap.add_argument("--int8", action="store_true",
                    help="opt-in W8A8 int8 trunk (models/quant.py): ~1.34x "
                         "throughput at 46.9 dB latent SNR (BASELINE.md)")
    ap.add_argument("--int8-cache", default=None, metavar="PATH",
                    help="npz cache of the quantized base params: first "
                         "start quantizes and saves, restarts load and skip "
                         "the quantization jit. Only worth it when compiles "
                         "are slow AND uncached: measured a net startup LOSS "
                         "under the axon relay (load 78 s vs quantize 1.9 s "
                         "warm — BASELINE.md negative result j)")
    ap.add_argument("--max-batch", type=int, default=1,
                    help=">1 enables continuous micro-batching: concurrent "
                         "compatible requests run as one batched device call")
    ap.add_argument("--batch-wait-ms", type=float, default=10.0)
    ap.add_argument("--continuous", action="store_true",
                    help="block-boundary continuous batching for /tts_stream "
                         "(requires --max-batch > 1): new streams JOIN a "
                         "running group at the next block boundary instead "
                         "of waiting for it to finish (serve/continuous.py)")
    ap.add_argument("--continuous-block", type=int, default=64,
                    help="uniform latent block size for continuous stream "
                         "groups")
    ap.add_argument("--no-fast-join", action="store_true",
                    help="disable solo first-block sampling at continuous "
                         "admission (fast join trades one B=1 block of "
                         "group stall per admission for ~10x lower "
                         "admission latency)")
    ap.add_argument("--warmup-background", action="store_true",
                    help="with --warmup: compile only the critical "
                         "no-speaker set before serving; finish speaker "
                         "buckets / batched sizes on a background thread "
                         "(health reports warmup_tail_running)")
    ap.add_argument("--tp", type=int, default=1,
                    help=">1 shards the DiT over a tensor-parallel mesh "
                         "(Megatron head/MLP split via GSPMD + shard_map'd "
                         "Pallas attention) — a latency / HBM-headroom mode; "
                         "single-chip throughput serving should prefer tp=1")
    args = ap.parse_args()

    if args.cpu:
        if args.tp > 1:
            # simulated multi-device CPU mesh (must precede backend init)
            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={args.tp}"
                ).strip()
        jax.config.update("jax_platforms", "cpu")

    from echo_tts_tpu.core.config import AEConfig, DiTConfig, PipelineConfig
    from echo_tts_tpu.models.pca import PCAState
    from echo_tts_tpu.pipeline.pipeline import EchoTTS
    from echo_tts_tpu.serve.engine import Engine
    from echo_tts_tpu.serve.presets import load_sampler_presets
    from echo_tts_tpu.serve.server import serve

    if args.random_tiny:
        from echo_tts_tpu.bench.init_ae import init_ae_params
        from echo_tts_tpu.models.dit import init_dit_params

        dit_cfg = DiTConfig().tiny()
        ae_cfg = AEConfig().tiny()
        tts = EchoTTS(
            init_dit_params(jax.random.PRNGKey(0), dit_cfg, jnp.float32), dit_cfg,
            init_ae_params(jax.random.PRNGKey(1), ae_cfg), ae_cfg,
            PCAState.random(latent_dim=ae_cfg.latent_dim, out_dim=dit_cfg.latent_size),
            model_dtype=jnp.float32,
            pipe_cfg=PipelineConfig(max_text_length=64, text_buckets=(64,),
                                    speaker_buckets=(16, 32), audio_chunk_latents=16))
    else:
        from echo_tts_tpu.checkpoints.io import (
            load_ae_from_safetensors, load_dit_from_safetensors)

        dit_params, dit_cfg = load_dit_from_safetensors(
            args.dit, delete_blockwise_modules=not args.keep_blockwise)
        ae_params, ae_cfg = load_ae_from_safetensors(
            args.ae, dtype=jnp.bfloat16 if args.ae_bf16 else jnp.float32)
        tts = EchoTTS(dit_params, dit_cfg, ae_params, ae_cfg,
                      PCAState.from_safetensors(args.pca))

    mesh = None
    if args.tp > 1:
        import dataclasses

        from echo_tts_tpu.core.config import MeshConfig
        from echo_tts_tpu.models.dit import set_attention_tp
        from echo_tts_tpu.parallel.mesh import make_mesh
        from echo_tts_tpu.parallel.sharding import shard_params

        mesh = make_mesh(MeshConfig(dp=1, tp=args.tp),
                         devices=jax.devices()[:args.tp])
        tts = dataclasses.replace(tts,
                                  dit_params=shard_params(tts.dit_params, mesh))
        set_attention_tp(mesh)  # shard_map the Pallas kernel over heads
        print(f"DiT sharded tensor-parallel over {args.tp} devices")

    # mesh passed through: Engine re-shards the effective params after int8
    # quantization / LoRA merges, so {"q","s"} leaves get the declared specs
    engine = Engine(tts, int8=args.int8, max_batch=args.max_batch,
                    batch_wait_ms=args.batch_wait_ms, mesh=mesh,
                    continuous=args.continuous,
                    continuous_block=args.continuous_block,
                    continuous_fast_join=not args.no_fast_join,
                    int8_cache_path=args.int8_cache)
    if args.warmup:
        from echo_tts_tpu.core.config import SamplerConfig as _SC

        print("warming up shape buckets (compiles every serving executable)...")
        # streaming executables too (fused prologue + block steps), so the
        # FIRST /tts_stream request meets the TTFA numbers
        wall = engine.warmup(
            _SC(), include_streaming=tts.dit_cfg.has_latent_modules,
            background_tail=args.warmup_background)
        tail = (" (background tail running)" if args.warmup_background
                else "")
        print(f"warmup done in {wall:.1f}s{tail}")
    presets = load_sampler_presets(args.presets) if os.path.exists(
        args.presets) or not args.random_tiny else None

    if args.gradio:
        from echo_tts_tpu.serve.gradio_app import build_app

        build_app(engine, presets).launch(server_name=args.host,
                                          server_port=args.port)
    else:
        print(f"HTTP TTS API on http://{args.host}:{args.port}")
        serve(engine, host=args.host, port=args.port, presets=presets)


if __name__ == "__main__":
    main()
