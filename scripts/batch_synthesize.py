#!/usr/bin/env python
"""Offline batch synthesis: a JSONL of requests -> WAV files, batched — and,
with --workers N, a fault-tolerant multi-process fleet.

The reference generates one utterance per Gradio click (gradio_app.py:229-430);
this is the bulk-production form: requests are grouped into device batches of
`--max-batch` (one fused sampler+vocoder executable per batch,
pipeline.sample_pipeline_batch) with the speaker-conditioning LRU shared
across the run, so N texts for one voice pay one AE encode.

Fleet mode (--workers N; the executable form of SURVEY.md §5.3 / BASELINE
config 5): N worker processes each load the model and synthesize their
assigned utterances; the coordinator (this process) assigns work, watches
heartbeats, and reassigns a dead worker's unfinished utterances to the
survivors (parallel.fleet). Sampling is stateless per utterance, so recovery
is resubmission; outputs are written atomically and deterministically, so a
double-finish is harmless. On THIS box workers must share the single TPU —
fleet mode here is for the CPU/tiny path and for real multi-host pods where
every worker owns its chip(s) and `fleet_dir` is a shared mount.

Input lines: {"id": "utt1", "text": "...", "speaker": "voice.wav"|null,
              "seed": 0}
Usage:
  python scripts/batch_synthesize.py --input reqs.jsonl --outdir out/ \
      --dit dit.safetensors --ae ae.safetensors --pca pca.safetensors \
      [--max-batch 4] [--preset NAME] [--ae-bf16] [--int8] [--workers N]
Smoke mode (random tiny weights, CPU): --random-tiny --cpu
Prints one JSON summary line: files written, audio seconds, wall, audio-s/s
(fleet mode adds workers / reassigned / dead_workers).
"""
import argparse
import json
import os
import subprocess
import sys
import time
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
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
    # fleet mode (parallel.fleet)
    ap.add_argument("--workers", type=int, default=0,
                    help=">0: coordinator mode — spawn N worker processes "
                         "and recover from worker deaths by reassignment")
    ap.add_argument("--stale-after-s", type=float, default=30.0,
                    help="heartbeat staleness window before a worker is "
                         "declared dead and its work reassigned")
    ap.add_argument("--fleet-dir",
                    help="shared fleet transport directory (default: "
                         "<outdir>/_fleet); workers on other hosts join by "
                         "pointing --worker-id at the same mount")
    ap.add_argument("--worker-id", type=int,
                    help="internal: run as fleet worker with this id")
    ap.add_argument("--worker-die-after",
                    help="fault injection: 'IDX:K' makes worker IDX "
                         "os._exit after K utterances (integration tests)")
    args = ap.parse_args(argv)
    if args.worker_id is None and not args.input:
        ap.error("--input is required (except in --worker-id mode)")
    return args


def build_tts(args):
    from echo_tts_tpu.core.config import AEConfig, DiTConfig, PipelineConfig
    from echo_tts_tpu.models.pca import PCAState
    from echo_tts_tpu.pipeline.pipeline import EchoTTS

    if args.random_tiny:
        from echo_tts_tpu.bench.init_ae import init_ae_params
        from echo_tts_tpu.models.dit import init_dit_params

        dit_cfg = DiTConfig().tiny()
        ae_cfg = AEConfig().tiny()
        return EchoTTS(
            init_dit_params(jax.random.PRNGKey(0), dit_cfg, jnp.float32), dit_cfg,
            init_ae_params(jax.random.PRNGKey(1), ae_cfg), ae_cfg,
            PCAState.random(latent_dim=ae_cfg.latent_dim,
                            out_dim=dit_cfg.latent_size),
            model_dtype=jnp.float32,
            pipe_cfg=PipelineConfig(max_text_length=64, text_buckets=(64,),
                                    speaker_buckets=(16, 32),
                                    audio_chunk_latents=16))
    from echo_tts_tpu.checkpoints.io import (
        load_ae_from_safetensors, load_dit_from_safetensors)

    dit_params, dit_cfg = load_dit_from_safetensors(
        args.dit, delete_blockwise_modules=True)
    if args.int8:
        from echo_tts_tpu.models.quant import quantize_dit_params

        dit_params = jax.jit(quantize_dit_params)(dit_params)
    ae_params, ae_cfg = load_ae_from_safetensors(
        args.ae, dtype=jnp.bfloat16 if args.ae_bf16 else jnp.float32)
    return EchoTTS(dit_params, dit_cfg, ae_params, ae_cfg,
                   PCAState.from_safetensors(args.pca))


def build_sc(args):
    from echo_tts_tpu.core.config import SamplerConfig
    from echo_tts_tpu.serve.presets import load_sampler_presets

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
    return sc


class _Synth:
    """Shared synthesis state: model + speaker LRU + loaded audio files.
    process(items) synthesizes one device batch and writes each WAV
    atomically (temp + os.replace — fleet reassignment may synthesize an
    utterance twice; the deterministic bytes make that idempotent)."""

    def __init__(self, args):
        from echo_tts_tpu.serve.engine import _LRUCache

        self.args = args
        self.tts = build_tts(args)
        self.sc = build_sc(args)
        self.speaker_cache = _LRUCache(16)
        self.audio_files = {}
        self.total_audio = 0.0
        self.written = []

    def process(self, items):
        from echo_tts_tpu.pipeline.audio_io import load_audio, write_wav
        from echo_tts_tpu.pipeline.pipeline import sample_pipeline_batch

        batch = []
        for r in items:
            spk = r.get("speaker")
            if spk and spk not in self.audio_files:
                self.audio_files[spk] = load_audio(spk)
            batch.append((r["text"], self.audio_files.get(spk),
                          int(r.get("seed", 0))))
        results = sample_pipeline_batch(
            self.tts, batch, sc=self.sc,
            normalize_text=self.args.normalize_text,
            speaker_cache=self.speaker_cache)
        for r, (audio, _norm, _t) in zip(items, results):
            path = os.path.join(self.args.outdir, str(r["id"]) + ".wav")
            tmp = f"{path}.tmp.{os.getpid()}"
            write_wav(tmp, audio[0], self.tts.ae_cfg.sample_rate)
            os.replace(tmp, path)
            self.total_audio += audio.shape[-1] / self.tts.ae_cfg.sample_rate
            self.written.append(path)


def _wav_seconds(path):
    with wave.open(path, "rb") as f:
        return f.getnframes() / f.getframerate()


def _load_requests(args):
    with open(args.input) as f:
        reqs = [json.loads(line) for line in f if line.strip()]
    for i, r in enumerate(reqs):
        r.setdefault("id", f"utt{i}")
        r["id"] = str(r["id"])
    return reqs


def _worker_main(args):
    from echo_tts_tpu.parallel.fleet import (
        FleetPaths, atomic_write, worker_loop)

    # first heartbeat BEFORE the (slow) model load: liveness means "process
    # up", not "model ready" — a large checkpoint can take longer than the
    # staleness window
    paths = FleetPaths(args.fleet_dir)
    atomic_write(paths.beat_file(args.worker_id), "0\n")
    synth = _Synth(args)
    die_after = None
    if args.worker_die_after:
        idx, k = args.worker_die_after.split(":")
        if int(idx) == args.worker_id:
            die_after = int(k)
    n = worker_loop(args.fleet_dir, args.worker_id, synth.process,
                    max_batch=args.max_batch, die_after=die_after)
    print(f"# worker {args.worker_id}: {n} utterances", file=sys.stderr)


def _coordinator_main(args):
    from echo_tts_tpu.parallel.fleet import coordinator_loop

    reqs = _load_requests(args)
    os.makedirs(args.outdir, exist_ok=True)
    fleet_dir = args.fleet_dir or os.path.join(args.outdir, "_fleet")
    os.makedirs(fleet_dir, exist_ok=True)

    # workers re-run this script with the same model/config flags
    passthrough = []
    for flag, val in (("--dit", args.dit), ("--ae", args.ae),
                      ("--pca", args.pca), ("--preset", args.preset),
                      ("--presets-file", args.presets_file),
                      ("--num-steps", args.num_steps),
                      ("--sequence-length", args.sequence_length)):
        if val:
            passthrough += [flag, str(val)]
    for flag, on in (("--ae-bf16", args.ae_bf16), ("--int8", args.int8),
                     ("--normalize-text", args.normalize_text),
                     ("--random-tiny", args.random_tiny),
                     ("--cpu", args.cpu)):
        if on:
            passthrough.append(flag)
    if args.worker_die_after:
        passthrough += ["--worker-die-after", args.worker_die_after]

    worker_ids = list(range(args.workers))
    logdir = os.path.join(fleet_dir, "logs")
    os.makedirs(logdir, exist_ok=True)
    t0 = time.time()
    procs = {}
    logs = []
    try:
        for w in worker_ids:
            logf = open(os.path.join(logdir, f"{w}.log"), "w")
            logs.append(logf)
            procs[w] = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--worker-id", str(w), "--fleet-dir", fleet_dir,
                 "--outdir", args.outdir,
                 "--max-batch", str(args.max_batch)] + passthrough,
                stdout=logf, stderr=subprocess.STDOUT)

        # lazy local fallback: only loads a model if every worker dies
        synth_box = {}

        def local_run(req):
            if "s" not in synth_box:
                print("# all workers dead; coordinator synthesizing locally",
                      file=sys.stderr)
                synth_box["s"] = _Synth(args)
            synth_box["s"].process([req])

        fleet = coordinator_loop(
            fleet_dir, reqs, worker_ids, procs=procs,
            stale_after_s=args.stale_after_s, local_run=local_run,
            deadline_s=3600.0)
        for p in procs.values():  # workers exit on the stop sentinel
            try:
                p.wait(timeout=60)
            except subprocess.TimeoutExpired:  # pragma: no cover
                p.terminate()
                p.wait(timeout=10)
    finally:
        # exception path: stop exact child PIDs only, never patterns
        for p in procs.values():
            if p.poll() is None:
                p.terminate()
        for f in logs:
            f.close()

    wall = time.time() - t0
    files = [os.path.join(args.outdir, r["id"] + ".wav") for r in reqs]
    total_audio = sum(_wav_seconds(p) for p in files if os.path.exists(p))
    print(json.dumps({
        "files": sum(os.path.exists(p) for p in files),
        "audio_s": round(total_audio, 3), "wall_s": round(wall, 3),
        "audio_s_per_s": round(total_audio / max(wall, 1e-9), 3),
        "workers": args.workers, "reassigned": len(fleet.reassigned),
        "dead_workers": sorted(set(w for w in worker_ids
                                   if procs[w].returncode not in (0, None))),
    }))
    return files


def main(argv=None):
    args = build_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.worker_id is not None:
        if not args.fleet_dir:
            raise SystemExit("--worker-id requires --fleet-dir")
        return _worker_main(args)
    if args.workers > 0:
        return _coordinator_main(args)

    reqs = _load_requests(args)
    os.makedirs(args.outdir, exist_ok=True)
    synth = _Synth(args)
    t0 = time.time()
    for lo in range(0, len(reqs), args.max_batch):
        chunk = reqs[lo:lo + args.max_batch]
        synth.process(chunk)
        print(f"# batch {lo // args.max_batch}: {len(chunk)} utterances",
              file=sys.stderr)
    wall = time.time() - t0
    print(json.dumps({
        "files": len(synth.written), "audio_s": round(synth.total_audio, 3),
        "wall_s": round(wall, 3),
        "audio_s_per_s": round(synth.total_audio / max(wall, 1e-9), 3),
        "speaker_encodes": synth.speaker_cache.misses,
        "speaker_cache_hits": synth.speaker_cache.hits,
    }))
    return synth.written


if __name__ == "__main__":
    main()
