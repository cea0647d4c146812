"""Serving engine: model singletons, LoRA hot-swap, shape-bucket discipline,
request serialization and utterance-level retry.

Replaces the reference's Gradio-global mutable state (reference:
gradio_app.py:60-69,169-226,258) with a locked engine object:
  * single-writer discipline — one lock around device work (the reference
    mutates globals per-request without locks, a latent race under concurrent
    sessions; SURVEY.md §5.2),
  * LoRA swap is functional: effective params are a merged COPY, the base is
    immutable (no torch-module surgery to undo — gradio_app.py:169-226),
  * utterance-level retry: sampling is stateless per request, so recovery
    from a transient device failure is resubmission (SURVEY.md §5.3).
"""
from __future__ import annotations

import logging
import threading
import time
from typing import Optional

import numpy as np

from echo_tts_tpu.core.config import SamplerConfig
from echo_tts_tpu.pipeline.pipeline import EchoTTS, sample_pipeline
from echo_tts_tpu.train.lora import load_lora_checkpoint, merge_lora

log = logging.getLogger("echo_tts_tpu.serve")


class Engine:
    def __init__(self, tts: EchoTTS, max_retries: int = 1, int8: bool = False,
                 int8_encoders: bool = False):
        """int8: opt-in W8A8 trunk quantization (models/quant.py) — applied
        to the effective params after any LoRA merge; the bf16 base stays
        resident for future merges. ~1.34x serving throughput (BASELINE.md)
        at a measured small quality cost (scripts/quant_snr.py).
        int8_encoders additionally quantizes encoder/KV-projection GEMMs
        (noise frozen into the per-utterance KV caches; check
        quant_snr.py --encoders)."""
        import dataclasses

        self._base_params = tts.dit_params
        self.int8 = int8 or int8_encoders
        self.int8_encoders = int8_encoders
        # own copy of the container: quantization / LoRA swaps must never
        # leak into the caller's EchoTTS (another Engine or a training path
        # may hold the same instance)
        self.tts = dataclasses.replace(
            tts, dit_params=self._effective(self._base_params))
        self.max_retries = max_retries
        self._lock = threading.Lock()
        self._current_lora_path: Optional[str] = None
        self.stats = {"requests": 0, "failures": 0, "retries": 0,
                      "total_sample_s": 0.0, "total_audio_s": 0.0}

    def _effective(self, params):
        if not self.int8:
            return params
        import jax

        from echo_tts_tpu.models.quant import quantize_dit_params

        return jax.jit(lambda p: quantize_dit_params(
            p, encoders=self.int8_encoders))(params)

    # -- LoRA hot-swap (reference: gradio_app.py:169-226) -------------------
    def set_lora(self, lora_path: Optional[str], strength: float = 1.0) -> None:
        with self._lock:
            if lora_path == self._current_lora_path:
                return
            if lora_path is None:
                self.tts.dit_params = self._effective(self._base_params)
            else:
                lora, lc = load_lora_checkpoint(lora_path)
                if strength != 1.0:
                    import dataclasses

                    lc = dataclasses.replace(lc, alpha=lc.alpha * strength)
                self.tts.dit_params = self._effective(
                    merge_lora(self._base_params, lora, lc))
            self._current_lora_path = lora_path

    # -- generation ---------------------------------------------------------
    def generate(
        self,
        text: str,
        speaker_audio: Optional[np.ndarray],
        seed: int = 0,
        sc: Optional[SamplerConfig] = None,
        normalize_text: bool = True,
    ):
        """Returns (audio (1, 1, T) float32, normalized_text, timings)."""
        sc = sc or SamplerConfig()
        last_err = None
        for attempt in range(self.max_retries + 1):
            try:
                with self._lock:
                    t0 = time.perf_counter()
                    audio, normalized, timings = sample_pipeline(
                        self.tts, text, speaker_audio, seed, sc=sc,
                        normalize_text=normalize_text)
                    wall = time.perf_counter() - t0
                    # stats under the same lock: handler threads share the
                    # dict and bare += is a read-modify-write race
                    self.stats["requests"] += 1
                    self.stats["total_sample_s"] += wall
                    self.stats["total_audio_s"] += (
                        audio.shape[-1] / self.tts.ae_cfg.sample_rate)
                timings["total"] = wall
                return audio, normalized, timings
            except Exception as e:  # pragma: no cover - device-failure path
                last_err = e
                self.stats["retries"] += 1
                log.warning("generate attempt %d failed: %s", attempt, e)
        self.stats["failures"] += 1
        raise RuntimeError(f"generation failed after {self.max_retries + 1} attempts") from last_err

    def generate_stream(
        self,
        text: str,
        speaker_audio: Optional[np.ndarray],
        seed: int = 0,
        sc: Optional[SamplerConfig] = None,
        block_size=160,  # int, or a schedule like (64, 192) — small first
        #   block cuts time-to-first-audio (pipeline._block_schedule)
        normalize_text: bool = True,
        continuation_audio: Optional[np.ndarray] = None,
    ):
        """Yields fp32 waveform chunks (1, 1, n) as latent blocks complete
        (pipeline.sample_pipeline_stream). Holds the device lock for the
        whole stream — one streaming request at a time, matching the
        single-writer discipline above. `continuation_audio` seeds the
        blockwise prefix (its transcript must be part of `text`)."""
        from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream

        sc = sc or SamplerConfig()
        with self._lock:
            t0 = time.perf_counter()
            n_samples = 0
            done = False
            try:
                for chunk in sample_pipeline_stream(
                        self.tts, text, speaker_audio, seed, sc=sc,
                        block_size=block_size, normalize_text=normalize_text,
                        continuation_audio=continuation_audio):
                    n_samples += chunk.shape[-1]
                    yield chunk
                done = True
            finally:
                # count the request even when the client disconnects
                # mid-stream (GeneratorExit) or the device errors out
                self.stats["requests"] += 1
                if not done:
                    self.stats["failures"] += 1
                self.stats["total_sample_s"] += time.perf_counter() - t0
                self.stats["total_audio_s"] += n_samples / self.tts.ae_cfg.sample_rate

    def warmup(self, sc: Optional[SamplerConfig] = None,
               include_speaker_buckets: bool = True) -> float:
        """Pre-compile the serving executables for every shape bucket so no
        user request pays a cold compile (the reference compiles lazily on
        the first generation per bucket: gradio_app.py:263-274,315-345).

        Runs one real (tiny-text) generation per bucket combination: the
        no-speaker shape plus, when `include_speaker_buckets`, one synthetic
        speaker prompt sized to land in each speaker bucket (this also warms
        the chunked AE-encode executable). Uses the given SamplerConfig —
        executables are specialized on it, so warm up with the preset you
        will serve. Returns total warmup seconds."""
        sc = sc or SamplerConfig()
        pc = self.tts.pipe_cfg
        sr = self.tts.ae_cfg.sample_rate
        spl = self.tts.ae_cfg.frame_length
        t0 = time.perf_counter()
        prompts = [None]
        if include_speaker_buckets:
            rng = np.random.default_rng(0)
            for b in pc.speaker_buckets:
                n = min(b, pc.max_speaker_latent_length) * spl
                prompts.append(0.1 * rng.standard_normal((1, n)).astype(np.float32))
        for audio in prompts:
            with self._lock:
                sample_pipeline(self.tts, "Warmup.", audio, 0, sc=sc,
                                normalize_text=True)
        wall = time.perf_counter() - t0
        log.info("warmup: %d bucket combos in %.1fs", len(prompts), wall)
        return wall

    def reconstruct(self, audio: np.ndarray) -> np.ndarray:
        """AE round-trip audition of the first 30 s (reference:
        gradio_app.py:390-403). Device work under the engine lock (same
        single-writer discipline as generation), padded to the fixed 30-s
        chunk so one executable serves every request length (the encoder is
        causal, so cropping the padded output is exact)."""
        import jax.numpy as jnp

        from echo_tts_tpu.pipeline.speaker import ae_reconstruct

        sr = self.tts.ae_cfg.sample_rate
        spl = self.tts.ae_cfg.frame_length
        chunk = self.tts.pipe_cfg.audio_chunk_latents * spl  # 30 s
        audio = np.asarray(audio, np.float32)[:, :chunk]
        n = audio.shape[-1]
        n_frames = -(-n // spl)
        padded = np.pad(audio, ((0, 0), (0, chunk - n)))
        with self._lock:
            rec = np.asarray(ae_reconstruct(
                self.tts.ae_params, self.tts.ae_cfg, self.tts.pca,
                jnp.asarray(padded)[:, None, :]), np.float32)
        return rec[:, :, : n_frames * spl]

    def health(self) -> dict:
        return {"status": "ok", "lora": self._current_lora_path, **self.stats}
