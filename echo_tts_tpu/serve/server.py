"""Dependency-free HTTP TTS server (stdlib only).

The reference serves through Gradio (reference: gradio_app.py); Gradio is not
in this image, so the primary serving surface is a small JSON/WAV HTTP API on
`http.server` with the same capabilities: sampler presets, force-speaker
controls, LoRA hot-swap, seeded generation, AE-reconstruction audition. A
Gradio front-end (serve/gradio_app.py) wraps the same Engine when gradio is
installed.

Endpoints:
  GET  /health                         -> engine stats
  GET  /presets                        -> sampler preset dict
  GET  /text_presets                   -> [[category, word_count, text], ...]
       rows from text_presets.txt (reference table: gradio_app.py:434-454)
  POST /lora   {"path": ..., "strength": ...}  (null path reverts to base)
  POST /reconstruct {"wav_b64": ... or "path": ...} -> audio/wav AE round-trip
       of the first 30 s (audition; reference gradio_app.py:390-403)
  POST /tts    {"text": ..., "preset": or sampler fields, "seed": int,
                "speaker_wav_b64": base64 WAV or MP3 bytes (optional),
                "speaker_path": server-side path (optional),
                "format": "wav" (default) or "mp3"}
       -> audio/wav bytes (reference wav-save path: gradio_app.py:376-408);
       "mp3" encodes via libmp3lame and falls back to WAV when the library
       is missing (reference mp3 path: gradio_app.py:111-127)
  POST /tts_stream  same body as /tts, plus "block_size" (default [64, 192]
       — the measured TTFA/throughput sweet spot; an int, or a list whose
       last entry repeats — a small first block cuts time-to-first-audio)
       and optional "continuation_wav_b64"/"continuation_path"
       (seed audio to continue from; its transcript must be included in
       "text", reference inference_blockwise.py:189-190)
       -> chunked audio/L16 (raw mono PCM16, X-Sample-Rate header): one chunk
       per sampled latent block as it is decoded (blockwise sampling + causal
       streamed S1-DAC decode; stops early at the end-of-speech flattening
       point). Requires a checkpoint with the blockwise modules.
"""
from __future__ import annotations

import base64
import json
import logging
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

from echo_tts_tpu.core.config import SamplerConfig
from echo_tts_tpu.pipeline.audio_io import load_audio, write_wav
from echo_tts_tpu.serve.engine import Engine
from echo_tts_tpu.serve.presets import DEFAULT_SAMPLER_PRESETS


def _load_request_audio(req: dict, b64_key: str, path_key: str):
    """Load audio supplied either as base64 bytes (WAV or MP3, sniffed from
    the magic bytes) or a server-side path; None when neither key is
    present."""
    if req.get(b64_key):
        raw = base64.b64decode(req[b64_key])
        suffix = ".wav" if raw[:4] == b"RIFF" else ".mp3"
        with tempfile.NamedTemporaryFile(suffix=suffix) as f:
            f.write(raw)
            f.flush()
            return load_audio(f.name)
    if req.get(path_key):
        return load_audio(req[path_key])
    return None


def _wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    import os

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    try:
        write_wav(path, audio, sr)
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def _mp3_bytes(audio: np.ndarray, sr: int, bitrate_kbps: int = 192):
    """MP3-encode via libmp3lame; None when unavailable (callers fall back
    to WAV, mirroring reference gradio_app.py:111-127)."""
    import os

    from echo_tts_tpu.native.mp3_py import encode_mp3

    with tempfile.NamedTemporaryFile(suffix=".mp3", delete=False) as f:
        path = f.name
    try:
        if not encode_mp3(path, audio, sr, bitrate_kbps):
            return None
        with open(path, "rb") as f:
            return f.read()
    except Exception:
        return None
    finally:
        os.unlink(path)


def make_handler(engine: Engine, presets: Dict[str, SamplerConfig],
                 text_presets_path: str = "text_presets.txt"):
    class Handler(BaseHTTPRequestHandler):
        # chunked transfer (used by /tts_stream) is HTTP/1.1-only; 1.0
        # clients would read the chunk framing as PCM bytes. All other
        # responses carry Content-Length, so keep-alive is safe.
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, engine.health())
            elif self.path == "/presets":
                self._json(200, {k: v.__dict__ if isinstance(v, SamplerConfig)
                                 else v for k, v in presets.items()})
            elif self.path == "/text_presets":
                from echo_tts_tpu.serve.presets import load_text_presets

                self._json(200, load_text_presets(text_presets_path))
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return self._json(400, {"error": "bad json"})

            if self.path == "/lora":
                try:
                    engine.set_lora(req.get("path"), float(req.get("strength", 1.0)))
                    return self._json(200, {"ok": True})
                except Exception as e:
                    return self._json(400, {"error": str(e)})

            if self.path == "/reconstruct":
                # AE round-trip audition (reference: gradio_app.py:390-403);
                # device work serialized inside engine.reconstruct
                try:
                    audio = _load_request_audio(req, "wav_b64", "path")
                    if audio is None:
                        return self._json(400, {"error": "wav_b64 or path required"})
                    rec = engine.reconstruct(audio)
                    wav = _wav_bytes(rec[0], engine.tts.ae_cfg.sample_rate)
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Content-Length", str(len(wav)))
                    self.end_headers()
                    self.wfile.write(wav)
                except Exception as e:
                    self._json(500, {"error": str(e)})
                return

            if self.path not in ("/tts", "/tts_stream"):
                return self._json(404, {"error": "not found"})

            try:
                text = req["text"]
                seed = int(req.get("seed", 0))
                if "preset" in req:
                    sc = presets[req["preset"]]
                    if not isinstance(sc, SamplerConfig):
                        sc = SamplerConfig.from_preset(sc)
                else:
                    fields = {k: v for k, v in req.items()
                              if k in SamplerConfig.__dataclass_fields__}
                    sc = SamplerConfig.from_preset(fields) if fields else SamplerConfig()

                speaker = _load_request_audio(req, "speaker_wav_b64",
                                              "speaker_path")

                if self.path == "/tts_stream":
                    # chunked raw PCM16: length unknown up front (early stop
                    # at the flattening point), so WAV headers don't fit.
                    # Pull the FIRST chunk before committing the 200 — setup
                    # errors (no blockwise modules, bad block_size) still get
                    # a clean JSON error; after headers the only safe failure
                    # mode is closing the connection (a second status line
                    # would corrupt the stream).
                    continuation = _load_request_audio(
                        req, "continuation_wav_b64", "continuation_path")
                    bs = req.get("block_size", [64, 192])
                    bs = [int(x) for x in bs] if isinstance(bs, list) else int(bs)
                    gen = engine.generate_stream(
                        text, speaker, seed=seed, sc=sc,
                        block_size=bs,
                        normalize_text=bool(req.get("normalize_text", True)),
                        continuation_audio=continuation)
                    try:
                        first = next(gen)
                    except StopIteration:
                        first = None
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/L16")
                    self.send_header("X-Sample-Rate",
                                     str(engine.tts.ae_cfg.sample_rate))
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()

                    def emit(chunk):
                        pcm = np.clip(chunk[0, 0] * 32767.0, -32768, 32767
                                      ).astype("<i2").tobytes()
                        if pcm:
                            self.wfile.write(f"{len(pcm):X}\r\n".encode())
                            self.wfile.write(pcm)
                            self.wfile.write(b"\r\n")

                    try:
                        if first is not None:
                            emit(first)
                        for chunk in gen:
                            emit(chunk)
                        self.wfile.write(b"0\r\n\r\n")
                    except Exception as e:  # mid-stream: abort, don't 500
                        self.close_connection = True
                        logging.getLogger("echo_tts_tpu.serve").warning(
                            "tts_stream aborted mid-stream: %s", e)
                    return

                audio, normalized, timings = engine.generate(
                    text, speaker, seed=seed, sc=sc,
                    normalize_text=bool(req.get("normalize_text", True)))
                sr = engine.tts.ae_cfg.sample_rate
                ctype = "audio/wav"
                if req.get("format") == "mp3":
                    # mp3-save with WAV fallback (reference:
                    # gradio_app.py:111-127)
                    body = _mp3_bytes(audio[0], sr)
                    if body is not None:
                        ctype = "audio/mpeg"
                    else:
                        body = _wav_bytes(audio[0], sr)
                else:
                    body = _wav_bytes(audio[0], sr)
                wav = body
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(wav)))
                self.send_header("X-Normalized-Text",
                                 base64.b64encode(normalized.encode()).decode())
                self.send_header("X-Timings", json.dumps(
                    {k: round(v, 4) for k, v in timings.items()}))
                self.end_headers()
                self.wfile.write(wav)
            except Exception as e:
                self._json(500, {"error": str(e)})

    return Handler


def serve(engine: Engine, host: str = "127.0.0.1", port: int = 7860,
          presets: Optional[Dict[str, SamplerConfig]] = None,
          background: bool = False,
          text_presets_path: str = "text_presets.txt") -> ThreadingHTTPServer:
    presets = presets or {k: SamplerConfig.from_preset(v)
                          for k, v in DEFAULT_SAMPLER_PRESETS.items()}
    httpd = ThreadingHTTPServer(
        (host, port), make_handler(engine, presets, text_presets_path))
    if background:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        return httpd
    httpd.serve_forever()
    return httpd
