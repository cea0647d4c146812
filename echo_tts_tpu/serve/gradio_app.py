"""Gradio front-end (reference: gradio_app.py:637-1245), wrapping the same
Engine as the HTTP server. Gradio is optional — this image does not ship it —
so the module import-guards and the HTTP API (serve/server.py) is the
canonical surface.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

from echo_tts_tpu.core.config import SamplerConfig
from echo_tts_tpu.pipeline.audio_io import resample
from echo_tts_tpu.pipeline.speaker import ae_reconstruct
from echo_tts_tpu.serve.engine import Engine
from echo_tts_tpu.serve.presets import (
    DEFAULT_SAMPLER_PRESETS,
    TRUNCATION_PRESETS,
)


def build_app(engine: Engine, presets: Optional[dict] = None):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "gradio is not installed; use echo_tts_tpu.serve.server for the "
            "HTTP API, or `pip install gradio` for the UI") from e

    presets = presets or {k: SamplerConfig.from_preset(v)
                          for k, v in DEFAULT_SAMPLER_PRESETS.items()}
    preset_names = list(presets)

    def generate(text, speaker_file, preset_name, num_steps, cfg_text,
                 cfg_speaker, truncation_preset, force_speaker, kv_scale,
                 kv_min_t, kv_max_layers, seed, show_reconstruction):
        sc = presets[preset_name]
        overrides = {"num_steps": int(num_steps), "cfg_scale_text": float(cfg_text),
                     "cfg_scale_speaker": float(cfg_speaker)}
        overrides.update(TRUNCATION_PRESETS.get(truncation_preset, {}))
        if force_speaker:  # reference: gradio_app.py:281-307
            overrides.update({"speaker_kv_scale": float(kv_scale),
                              "speaker_kv_min_t": float(kv_min_t),
                              "speaker_kv_max_layers": int(kv_max_layers)})
        sc = dataclasses.replace(sc, **overrides)

        speaker = None
        if speaker_file is not None:
            sr, data = speaker_file
            data = np.asarray(data, np.float32)
            if data.ndim == 2:
                data = data.mean(axis=1)
            peak = np.abs(data).max(initial=0.0)
            if data.dtype.kind == "i" or peak > 1.5:
                data = data / 32768.0
            speaker = resample(data[None], sr, engine.tts.ae_cfg.sample_rate)

        t0 = time.time()
        audio, normalized, _ = engine.generate(text, speaker, seed=int(seed), sc=sc)
        elapsed = time.time() - t0

        sr = engine.tts.ae_cfg.sample_rate
        out = (sr, np.asarray(audio[0, 0]))
        recon = None
        if show_reconstruction and speaker is not None:
            import jax.numpy as jnp

            r = ae_reconstruct(engine.tts.ae_params, engine.tts.ae_cfg,
                               engine.tts.pca, jnp.asarray(speaker[None]))
            recon = (sr, np.asarray(r)[0, 0])
        return out, recon, f"{elapsed:.1f}s — {normalized}"

    with gr.Blocks(title="Echo-TTS (TPU)") as demo:
        gr.Markdown("# Echo-TTS — TPU-native")
        with gr.Row():
            with gr.Column():
                text = gr.Textbox(label="Text", lines=4)
                speaker = gr.Audio(label="Speaker reference (optional)")
                preset = gr.Dropdown(preset_names, value=preset_names[0],
                                     label="Sampler preset")
                with gr.Accordion("Sampler", open=False):
                    steps = gr.Slider(4, 100, value=40, step=1, label="Steps")
                    cfg_t = gr.Slider(0, 12, value=3.0, label="Text CFG")
                    cfg_s = gr.Slider(0, 12, value=8.0, label="Speaker CFG")
                    trunc = gr.Dropdown(list(TRUNCATION_PRESETS), value="flat",
                                        label="Truncation preset")
                with gr.Accordion("Force speaker", open=False):
                    force = gr.Checkbox(label="Enable")
                    kv_scale = gr.Slider(1.0, 2.0, value=1.5, label="KV scale")
                    kv_min_t = gr.Slider(0.0, 1.0, value=0.5, label="KV min t")
                    kv_layers = gr.Slider(1, 24, value=24, step=1, label="Max layers")
                seed = gr.Number(value=0, label="Seed")
                recon = gr.Checkbox(label="Show AE reconstruction")
                btn = gr.Button("Generate", variant="primary")
            with gr.Column():
                out_audio = gr.Audio(label="Output")
                recon_audio = gr.Audio(label="AE reconstruction")
                status = gr.Textbox(label="Status")
        btn.click(generate,
                  [text, speaker, preset, steps, cfg_t, cfg_s, trunc, force,
                   kv_scale, kv_min_t, kv_layers, seed, recon],
                  [out_audio, recon_audio, status])
    return demo
