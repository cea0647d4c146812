"""Gradio front-end (reference: gradio_app.py:637-1245), wrapping the same
Engine as the HTTP server. Gradio is optional — this image does not ship it —
so the module import-guards and the HTTP API (serve/server.py) is the
canonical surface.

Feature parity with the reference UI (skinnier CSS):
  * audio-prompt library table with search + click-to-load
    (gradio_app.py:600-636, 734-757)
  * LoRA checkpoint path + strength with status and error-revert
    (gradio_app.py:169-226, 763-790)
  * text-preset browser table, click inserts the prompt
    (gradio_app.py:434-470, 793-806)
  * sampler-preset dropdown + apply-to-fields + SAVE editor writing the
    reference sampler_presets.json schema (gradio_app.py:542-594)
  * quick-apply preset buttons for CFG / truncation / speaker-KV groups
    (gradio_app.py:483-539; plain buttons instead of the JS proxy links)
  * Simple/Advanced mode, custom shape buckets, force-speaker row toggle
    (gradio_app.py:475-481, 896-927, 1098-1105)
  * wav/mp3 format with WAV fallback, session temp-file GC
    (gradio_app.py:74-127, 1032-1037)
  * AE-reconstruction + original-audio audition accordions
    (gradio_app.py:390-403, 1042-1069)
  * streaming playback (blockwise + stateful vocoder) — beyond the
    reference, which always synthesizes the full utterance first.

The pure logic (preset application/save, stem/cleanup, bucket parsing,
prompt library) lives in module functions independent of gradio so it is
unit-testable without the package (tests/test_gradio_app.py)."""
from __future__ import annotations

import dataclasses
import json
import os
import secrets
import time
from pathlib import Path
from typing import Optional

import numpy as np

from echo_tts_tpu.core.config import SamplerConfig
from echo_tts_tpu.pipeline.audio_io import resample
from echo_tts_tpu.serve.engine import Engine
from echo_tts_tpu.serve.presets import (
    DEFAULT_SAMPLER_PRESETS,
    FORCE_SPEAKER_PRESETS,
    TRUNCATION_PRESETS,
    load_text_presets,
)

AUDIO_EXTS = {".wav", ".mp3", ".m4a", ".ogg", ".flac", ".webm", ".aac", ".opus"}

# field order shared by apply_sampler_preset_fields / save_sampler_preset
SAMPLER_FIELDS = (
    "num_steps", "cfg_scale_text", "cfg_scale_speaker", "cfg_min_t",
    "cfg_max_t", "truncation_factor", "rescale_k", "rescale_sigma",
    "speaker_kv_enable", "speaker_kv_scale", "speaker_kv_min_t",
    "speaker_kv_max_layers",
)


# ---------------------------------------------------------------------------
# Pure helpers (gradio-independent, unit-tested)
# ---------------------------------------------------------------------------


def make_stem(prefix: str, user_id: Optional[str] = None) -> str:
    """Unique output-file stem (reference: gradio_app.py:74-81)."""
    ts = int(time.time() * 1000)
    rand = secrets.token_hex(4)
    return (f"{prefix}__{user_id}__{ts}_{rand}" if user_id
            else f"{prefix}__{ts}_{rand}")


def cleanup_temp_audio(dir_: Path, user_id: Optional[str],
                       max_age_sec: int = 60 * 5) -> None:
    """Session temp-file GC (reference: gradio_app.py:83-101): drop files
    older than max_age globally, plus ALL previous files of this session."""
    dir_ = Path(dir_)
    if not dir_.exists():
        return
    now = time.time()
    for p in dir_.glob("*"):
        try:
            if p.is_file() and (now - p.stat().st_mtime) > max_age_sec:
                p.unlink(missing_ok=True)
        except OSError:
            pass
    if user_id:
        for p in dir_.glob(f"*__{user_id}__*"):
            try:
                if p.is_file():
                    p.unlink(missing_ok=True)
            except OSError:
                pass


def parse_buckets(s) -> Optional[tuple]:
    """'640, 2816, 6400' -> (640, 2816, 6400); blank/None -> None (no
    padding) — the reference's custom-shape fields (gradio_app.py:315-345,
    896-927)."""
    if s is None:
        return None
    s = str(s).strip()
    if not s:
        return None
    return tuple(sorted(int(float(x)) for x in s.split(",") if x.strip()))


def audio_prompt_files(folder, search_query: str = ""):
    """[[filename], ...] rows of the prompt library, filtered
    (reference: gradio_app.py:600-620)."""
    if not folder:
        return []
    folder = Path(folder)
    if not folder.exists():
        return []
    files = sorted((f.name for f in folder.iterdir()
                    if f.is_file() and f.suffix.lower() in AUDIO_EXTS),
                   key=str.lower)
    q = search_query.strip().lower()
    if q:
        files = [f for f in files if q in f.lower()]
    return [[f] for f in files]


def _to_num(v, default, is_int=False):
    try:
        f = float(v)
    except (TypeError, ValueError):
        return default
    return int(f) if is_int else f


def _to_bool(v) -> bool:
    if isinstance(v, str):
        return v.strip().lower() in ("1", "true", "yes", "on")
    return bool(v)


def apply_sampler_preset_fields(presets: dict, name: str) -> Optional[dict]:
    """Preset dict -> {field: value} for the 12 SAMPLER_FIELDS (reference:
    gradio_app.py:565-594 apply_sampler_preset, string-valued numbers
    coerced). None for 'Custom'/unknown names (UI leaves fields alone)."""
    if name == "Custom" or name not in presets:
        return None
    p = presets[name]
    return {
        "num_steps": _to_num(p.get("num_steps", "40"), 40, is_int=True),
        "cfg_scale_text": _to_num(p.get("cfg_scale_text", "3.0"), 3.0),
        "cfg_scale_speaker": _to_num(p.get("cfg_scale_speaker", "5.0"), 5.0),
        "cfg_min_t": _to_num(p.get("cfg_min_t", "0.5"), 0.5),
        "cfg_max_t": _to_num(p.get("cfg_max_t", "1.0"), 1.0),
        "truncation_factor": _to_num(p.get("truncation_factor", "0.8"), 0.8),
        "rescale_k": _to_num(p.get("rescale_k", "1.2"), 1.2),
        "rescale_sigma": _to_num(p.get("rescale_sigma", "3.0"), 3.0),
        "speaker_kv_enable": _to_bool(p.get("speaker_kv_enable", False)),
        "speaker_kv_scale": _to_num(p.get("speaker_kv_scale", "1.5"), 1.5),
        "speaker_kv_min_t": _to_num(p.get("speaker_kv_min_t", "0.9"), 0.9),
        "speaker_kv_max_layers": _to_num(
            p.get("speaker_kv_max_layers", "24"), 24, is_int=True),
    }


def save_sampler_preset(path: str, name: str, fields: dict) -> dict:
    """Sampler-preset editor (reference save path: gradio_app.py:542-562
    writes the JSON on first run; the editor extends it): store the current
    field values under `name` in the reference schema (stringified numbers)
    and return the updated preset dict."""
    name = (name or "").strip()
    if not name or name == "Custom":
        raise ValueError("preset name must be non-empty and not 'Custom'")
    presets = {}
    if os.path.exists(path):
        with open(path) as f:
            presets = json.load(f)
    entry = {}
    for k in SAMPLER_FIELDS:
        if k not in fields:
            continue
        v = fields[k]
        entry[k] = bool(v) if k == "speaker_kv_enable" else str(v)
    presets[name] = entry
    with open(path, "w") as f:
        json.dump(presets, f, indent=2)
    return presets


def prepare_speaker_audio(speaker, sample_rate: int):
    """Normalize a gradio Audio value ((sr, np) tuple or filepath) into the
    pipeline's (1, samples) float32 at the codec rate."""
    if speaker is None:
        return None
    if isinstance(speaker, (str, Path)):
        from echo_tts_tpu.pipeline.audio_io import load_audio

        return load_audio(str(speaker))
    sr, data = speaker
    data = np.asarray(data, np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    peak = np.abs(data).max(initial=0.0)
    if data.dtype.kind == "i" or peak > 1.5:
        data = data / 32768.0
    return resample(data[None], sr, sample_rate)


def build_sampler_config(base: SamplerConfig, fields: dict,
                         custom_latent_length=None) -> SamplerConfig:
    """Field values -> SamplerConfig (reference parse/clamp:
    gradio_app.py:281-307)."""
    over = {
        "num_steps": int(fields["num_steps"]),
        "cfg_scale_text": float(fields["cfg_scale_text"]),
        "cfg_scale_speaker": float(fields["cfg_scale_speaker"]),
        "cfg_min_t": float(fields["cfg_min_t"]),
        "cfg_max_t": float(fields["cfg_max_t"]),
        "truncation_factor": float(fields["truncation_factor"]),
        "rescale_k": float(fields["rescale_k"]),
        "rescale_sigma": float(fields["rescale_sigma"]),
    }
    if fields.get("speaker_kv_enable"):
        over.update({
            "speaker_kv_scale": float(fields["speaker_kv_scale"]),
            "speaker_kv_min_t": float(fields["speaker_kv_min_t"]),
            "speaker_kv_max_layers": int(fields["speaker_kv_max_layers"]),
        })
    else:
        over.update({"speaker_kv_scale": None, "speaker_kv_min_t": None,
                     "speaker_kv_max_layers": None})
    if custom_latent_length:
        over["sequence_length"] = int(custom_latent_length)
    return dataclasses.replace(base, **over)


# ---------------------------------------------------------------------------
# App builder
# ---------------------------------------------------------------------------


def build_app(engine: Engine, presets: Optional[dict] = None,
              presets_path: str = "sampler_presets.json",
              text_presets_path: str = "text_presets.txt",
              audio_prompt_folder: Optional[str] = None,
              temp_dir: Optional[str] = None):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "gradio is not installed; use echo_tts_tpu.serve.server for the "
            "HTTP API, or `pip install gradio` for the UI") from e

    # precedence: explicit argument > presets file > built-in defaults (an
    # explicit argument must never be silently shadowed by a file in cwd)
    if presets is not None:
        raw_presets = {k: (v.__dict__ if isinstance(v, SamplerConfig) else v)
                       for k, v in presets.items()}
    elif os.path.exists(presets_path):
        with open(presets_path) as f:
            raw_presets = json.load(f)
    else:
        raw_presets = dict(DEFAULT_SAMPLER_PRESETS)
    sr_out = engine.tts.ae_cfg.sample_rate
    tmp = Path(temp_dir or (Path.cwd() / "echo_outputs"))
    tmp.mkdir(parents=True, exist_ok=True)

    def _fields_from_args(num_steps, cfg_text, cfg_speaker, cfg_min_t,
                          cfg_max_t, trunc, rk, rs, force, kvs, kvmt, kvml):
        return dict(zip(SAMPLER_FIELDS,
                        (num_steps, cfg_text, cfg_speaker, cfg_min_t,
                         cfg_max_t, trunc, rk, rs, force, kvs, kvmt, kvml)))

    def generate(session_id, text, speaker, fmt, num_steps, cfg_text,
                 cfg_speaker, cfg_min_t, cfg_max_t, trunc, rk, rs, force,
                 kvs, kvmt, kvml, seed, text_buckets, speaker_buckets,
                 latent_length, use_custom_shapes, show_original, show_recon):
        session_id = session_id or secrets.token_hex(8)
        cleanup_temp_audio(tmp, session_id)
        fields = _fields_from_args(num_steps, cfg_text, cfg_speaker, cfg_min_t,
                                   cfg_max_t, trunc, rk, rs, force, kvs, kvmt,
                                   kvml)
        lat_buckets = parse_buckets(latent_length) if use_custom_shapes else None
        sc = build_sampler_config(
            SamplerConfig(), fields,
            lat_buckets[-1] if lat_buckets else None)  # single value; a list
        #   takes the largest (the field is a generation LENGTH, not buckets)
        audio_in = prepare_speaker_audio(speaker, sr_out)

        # custom shape buckets (reference: gradio_app.py:315-345, 896-927):
        # entered comma-lists replace the pipeline's pad buckets per request
        pipe_overrides = {}
        if use_custom_shapes:
            tb = parse_buckets(text_buckets)
            sb = parse_buckets(speaker_buckets)
            if tb:
                pipe_overrides["text_buckets"] = tb
            if sb:
                pipe_overrides["speaker_buckets"] = sb

        t0 = time.time()
        audio, normalized, _ = engine.generate(
            text, audio_in, seed=int(seed), sc=sc,
            pipe_overrides=pipe_overrides or None)
        elapsed = time.time() - t0

        # save with session hygiene; mp3 falls back to WAV
        # (reference: gradio_app.py:103-127, 376-408)
        stem = make_stem("echo", session_id)
        out_path = tmp / f"{stem}.wav"
        from echo_tts_tpu.pipeline.audio_io import write_wav

        if fmt == "mp3":
            from echo_tts_tpu.native.mp3_py import encode_mp3

            mp3_path = tmp / f"{stem}.mp3"
            if encode_mp3(str(mp3_path), audio[0], sr_out):
                out_path = mp3_path
            else:
                write_wav(str(out_path), audio[0], sr_out)
        else:
            write_wav(str(out_path), audio[0], sr_out)

        orig = (sr_out, audio_in[0]) if (show_original and audio_in is not None) else None
        recon = None
        if show_recon and audio_in is not None:
            r = engine.reconstruct(audio_in)
            recon = (sr_out, np.asarray(r)[0, 0])
        status = f"Generated in {elapsed:.1f}s — {normalized}"
        return (session_id, str(out_path), status,
                gr.update(value=orig, visible=orig is not None),
                gr.update(value=recon, visible=recon is not None))

    def generate_stream(text, speaker, num_steps, cfg_text, cfg_speaker,
                        cfg_min_t, cfg_max_t, trunc, rk, rs, force, kvs,
                        kvmt, kvml, seed):
        """Streaming playback: yields growing audio as latent blocks land
        (blockwise sampling + stateful vocoder). No reference analogue."""
        fields = _fields_from_args(num_steps, cfg_text, cfg_speaker, cfg_min_t,
                                   cfg_max_t, trunc, rk, rs, force, kvs, kvmt,
                                   kvml)
        sc = build_sampler_config(SamplerConfig(), fields)
        audio_in = prepare_speaker_audio(speaker, sr_out)
        for chunk in engine.generate_stream(text, audio_in, seed=int(seed),
                                            sc=sc, block_size=(64, 192)):
            pcm = np.clip(np.asarray(chunk)[0, 0] * 32767.0, -32768,
                          32767).astype(np.int16)
            yield sr_out, pcm

    def set_lora(path, strength):
        """LoRA hot-swap with error-revert (reference: gradio_app.py:169-226)."""
        path = (path or "").strip()
        try:
            engine.set_lora(path or None, float(strength))
            if path:
                return f"✅ Loaded LoRA: {Path(path).name} (strength: {float(strength):.2f})"
            return "ℹ️ Using base model (no LoRA)"
        except Exception as e:
            engine.set_lora(None)
            return f"❌ Error loading LoRA: {e}"

    def select_text_preset(evt: "gr.SelectData"):
        rows = load_text_presets(text_presets_path)
        idx = evt.index[0] if isinstance(evt.index, (tuple, list)) else evt.index
        if isinstance(idx, int) and 0 <= idx < len(rows):
            return gr.update(value=rows[idx][2])
        return gr.update()

    def select_audio_prompt(evt: "gr.SelectData"):
        if evt.value and audio_prompt_folder:
            p = Path(audio_prompt_folder) / str(evt.value)
            if p.exists():
                return gr.update(value=str(p))
        return gr.update()

    def apply_preset(name):
        vals = apply_sampler_preset_fields(raw_presets, name)
        if vals is None:
            return [gr.update()] * 13
        return ([gr.update(value=vals[k]) for k in SAMPLER_FIELDS]
                + [gr.update(visible=vals["speaker_kv_enable"])])

    def save_preset(name, *args):
        nonlocal raw_presets
        try:
            raw_presets = save_sampler_preset(
                presets_path, name, _fields_from_args(*args))
            return (gr.update(choices=["Custom"] + list(raw_presets),
                              value=name),
                    f"✅ Saved preset '{name}'")
        except (ValueError, OSError) as e:
            return gr.update(), f"❌ {e}"

    def apply_cfg_preset(name):
        p = FORCE_SPEAKER_PRESETS.get(name)
        if not p:
            return [gr.update()] * 2
        return [gr.update(value=p["cfg_scale_text"]),
                gr.update(value=p["cfg_scale_speaker"])]

    def apply_trunc_preset(name):
        p = TRUNCATION_PRESETS.get(name)
        if not p:
            return [gr.update()] * 3
        return [gr.update(value=p["truncation_factor"]),
                gr.update(value=p["rescale_k"]),
                gr.update(value=p["rescale_sigma"])]

    with gr.Blocks(title="Echo-TTS (TPU)") as demo:
        gr.Markdown("# Echo-TTS — TPU-native")
        gr.Markdown("**License Notice:** outputs are CC-BY-NC-SA-4.0 "
                    "(non-commercial). **Responsible Use:** do not impersonate "
                    "real people without consent or generate deceptive audio.")
        session = gr.State(None)

        gr.Markdown("## Speaker Reference")
        with gr.Row():
            if audio_prompt_folder and Path(audio_prompt_folder).exists():
                with gr.Column(scale=1, min_width=200):
                    gr.Markdown("#### Audio Library (click to load)")
                    prompt_search = gr.Textbox(
                        label="", placeholder="🔍 Search audio prompts...",
                        lines=1, max_lines=1)
                    prompt_table = gr.Dataframe(
                        value=audio_prompt_files(audio_prompt_folder),
                        headers=["Filename"], datatype=["str"],
                        interactive=False, label="")
            else:
                prompt_search = prompt_table = None
            with gr.Column(scale=2):
                speaker = gr.Audio(
                    sources=["upload", "microphone"], type="filepath",
                    label="Speaker reference (first 5 minutes used; blank "
                          "for none)")

        gr.Markdown("## LoRA Fine-Tuning (Optional)")
        with gr.Accordion("Load Custom LoRA Checkpoint", open=False):
            lora_path = gr.Textbox(label="LoRA Checkpoint Path",
                                   placeholder="checkpoints/lora_best.npz")
            lora_strength = gr.Slider(0.0, 3.0, value=1.0, step=0.05,
                                      label="LoRA Strength")
            lora_status = gr.Markdown("ℹ️ Using base model (no LoRA)")

        gr.Markdown("## Text Prompt")
        with gr.Accordion("Text Presets", open=True):
            text_table = gr.Dataframe(
                value=load_text_presets(text_presets_path),
                headers=["Category", "Words", "Preset Text"],
                datatype=["str", "str", "str"], interactive=False)
        text = gr.Textbox(label="Text Prompt", lines=4,
                          placeholder="[S1] Enter your text prompt here...")

        gr.Markdown("## Generation")
        mode = gr.Radio(["Simple Mode", "Advanced Mode"], value="Simple Mode",
                        label="")
        # initial field values come from the initially-selected preset —
        # gradio fires no change event for the initial dropdown value, so
        # hardcoded defaults would silently diverge from the displayed preset
        first_name = (list(raw_presets) or ["Custom"])[0]
        init = (apply_sampler_preset_fields(raw_presets, first_name)
                or apply_sampler_preset_fields({"_": {}}, "_"))
        with gr.Accordion("Generation Parameters", open=True):
            with gr.Row():
                preset_dd = gr.Dropdown(["Custom"] + list(raw_presets),
                                        value=first_name,
                                        label="Sampler Preset")
                steps = gr.Number(value=init["num_steps"], precision=0,
                                  minimum=5, maximum=80, label="Steps")
                seed = gr.Number(value=0, precision=0, label="RNG Seed")
            with gr.Row():
                preset_name = gr.Textbox(label="Save preset as", lines=1)
                preset_save_btn = gr.Button("Save preset")
                preset_save_status = gr.Markdown("")
            force = gr.Checkbox(label='"Force Speaker" (KV scaling)',
                                value=init["speaker_kv_enable"])
            with gr.Row(visible=init["speaker_kv_enable"]) as kv_row:
                kv_scale = gr.Number(value=init["speaker_kv_scale"],
                                     label="KV Scale", minimum=0)
                kv_min_t = gr.Number(value=init["speaker_kv_min_t"],
                                     label="KV Min t", minimum=0, maximum=1)
                kv_layers = gr.Number(value=init["speaker_kv_max_layers"],
                                      precision=0, minimum=0, maximum=24,
                                      label="Max Layers")
            with gr.Column(visible=False) as advanced:
                with gr.Row():
                    trunc = gr.Number(value=init["truncation_factor"],
                                      label="Truncation Factor", minimum=0)
                    rk = gr.Number(value=init["rescale_k"], label="Rescale k",
                                   minimum=0)
                    rs = gr.Number(value=init["rescale_sigma"],
                                   label="Rescale σ", minimum=0)
                    trunc_flat = gr.Button("flat", size="sm")
                    trunc_sharp = gr.Button("sharp", size="sm")
                    trunc_base = gr.Button("baseline(sharp)", size="sm")
                with gr.Row():
                    cfg_t = gr.Number(value=init["cfg_scale_text"],
                                      label="Text CFG", minimum=0)
                    cfg_s = gr.Number(value=init["cfg_scale_speaker"],
                                      label="Speaker CFG", minimum=0)
                    cfg_min = gr.Number(value=init["cfg_min_t"],
                                        label="CFG Min t", minimum=0,
                                        maximum=1)
                    cfg_max = gr.Number(value=init["cfg_max_t"],
                                        label="CFG Max t", minimum=0,
                                        maximum=1)
                    cfg_higher = gr.Button("higher speaker", size="sm")
                    cfg_large = gr.Button("large guidances", size="sm")
                use_shapes = gr.Checkbox(label="Use Custom Shapes (Advanced)")
                with gr.Row(visible=False) as shapes_row:
                    text_buckets = gr.Textbox(value="768",
                                              label="Max Text Byte Length")
                    spk_buckets = gr.Textbox(value="640, 2816, 6400",
                                             label="Max Speaker Latent Length")
                    lat_len = gr.Textbox(value="640",
                                         label="Sample Latent Length")

        with gr.Row():
            fmt = gr.Radio(["wav", "mp3"], value="wav", label="Format")
            btn = gr.Button("Generate Audio", variant="primary")
            stream_btn = gr.Button("Generate (Streaming)")
            show_orig = gr.Checkbox(label="Re-display Original Audio")
            show_recon = gr.Checkbox(label="Show Autoencoder Reconstruction "
                                           "(first 30s of reference)")

        with gr.Accordion("Generated Audio", open=True):
            status = gr.Markdown("")
            out_audio = gr.Audio(label="Generated Audio", type="filepath")
            stream_audio = gr.Audio(label="Streaming Output", streaming=True,
                                    autoplay=True)
            orig_audio = gr.Audio(label="Original Reference Audio (5 min)",
                                  visible=False)
            recon_audio = gr.Audio(label="Decoded Reference Audio (30s)",
                                   visible=False)

        # wiring
        sampler_inputs = [steps, cfg_t, cfg_s, cfg_min, cfg_max, trunc, rk,
                          rs, force, kv_scale, kv_min_t, kv_layers]
        if prompt_table is not None:
            prompt_table.select(select_audio_prompt, outputs=[speaker])
            prompt_search.change(
                lambda q: gr.update(value=audio_prompt_files(
                    audio_prompt_folder, q)),
                inputs=[prompt_search], outputs=[prompt_table])
        text_table.select(select_text_preset, outputs=[text])
        mode.change(lambda m: gr.update(visible=m == "Advanced Mode"),
                    inputs=[mode], outputs=[advanced])
        force.change(lambda f: gr.update(visible=bool(f)), inputs=[force],
                     outputs=[kv_row])
        use_shapes.change(lambda f: gr.update(visible=bool(f)),
                          inputs=[use_shapes], outputs=[shapes_row])
        preset_dd.change(apply_preset, inputs=[preset_dd],
                         outputs=sampler_inputs + [kv_row])
        preset_save_btn.click(save_preset, inputs=[preset_name] + sampler_inputs,
                              outputs=[preset_dd, preset_save_status])
        trunc_flat.click(lambda: apply_trunc_preset("flat"),
                         outputs=[trunc, rk, rs])
        trunc_sharp.click(lambda: apply_trunc_preset("sharp"),
                          outputs=[trunc, rk, rs])
        trunc_base.click(lambda: apply_trunc_preset("baseline"),
                         outputs=[trunc, rk, rs])
        cfg_higher.click(lambda: apply_cfg_preset("higher speaker"),
                         outputs=[cfg_t, cfg_s])
        cfg_large.click(lambda: apply_cfg_preset("large guidances"),
                        outputs=[cfg_t, cfg_s])
        lora_path.change(set_lora, inputs=[lora_path, lora_strength],
                         outputs=[lora_status])
        lora_strength.release(set_lora, inputs=[lora_path, lora_strength],
                              outputs=[lora_status])
        btn.click(generate,
                  inputs=[session, text, speaker, fmt] + sampler_inputs
                         + [seed, text_buckets, spk_buckets, lat_len,
                            use_shapes, show_orig, show_recon],
                  outputs=[session, out_audio, status, orig_audio,
                           recon_audio])
        stream_btn.click(generate_stream,
                         inputs=[text, speaker] + sampler_inputs + [seed],
                         outputs=[stream_audio])
    return demo
