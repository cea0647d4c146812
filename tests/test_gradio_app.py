"""Gradio UI parity tests (reference: gradio_app.py:434-594, 703-1245).

gradio is not installed in this image, so the pure logic (preset
application/save, session temp-file GC, bucket parsing, prompt library) is
tested directly, and the Blocks wiring is exercised with a stubbed `gradio`
module that records component/callback registrations — the recorded
`generate` callback then runs a REAL tiny-model generation end-to-end."""
import json
import os
import sys
import time
import types

import numpy as np
import pytest

from echo_tts_tpu.serve import gradio_app as ga
from echo_tts_tpu.serve.engine import Engine

from test_pipeline_parity import tiny_tts  # fixture reuse  # noqa: F401


# ---------------------------------------------------------------------------
# Pure helpers
# ---------------------------------------------------------------------------


def test_make_stem_and_cleanup(tmp_path):
    """reference: gradio_app.py:74-101 — unique stems; GC removes aged files
    globally and ALL files of the given session."""
    s1 = ga.make_stem("echo", "userA")
    s2 = ga.make_stem("echo", "userA")
    assert s1 != s2 and s1.startswith("echo__userA__")
    assert "__" not in ga.make_stem("echo").replace("echo__", "", 1)

    old = tmp_path / "echo__other__1_aa.wav"
    mine = tmp_path / f"{s1}.wav"
    fresh = tmp_path / "echo__other__2_bb.wav"
    for p in (old, mine, fresh):
        p.write_bytes(b"x")
    os.utime(old, (time.time() - 1000, time.time() - 1000))
    ga.cleanup_temp_audio(tmp_path, "userA", max_age_sec=300)
    assert not old.exists()      # aged out globally
    assert not mine.exists()     # session files always removed
    assert fresh.exists()        # other session, fresh -> kept


def test_parse_buckets():
    assert ga.parse_buckets("640, 2816, 6400") == (640, 2816, 6400)
    assert ga.parse_buckets("768") == (768,)
    assert ga.parse_buckets("") is None and ga.parse_buckets(None) is None
    assert ga.parse_buckets("6400, 640") == (640, 6400)  # sorted


def test_audio_prompt_files(tmp_path):
    """reference: gradio_app.py:600-620 — extension filter, case-insensitive
    sort, substring search."""
    for name in ("B.wav", "a.mp3", "notes.txt", "c.FLAC"):
        (tmp_path / name).write_bytes(b"x")
    rows = ga.audio_prompt_files(tmp_path)
    assert rows == [["a.mp3"], ["B.wav"], ["c.FLAC"]]
    assert ga.audio_prompt_files(tmp_path, "wav") == [["B.wav"]]
    assert ga.audio_prompt_files(None) == []
    assert ga.audio_prompt_files(tmp_path / "missing") == []


def test_apply_sampler_preset_fields():
    """reference: gradio_app.py:565-594 — string-valued numbers coerced,
    Custom/unknown left alone, speaker-KV enable flag parsed."""
    presets = {"P": {"num_steps": "20", "cfg_scale_speaker": "7.5",
                     "speaker_kv_enable": "true",
                     "speaker_kv_max_layers": "12"}}
    v = ga.apply_sampler_preset_fields(presets, "P")
    assert v["num_steps"] == 20 and isinstance(v["num_steps"], int)
    assert v["cfg_scale_speaker"] == 7.5
    assert v["speaker_kv_enable"] is True
    assert v["speaker_kv_max_layers"] == 12
    assert v["cfg_scale_text"] == 3.0  # reference default
    assert ga.apply_sampler_preset_fields(presets, "Custom") is None
    assert ga.apply_sampler_preset_fields(presets, "nope") is None


def test_save_sampler_preset_roundtrip(tmp_path):
    """The preset editor writes the reference JSON schema (stringified
    numbers) and the saved entry round-trips through the apply path."""
    path = str(tmp_path / "sampler_presets.json")
    fields = dict(zip(ga.SAMPLER_FIELDS,
                      (30, 4.0, 6.0, 0.4, 0.9, 0.85, 1.1, 2.5,
                       True, 1.4, 0.8, 20)))
    out = ga.save_sampler_preset(path, "My Preset", fields)
    assert "My Preset" in out
    raw = json.load(open(path))
    assert raw["My Preset"]["num_steps"] == "30"      # stringified (schema)
    assert raw["My Preset"]["speaker_kv_enable"] is True
    back = ga.apply_sampler_preset_fields(raw, "My Preset")
    assert back["num_steps"] == 30 and back["cfg_scale_speaker"] == 6.0
    assert back["speaker_kv_enable"] is True and back["speaker_kv_min_t"] == 0.8

    # second save extends, not overwrites
    ga.save_sampler_preset(path, "Another", fields)
    assert set(json.load(open(path))) == {"My Preset", "Another"}
    with pytest.raises(ValueError):
        ga.save_sampler_preset(path, "Custom", fields)
    with pytest.raises(ValueError):
        ga.save_sampler_preset(path, "  ", fields)


def test_build_sampler_config():
    fields = dict(zip(ga.SAMPLER_FIELDS,
                      (12, 2.0, 4.0, 0.3, 0.9, 0.7, 1.3, 2.0,
                       False, 1.5, 0.9, 24)))
    from echo_tts_tpu.core.config import SamplerConfig

    sc = ga.build_sampler_config(SamplerConfig(), fields,
                                 custom_latent_length=16)
    assert sc.num_steps == 12 and sc.sequence_length == 16
    assert sc.speaker_kv_scale is None  # force off -> cleared
    fields["speaker_kv_enable"] = True
    sc = ga.build_sampler_config(SamplerConfig(), fields)
    assert sc.speaker_kv_scale == 1.5 and sc.speaker_kv_max_layers == 24
    assert sc.sequence_length == SamplerConfig().sequence_length


def test_prepare_speaker_audio_tuple():
    sr_in, sr_out = 22050, 44100
    stereo_int = (np.ones((sr_in, 2)) * 16384).astype(np.int16)
    out = ga.prepare_speaker_audio((sr_in, stereo_int), sr_out)
    assert out.shape[0] == 1
    assert abs(out.shape[-1] - sr_out) <= 4  # resampled to ~1 s
    assert np.abs(out).max() <= 1.01         # int PCM normalized
    assert ga.prepare_speaker_audio(None, sr_out) is None


# ---------------------------------------------------------------------------
# Blocks wiring with a stubbed gradio
# ---------------------------------------------------------------------------


class _Component:
    def __init__(self, registry, kind, *a, **k):
        self._registry = registry
        self.kind = kind
        self.args = a
        self.kwargs = k

    def _reg(self, event, fn, inputs=None, outputs=None):
        self._registry.append((event, fn, inputs, outputs))
        return self

    def click(self, fn, inputs=None, outputs=None):
        return self._reg("click", fn, inputs, outputs)

    def change(self, fn, inputs=None, outputs=None):
        return self._reg("change", fn, inputs, outputs)

    def select(self, fn, inputs=None, outputs=None):
        return self._reg("select", fn, inputs, outputs)

    def release(self, fn, inputs=None, outputs=None):
        return self._reg("release", fn, inputs, outputs)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _fake_gradio(registry):
    mod = types.ModuleType("gradio")

    def make(kind):
        return lambda *a, **k: _Component(registry, kind, *a, **k)

    for kind in ("Blocks", "Markdown", "State", "Row", "Column", "Accordion",
                 "Textbox", "Dataframe", "Audio", "Slider", "Number",
                 "Checkbox", "Radio", "Button", "Dropdown", "Group", "HTML"):
        setattr(mod, kind, make(kind))

    class SelectData:
        def __init__(self, index=0, value=None):
            self.index = index
            self.value = value

    mod.SelectData = SelectData
    mod.update = lambda **k: dict(k)
    return mod


@pytest.fixture()
def stub_gradio(monkeypatch):
    registry = []
    monkeypatch.setitem(sys.modules, "gradio", _fake_gradio(registry))
    return registry


def test_build_app_wiring_and_real_generation(tiny_tts, stub_gradio,  # noqa: F811
                                              tmp_path):
    _, _, tts = tiny_tts
    eng = Engine(tts)
    presets_path = str(tmp_path / "sampler_presets.json")
    text_path = tmp_path / "text_presets.txt"
    text_path.write_text("Reading | [S1] One two.\n")
    prompt_dir = tmp_path / "prompts"
    prompt_dir.mkdir()

    demo = ga.build_app(eng, presets_path=presets_path,
                        text_presets_path=str(text_path),
                        audio_prompt_folder=str(prompt_dir),
                        temp_dir=str(tmp_path / "out"))
    assert demo is not None

    by_fn = {}
    for event, fn, inputs, outputs in stub_gradio:
        by_fn.setdefault(getattr(fn, "__name__", "lambda"), []).append(
            (event, fn, inputs, outputs))
    # every reference UI surface is wired
    for name in ("generate", "generate_stream", "set_lora",
                 "select_text_preset", "apply_preset", "save_preset"):
        assert name in by_fn, f"{name} not wired: {sorted(by_fn)}"
    # mode / force / custom-shape toggles + preset quick-applies (lambdas)
    assert len(by_fn.get("<lambda>", [])) >= 8
    # the generate click wires 4+12+7 inputs and 5 outputs
    _, gen_fn, gen_inputs, gen_outputs = by_fn["generate"][0]
    assert len(gen_inputs) == 23 and len(gen_outputs) == 5

    # drive the recorded callback with REAL values through the tiny engine
    out = gen_fn(None, "Wiring test.", None, "wav",
                 2, 3.0, 5.0, 0.5, 1.0, 0.8, 1.2, 3.0,   # sampler numbers
                 False, 1.5, 0.9, 24,                     # force-speaker off
                 1, "64", "", "16", True, False, False)
    session_id, out_path, status, orig_upd, recon_upd = out
    assert session_id and os.path.exists(out_path)
    assert "Generated in" in status and "[S1]" in status
    assert orig_upd == {"value": None, "visible": False}

    # LoRA status callback: base model path
    _, lora_fn, _, _ = by_fn["set_lora"][0]
    assert "base model" in lora_fn("", 1.0)
    assert "Error" in lora_fn(str(tmp_path / "missing.npz"), 1.0)

    # text-preset selection returns the preset text
    gr = sys.modules["gradio"]
    _, sel_fn, _, _ = by_fn["select_text_preset"][0]
    assert sel_fn(gr.SelectData(index=(0, 2)))["value"] == "[S1] One two."

    # preset save -> dropdown refresh, then apply round-trips
    _, save_fn, save_inputs, _ = by_fn["save_preset"][0]
    assert len(save_inputs) == 13
    dd_update, msg = save_fn("FromUI", 25, 2.5, 6.5, 0.5, 1.0, 0.9, 1.0,
                             3.0, False, 1.5, 0.9, 24)
    assert "Saved" in msg and "FromUI" in dd_update["choices"]
    _, apply_fn, _, apply_outputs = by_fn["apply_preset"][0]
    assert len(apply_outputs) == 13
    updates = apply_fn("FromUI")
    assert updates[0]["value"] == 25 and updates[2]["value"] == 6.5


def test_custom_shapes_reach_engine(tiny_tts, stub_gradio, tmp_path):  # noqa: F811
    """'Use Custom Shapes' bucket fields actually override the pipeline
    buckets for the request (review finding: they were wired but ignored),
    and the latent-length field takes the largest entry, not the smallest."""
    _, _, tts = tiny_tts
    eng = Engine(tts)
    seen = {}
    real_generate = eng.generate

    def spy(*a, **k):
        seen.update(k)
        return real_generate(*a, **k)

    eng.generate = spy
    demo = ga.build_app(eng, presets_path=str(tmp_path / "p.json"),
                        text_presets_path=str(tmp_path / "t.txt"),
                        temp_dir=str(tmp_path / "out"))
    assert demo is not None
    gen_fn = next(fn for _e, fn, _i, _o in stub_gradio
                  if getattr(fn, "__name__", "") == "generate")
    gen_fn(None, "Shapes test.", None, "wav",
           2, 3.0, 5.0, 0.5, 1.0, 0.8, 1.2, 3.0, False, 1.5, 0.9, 24,
           1, "32, 64", "16, 32", "8, 16", True, False, False)
    assert seen["pipe_overrides"] == {"text_buckets": (32, 64),
                                      "speaker_buckets": (16, 32)}
    assert seen["sc"].sequence_length == 16  # largest latent-length entry

    seen.clear()
    gen_fn(None, "No shapes.", None, "wav",
           2, 3.0, 5.0, 0.5, 1.0, 0.8, 1.2, 3.0, False, 1.5, 0.9, 24,
           1, "32", "16", "8", False, False, False)  # checkbox OFF
    assert seen["pipe_overrides"] is None


def test_initial_fields_match_first_preset(tiny_tts, stub_gradio, tmp_path):  # noqa: F811
    """The initially-selected preset's values ARE the initial field values
    (gradio fires no change event for the initial dropdown value)."""
    _, _, tts = tiny_tts
    presets = {"Loud": {"num_steps": "24", "cfg_scale_speaker": "9.0",
                        "truncation_factor": "0.7",
                        "speaker_kv_enable": "true",
                        "speaker_kv_scale": "1.8"}}
    demo = ga.build_app(Engine(tts), presets=presets,
                        presets_path=str(tmp_path / "p.json"),
                        text_presets_path=str(tmp_path / "t.txt"),
                        temp_dir=str(tmp_path / "out"))
    assert demo is not None
    # apply_sampler_preset_fields is the single source the builder reads for
    # initial component values — assert the derived init dict directly
    init = ga.apply_sampler_preset_fields(presets, "Loud")
    assert init["num_steps"] == 24 and init["cfg_scale_speaker"] == 9.0
    assert init["speaker_kv_enable"] is True and init["speaker_kv_scale"] == 1.8


def test_presets_argument_beats_file(tmp_path, tiny_tts, stub_gradio):  # noqa: F811
    """An explicit presets= argument is never shadowed by a
    sampler_presets.json sitting in the path (review finding)."""
    import json as _json

    _, _, tts = tiny_tts
    p = tmp_path / "sampler_presets.json"
    p.write_text(_json.dumps({"FromFile": {"num_steps": "10"}}))
    demo = ga.build_app(Engine(tts), presets={"FromArg": {"num_steps": "20"}},
                        presets_path=str(p),
                        text_presets_path=str(tmp_path / "t.txt"),
                        temp_dir=str(tmp_path / "out"))
    assert demo is not None
    apply_fn = next(fn for _e, fn, _i, _o in stub_gradio
                    if getattr(fn, "__name__", "") == "apply_preset")
    updates = apply_fn("FromArg")
    assert updates[0]["value"] == 20
    assert apply_fn("FromFile") == [{}] * 13 or all(
        u == {} for u in apply_fn("FromFile"))
