"""Serving-layer tests: engine generation + LoRA hot-swap + HTTP round-trip
on a tiny model (reference serve surface: gradio_app.py:229-430)."""
import base64
import json
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.core.config import SamplerConfig
from echo_tts_tpu.serve.engine import Engine
from echo_tts_tpu.serve.server import serve
from echo_tts_tpu.train.lora import LoRAConfig, init_lora, save_lora_checkpoint

from test_pipeline_parity import tiny_tts  # fixture reuse  # noqa: F401


@pytest.fixture(scope="module")
def engine(tiny_tts):  # noqa: F811
    _, _, tts = tiny_tts
    return Engine(tts)


SC = SamplerConfig(num_steps=2, sequence_length=16, truncation_factor=0.8)


def test_engine_generate(engine):
    audio, normalized, timings = engine.generate("Hello world.", None, seed=1, sc=SC)
    assert audio.ndim == 3 and audio.shape[1] == 1
    assert np.isfinite(audio).all()
    assert normalized.startswith("[S1] ")
    assert engine.health()["requests"] == 1


def test_engine_lora_swap(engine, tmp_path):
    lc = LoRAConfig(rank=2)
    lora = init_lora(jax.random.PRNGKey(0), engine._base_params, lc)
    # make B nonzero so the swap changes outputs
    tgt = "blocks.attention.wq"
    lora[tgt]["b"] = jnp.ones_like(lora[tgt]["b"]) * 0.1
    p = str(tmp_path / "l.npz")
    save_lora_checkpoint(p, lora, lc)

    a_base, _, _ = engine.generate("Swap test.", None, seed=2, sc=SC)
    engine.set_lora(p)
    a_lora, _, _ = engine.generate("Swap test.", None, seed=2, sc=SC)
    engine.set_lora(None)
    a_back, _, _ = engine.generate("Swap test.", None, seed=2, sc=SC)

    assert not np.allclose(a_base, a_lora)
    np.testing.assert_allclose(a_base, a_back, atol=1e-6)


def test_engine_int8_cache_roundtrip(tiny_tts, tmp_path):  # noqa: F811
    """int8_cache_path (VERDICT r4 item 8): the first engine quantizes the
    base params and persists them; a restarted engine loads the npz instead
    of re-running the quantization jit, with identical outputs. A LoRA
    merge bypasses the cache (merged weights differ)."""
    import dataclasses

    _, _, tts = tiny_tts
    p = str(tmp_path / "int8.npz")
    e1 = Engine(dataclasses.replace(tts), int8=True, int8_cache_path=p)
    a1, _, _ = e1.generate("Cache me.", None, seed=4, sc=SC)
    e1.close()
    import os
    assert os.path.exists(p)

    from echo_tts_tpu.checkpoints import io as cio

    loads = []
    real_load = cio.load_pytree_like

    def load_spy(path, like):
        loads.append(path)
        return real_load(path, like)

    jits = []
    real_jit = jax.jit

    def jit_spy(*a, **k):
        jits.append(1)
        return real_jit(*a, **k)

    cio.load_pytree_like = load_spy
    try:
        jax.jit = jit_spy  # Engine init's only jax.jit use is the quantize
        e2 = Engine(dataclasses.replace(tts), int8=True, int8_cache_path=p)
        jax.jit = real_jit
        a2, _, _ = e2.generate("Cache me.", None, seed=4, sc=SC)
        e2.close()
    finally:
        jax.jit = real_jit
        cio.load_pytree_like = real_load
    assert loads == [p], "restart did not load the quantization cache"
    assert not jits, "restart still ran the quantization jit"
    np.testing.assert_allclose(a1, a2, atol=1e-6, rtol=0)


def test_engine_warmup_compiles_buckets(engine):
    """warmup runs one generation per bucket combo (no-speaker + each
    speaker bucket) without touching request stats semantics beyond the
    runs themselves; subsequent generations hit warm executables."""
    before = engine.health()["requests"]
    wall = engine.warmup(SC)
    assert wall > 0
    # no-speaker + the tiny config's two speaker buckets
    n_combos = 1 + len(engine.tts.pipe_cfg.speaker_buckets)
    assert engine.health()["requests"] == before  # warmup bypasses stats
    audio, _, _ = engine.generate("Post warmup.", None, seed=9, sc=SC)
    assert np.isfinite(audio).all() and n_combos >= 2


def test_http_server_roundtrip(engine):
    httpd = serve(engine, port=0, background=True)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        health = json.loads(urllib.request.urlopen(f"{base}/health").read())
        assert health["status"] == "ok"

        body = json.dumps({"text": "HTTP test.", "seed": 3,
                           "num_steps": 2, "sequence_length": 16}).encode()
        req = urllib.request.Request(f"{base}/tts", data=body,
                                     headers={"Content-Type": "application/json"})
        resp = urllib.request.urlopen(req)
        wav = resp.read()
        assert wav[:4] == b"RIFF"
        normalized = base64.b64decode(resp.headers["X-Normalized-Text"]).decode()
        assert "HTTP test." in normalized
        timings = json.loads(resp.headers["X-Timings"])
        assert "sample" in timings and "vocoder" in timings
    finally:
        httpd.shutdown()


def test_http_tts_mp3_output_and_mp3_speaker(engine, tmp_path):
    """format=mp3 response (libmp3lame; WAV fallback otherwise — reference
    gradio_app.py:111-127) and an MP3 speaker prompt sniffed from base64
    bytes (the reference's demo prompts are .mp3)."""
    from echo_tts_tpu.native.mp3_py import (encode_mp3, mp3_available,
                                            mp3_encode_available)

    httpd = serve(engine, port=0, background=True)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        speaker_b64 = None
        if mp3_encode_available():
            n = engine.tts.ae_cfg.frame_length * 16
            rng = np.random.default_rng(7)
            p = str(tmp_path / "spk.mp3")
            assert encode_mp3(p, (0.2 * rng.standard_normal(n)).astype(
                np.float32)[None], engine.tts.ae_cfg.sample_rate)
            with open(p, "rb") as f:
                speaker_b64 = base64.b64encode(f.read()).decode()

        payload = {"text": "MP3 test.", "seed": 5, "num_steps": 2,
                   "sequence_length": 16, "format": "mp3"}
        if speaker_b64:
            payload["speaker_wav_b64"] = speaker_b64
        req = urllib.request.Request(
            f"{base}/tts", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        resp = urllib.request.urlopen(req)
        body = resp.read()
        if mp3_available() and mp3_encode_available():
            assert resp.headers["Content-Type"] == "audio/mpeg"
            assert body[:3] == b"ID3" or body[0:1] == b"\xff"
        else:
            assert body[:4] == b"RIFF"  # graceful fallback
    finally:
        httpd.shutdown()


def test_http_preset_and_speaker_wav(engine, tmp_path):
    """Preset-by-name + base64 speaker-WAV conditioning through the HTTP API
    (reference serve surface: speaker upload + sampler presets)."""
    import dataclasses

    from echo_tts_tpu.pipeline.audio_io import write_wav

    presets = {"Fast-Test": SC}
    httpd = serve(engine, port=0, background=True, presets=presets)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        # speaker wav: 16 chunk-latents of audio at the tiny frame length
        n = engine.tts.ae_cfg.frame_length * 16
        rng = np.random.default_rng(3)
        p = str(tmp_path / "spk.wav")
        write_wav(p, (0.2 * rng.standard_normal(n)).astype(np.float32)[None],
                  engine.tts.ae_cfg.sample_rate)
        with open(p, "rb") as f:
            b64 = base64.b64encode(f.read()).decode()

        body = json.dumps({"text": "Preset request.", "seed": 4,
                           "preset": "Fast-Test", "speaker_wav_b64": b64}).encode()
        req = urllib.request.Request(f"{base}/tts", data=body,
                                     headers={"Content-Type": "application/json"})
        resp = urllib.request.urlopen(req)
        assert resp.read()[:4] == b"RIFF"
        timings = json.loads(resp.headers["X-Timings"])
        assert timings["speaker_encode"] > 0
    finally:
        httpd.shutdown()


def test_http_tts_stream(engine):
    """Chunked /tts_stream endpoint: raw PCM16 chunks, one per latent block
    (blockwise sampling + causal streamed decode)."""
    httpd = serve(engine, port=0, background=True)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        body = json.dumps({"text": "Stream me.", "seed": 5, "num_steps": 2,
                           "sequence_length": 16, "block_size": 8,
                           "truncation_factor": 0.8}).encode()
        req = urllib.request.Request(f"{base}/tts_stream", data=body,
                                     headers={"Content-Type": "application/json"})
        resp = urllib.request.urlopen(req)
        assert resp.headers["Content-Type"] == "audio/L16"
        sr = int(resp.headers["X-Sample-Rate"])
        assert sr == engine.tts.ae_cfg.sample_rate
        pcm = resp.read()  # urllib de-chunks transfer-encoding
        assert len(pcm) > 0 and len(pcm) % 2 == 0
        audio = np.frombuffer(pcm, "<i2").astype(np.float32) / 32767.0
        # at most 16 latents of audio, nonzero, finite
        assert audio.size <= 16 * engine.tts.ae_cfg.frame_length
        assert np.isfinite(audio).all() and np.abs(audio).max() > 0
    finally:
        httpd.shutdown()


def test_http_reconstruct(engine, tmp_path):
    """AE round-trip audition endpoint (reference: gradio_app.py:390-403)."""
    from echo_tts_tpu.pipeline.audio_io import write_wav

    httpd = serve(engine, port=0, background=True)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        n = engine.tts.ae_cfg.frame_length * 16
        rng = np.random.default_rng(9)
        p = str(tmp_path / "r.wav")
        write_wav(p, (0.2 * rng.standard_normal(n)).astype(np.float32)[None],
                  engine.tts.ae_cfg.sample_rate)
        body = json.dumps({"path": p}).encode()
        req = urllib.request.Request(f"{base}/reconstruct", data=body,
                                     headers={"Content-Type": "application/json"})
        resp = urllib.request.urlopen(req)
        assert resp.read()[:4] == b"RIFF"
    finally:
        httpd.shutdown()


def test_http_concurrent_requests_serialize(engine):
    """Two parallel /tts requests through the threading server: the engine
    lock serializes device work (single-writer discipline, SURVEY.md §5.2);
    both succeed and stats count both."""
    from concurrent.futures import ThreadPoolExecutor

    httpd = serve(engine, port=0, background=True)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    before = engine.health()["requests"]

    def one(seed):
        body = json.dumps({"text": f"Concurrent {seed}.", "seed": seed,
                           "num_steps": 2, "sequence_length": 16}).encode()
        req = urllib.request.Request(f"{base}/tts", data=body,
                                     headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req).read()[:4]

    try:
        with ThreadPoolExecutor(max_workers=2) as ex:
            outs = list(ex.map(one, [11, 12]))
        assert outs == [b"RIFF", b"RIFF"]
        assert engine.health()["requests"] == before + 2
    finally:
        httpd.shutdown()


def test_engine_int8_opt_in(tiny_tts, tmp_path):  # noqa: F811
    """int8=True quantizes the trunk (models/quant.py) for serving and
    re-quantizes after every LoRA swap; output stays finite and close to the
    bf16 engine's."""
    import dataclasses

    from echo_tts_tpu.models.quant import is_quantized

    _, _, tts = tiny_tts
    ref_audio, _, _ = Engine(dataclasses.replace(tts)).generate(
        "Quantized test.", None, seed=3, sc=SC)

    eng = Engine(dataclasses.replace(tts), int8=True)
    assert is_quantized(eng.tts.dit_params["blocks"]["attention"]["wq"])
    audio, _, _ = eng.generate("Quantized test.", None, seed=3, sc=SC)
    assert np.isfinite(audio).all()
    rel = (np.linalg.norm(audio - ref_audio)
           / (np.linalg.norm(ref_audio) + 1e-12))
    assert rel < 0.2, rel  # tiny 2-step model; full-scale SNR: scripts/quant_snr.py

    # LoRA swap keeps the effective params quantized, and reverting restores
    # the quantized base
    lc = LoRAConfig(rank=2)
    lora = init_lora(jax.random.PRNGKey(0), eng._base_params, lc)
    p = str(tmp_path / "l8.npz")
    save_lora_checkpoint(p, lora, lc)
    eng.set_lora(p)
    assert is_quantized(eng.tts.dit_params["blocks"]["mlp"]["w1"])
    eng.set_lora(None)
    assert is_quantized(eng.tts.dit_params["blocks"]["attention"]["wo"])


def test_engine_micro_batching_matches_serial(tiny_tts):  # noqa: F811
    """max_batch>1: concurrent generates with the same signature are grouped
    into ONE batched fused device call (pipeline.sample_pipeline_batch) and
    the per-request audio matches serial generation (per-seed noise rows are
    identical to the B=1 path)."""
    import dataclasses
    from concurrent.futures import ThreadPoolExecutor

    _, _, tts = tiny_tts
    serial = Engine(dataclasses.replace(tts))
    texts_seeds = [("Batch one.", 31), ("Batch two two.", 32),
                   ("Batch three three three.", 33)]
    ref = {s: serial.generate(t, None, seed=s, sc=SC)[0]
           for t, s in texts_seeds}

    eng = Engine(dataclasses.replace(tts), max_batch=4, batch_wait_ms=300.0)
    try:
        with ThreadPoolExecutor(max_workers=3) as ex:
            outs = list(ex.map(
                lambda ts: (ts[1], eng.generate(ts[0], None, seed=ts[1], sc=SC)),
                texts_seeds))
        for seed, (audio, normalized, timings) in outs:
            np.testing.assert_allclose(audio, ref[seed], atol=1e-5)
            assert timings["batch_size"] >= 3.0
        st = eng.health()
        assert st["requests"] == 3
        assert st["batches"] == 1  # all three in one device call
    finally:
        eng.close()


def test_engine_micro_batching_splits_incompatible(tiny_tts):  # noqa: F811
    """Requests with different SamplerConfigs never share a device batch —
    the dispatcher groups by signature; stragglers run in a later batch."""
    import dataclasses
    from concurrent.futures import ThreadPoolExecutor

    _, _, tts = tiny_tts
    sc_b = dataclasses.replace(SC, cfg_scale_text=4.0)
    eng = Engine(dataclasses.replace(tts), max_batch=4, batch_wait_ms=100.0)
    try:
        with ThreadPoolExecutor(max_workers=2) as ex:
            fa = ex.submit(eng.generate, "Same text.", None, 41, SC)
            fb = ex.submit(eng.generate, "Same text.", None, 41, sc_b)
            a, b = fa.result()[0], fb.result()[0]
        assert not np.allclose(a, b)  # different guidance scales took effect
        st = eng.health()
        assert st["requests"] == 2 and st["batches"] == 2
    finally:
        eng.close()


def test_engine_speaker_cache_reuses_encode(tiny_tts, monkeypatch):  # noqa: F811
    """Repeat speaker prompts skip the chunked AE encode: the engine's LRU
    caches (latent, mask) by audio content hash; audio output is unchanged."""
    import dataclasses

    import echo_tts_tpu.pipeline.pipeline as pipe_mod

    _, _, tts = tiny_tts
    spl = tts.ae_cfg.frame_length
    rng = np.random.default_rng(7)
    voice = 0.1 * rng.standard_normal((1, 8 * spl)).astype(np.float32)

    calls = {"n": 0}
    real = pipe_mod.get_speaker_latent_and_mask

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(pipe_mod, "get_speaker_latent_and_mask", counting)

    uncached = Engine(dataclasses.replace(tts), speaker_cache_size=0)
    ref, _, _ = uncached.generate("Voice cache.", voice, seed=5, sc=SC)
    assert calls["n"] == 1

    eng = Engine(dataclasses.replace(tts), speaker_cache_size=4)
    a1, _, t1 = eng.generate("Voice cache.", voice, seed=5, sc=SC)
    a2, _, t2 = eng.generate("Voice cache two.", voice, seed=6, sc=SC)
    assert calls["n"] == 2  # one more encode total: second request hit the LRU
    assert "speaker_encode_cache_hit" in t2 and "speaker_encode_cache_hit" not in t1
    np.testing.assert_allclose(a1, ref, atol=0)  # cache changes nothing
    st = eng.health()
    assert st["speaker_cache_hits"] == 1 and st["speaker_cache_misses"] == 1

    # different audio -> its own encode
    other = 0.1 * rng.standard_normal((1, 8 * spl)).astype(np.float32)
    eng.generate("Voice cache three.", other, seed=7, sc=SC)
    assert calls["n"] == 3


def test_engine_warmup_batched_shapes(tiny_tts):  # noqa: F811
    """A batching engine's warmup also pre-compiles the power-of-2 batched
    executables so the first concurrent burst pays no cold compile."""
    import dataclasses

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts), max_batch=4, batch_wait_ms=50.0)
    try:
        wall = eng.warmup(SC, include_speaker_buckets=False)
        assert wall > 0
        audio, _, _ = eng.generate("Post batched warmup.", None, seed=8, sc=SC)
        assert np.isfinite(audio).all()
    finally:
        eng.close()


def test_text_presets_parsing_and_endpoint(engine, tmp_path):
    """Text-preset table parsing mirrors the reference exactly
    (gradio_app.py:434-454): ' | ' separator, Uncategorized fallback, word
    counts; served at GET /text_presets."""
    from echo_tts_tpu.serve.presets import load_text_presets

    p = tmp_path / "text_presets.txt"
    p.write_text("Reading | [S1] One two three.\n"
                 "\n"
                 "No separator line here\n"
                 "Cartoon | [S1] Four five six seven.\n")
    rows = load_text_presets(str(p))
    assert rows == [["Reading", "4", "[S1] One two three."],
                    ["Uncategorized", "4", "No separator line here"],
                    ["Cartoon", "5", "[S1] Four five six seven."]]

    httpd = serve(engine, port=0, background=True, text_presets_path=str(p))
    try:
        port = httpd.server_address[1]
        got = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/text_presets").read())
        assert got == rows
    finally:
        httpd.shutdown()


def test_engine_mesh_reshards_int8_leaves(tiny_tts):  # noqa: F811
    """Engine(mesh=...) re-places the effective params with the declared TP
    specs AFTER int8 quantization, so {"q","s"} leaves land on their
    param_pspecs shardings instead of GSPMD propagation (the serve.py
    --tp --int8 composition)."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from echo_tts_tpu.core.config import MeshConfig
    from echo_tts_tpu.models.quant import is_quantized
    from echo_tts_tpu.parallel.mesh import make_mesh

    _, _, tts = tiny_tts
    mesh = make_mesh(MeshConfig(dp=1, tp=2), devices=jax.devices()[:2])
    eng = Engine(dataclasses.replace(tts), int8=True, mesh=mesh)
    wq = eng.tts.dit_params["blocks"]["attention"]["wq"]
    assert is_quantized(wq)
    assert wq["q"].sharding.spec == P(None, None, "tp")
    assert wq["s"].sharding.spec == P(None, "tp")
    w2 = eng.tts.dit_params["blocks"]["mlp"]["w2"]
    assert w2["q"].sharding.spec == P(None, "tp", None)

    # swap + revert keeps the placement discipline
    eng.set_lora(None)
    assert eng.tts.dit_params["blocks"]["attention"]["wq"][
        "q"].sharding.spec == P(None, None, "tp")


def test_stream_lock_released_while_slow_reader_drains(tiny_tts):  # noqa: F811
    """generate_stream's device work must decouple from consumer speed: once
    the last block is sampled the device lock frees, so a second request
    completes while a slow reader is still draining buffered chunks. (With
    lock-held-for-the-stream semantics this test deadlocks.)"""
    import dataclasses
    import threading
    import time as _time

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts))
    gen = eng.generate_stream("Slow reader test.", None, seed=1, sc=SC,
                              block_size=8)
    first = next(gen)  # device work running; do NOT drain further
    assert first.shape[0] == 1

    result = {}

    def second():
        result["audio"] = eng.generate("Concurrent.", None, seed=2, sc=SC)[0]

    t = threading.Thread(target=second, daemon=True)
    t.start()
    t.join(timeout=120)
    assert "audio" in result, "second request blocked behind undrained stream"
    assert np.isfinite(result["audio"]).all()

    rest = list(gen)  # drain: remaining buffered chunks still intact
    total = first.shape[-1] + sum(c.shape[-1] for c in rest)
    assert total > 0
    # stream accounted exactly once in stats
    deadline = _time.monotonic() + 5
    while eng.health()["requests"] < 2 and _time.monotonic() < deadline:
        _time.sleep(0.02)
    assert eng.health()["requests"] == 2


def test_stream_close_stops_device_work(tiny_tts):  # noqa: F811
    """Closing the stream generator (client disconnect) ends device work at
    the next block boundary and releases the lock."""
    import dataclasses

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts))
    gen = eng.generate_stream("Disconnect test.", None, seed=3, sc=SC,
                              block_size=8)
    next(gen)
    gen.close()
    # lock must be (or become) free; a follow-up request succeeds
    audio, _, _ = eng.generate("After disconnect.", None, seed=4, sc=SC)
    assert np.isfinite(audio).all()


def test_engine_stream_micro_batching_matches_serial(tiny_tts):  # noqa: F811
    """max_batch>1: two concurrent generate_stream calls with matching
    signatures run as ONE batched device stream and each client's audio
    equals its solo stream with the same seed."""
    import dataclasses
    import threading

    _, _, tts = tiny_tts
    solo = Engine(dataclasses.replace(tts))
    ref = {}
    for seed, text in ((21, "Batch stream one."), (22, "Batch stream two.")):
        chunks = list(solo.generate_stream(text, None, seed=seed, sc=SC,
                                           block_size=8))
        ref[seed] = np.concatenate(chunks, axis=-1)

    eng = Engine(dataclasses.replace(tts), max_batch=2, batch_wait_ms=300.0)
    try:
        got = {}

        def run(seed, text):
            chunks = list(eng.generate_stream(text, None, seed=seed, sc=SC,
                                              block_size=8))
            got[seed] = np.concatenate(chunks, axis=-1)

        t1 = threading.Thread(target=run, args=(21, "Batch stream one."))
        t2 = threading.Thread(target=run, args=(22, "Batch stream two."))
        t1.start(); t2.start()
        t1.join(timeout=300); t2.join(timeout=300)
        assert set(got) == {21, 22}
        for seed in (21, 22):
            assert got[seed].shape == ref[seed].shape
            np.testing.assert_allclose(got[seed], ref[seed], atol=2e-5, rtol=0)
        health = eng.health()
        assert health["requests"] == 2
        assert health["batches"] == 1  # grouped into one device stream
    finally:
        eng.close()


def test_engine_stream_micro_batching_incompatible_split(tiny_tts):  # noqa: F811
    """Streams with different block schedules (or stream vs non-stream) never
    batch together; both still complete."""
    import dataclasses
    import threading

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts), max_batch=2, batch_wait_ms=50.0)
    try:
        out = {}

        def run_stream(name, bs):
            out[name] = np.concatenate(
                list(eng.generate_stream(f"S {name}.", None, seed=5, sc=SC,
                                         block_size=bs)), axis=-1)

        def run_plain(name):
            out[name] = eng.generate(f"P {name}.", None, seed=6, sc=SC)[0]

        ts = [threading.Thread(target=run_stream, args=("a", 8)),
              threading.Thread(target=run_stream, args=("b", (4, 12))),
              threading.Thread(target=run_plain, args=("c",))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert set(out) == {"a", "b", "c"}
        for v in out.values():
            assert np.isfinite(v).all()
        assert eng.health()["requests"] == 3
    finally:
        eng.close()


def test_engine_close_releases_queued_stream(tiny_tts):  # noqa: F811
    """close() while a queued stream sits undispatched must push an error +
    END to its queue rather than hanging the consumer."""
    import dataclasses
    import threading

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts), max_batch=2, batch_wait_ms=5000.0)
    # occupy the dispatcher with a long linger by enqueueing one stream and
    # closing before its wait window elapses
    result = {}

    def consume():
        try:
            list(eng.generate_stream("Close test.", None, seed=1, sc=SC,
                                     block_size=8))
            result["outcome"] = "completed"
        except RuntimeError as e:
            result["outcome"] = f"error: {e}"

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    import time as _t

    _t.sleep(0.3)  # let it enqueue
    eng.close()
    t.join(timeout=120)
    assert "outcome" in result, "stream consumer hung after close()"


def test_engine_warmup_streaming(tiny_tts):  # noqa: F811
    """warmup(include_streaming=True) pre-runs the streaming executables
    (fused prologue + block steps) so the first client stream hits warm
    code; a follow-up stream still works and stats stay warmup-free."""
    import dataclasses

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts))
    before = eng.health()["requests"]
    wall = eng.warmup(SC, include_speaker_buckets=False,
                      include_streaming=True, stream_block_size=8)
    assert wall > 0
    assert eng.health()["requests"] == before  # warmup bypasses stats
    chunks = list(eng.generate_stream("Post stream warmup.", None, seed=2,
                                      sc=SC, block_size=8))
    assert sum(c.shape[-1] for c in chunks) > 0


def test_engine_warmup_streaming_covers_speaker_buckets(tiny_tts, monkeypatch):  # noqa: F811
    """Streaming warmup compiles the fused prologue for EVERY speaker bucket
    (VERDICT r3 weak-1: a no-speaker-only warmup left the FIRST voice-cloning
    stream per bucket paying the cold compile while holding the device
    lock). Counts distinct speaker shapes reaching _stream_first_block."""
    import dataclasses

    from echo_tts_tpu.pipeline import pipeline as pipe_mod

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts))
    spk_shapes = []
    orig = pipe_mod._stream_first_block

    def counting(*args, **kwargs):
        spk_shapes.append(tuple(args[6].shape))  # speaker_latent
        return orig(*args, **kwargs)

    monkeypatch.setattr(pipe_mod, "_stream_first_block", counting)
    eng.warmup(SC, include_speaker_buckets=True, include_streaming=True,
               stream_block_size=8)
    pc = tts.pipe_cfg
    # the no-speaker zero-latent shape plus one per speaker bucket
    assert len(spk_shapes) == 1 + len(pc.speaker_buckets)
    assert len(set(spk_shapes)) == 1 + len(pc.speaker_buckets)
    assert {s[1] for s in spk_shapes} >= set(pc.speaker_buckets)


def test_engine_stream_batch_pad_rows(tiny_tts):  # noqa: F811
    """Three concurrent streams with max_batch=4 round the device batch up to
    4 with a pad row; pad-row chunks never leak into any client's audio
    (each stream equals its solo run) and exactly 3 requests are counted."""
    import dataclasses
    import threading

    _, _, tts = tiny_tts
    solo = Engine(dataclasses.replace(tts))
    texts = [(31, "Pad row A."), (32, "Pad row B."), (33, "Pad row C.")]
    ref = {}
    for seed, text in texts:
        ref[seed] = np.concatenate(
            list(solo.generate_stream(text, None, seed=seed, sc=SC,
                                      block_size=8)), axis=-1)

    eng = Engine(dataclasses.replace(tts), max_batch=4, batch_wait_ms=500.0)
    try:
        got = {}

        def run(seed, text):
            got[seed] = np.concatenate(
                list(eng.generate_stream(text, None, seed=seed, sc=SC,
                                         block_size=8)), axis=-1)

        ts = [threading.Thread(target=run, args=a) for a in texts]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert set(got) == {31, 32, 33}
        for seed, _text in texts:
            assert got[seed].shape == ref[seed].shape
            np.testing.assert_allclose(got[seed], ref[seed], atol=2e-5, rtol=0)
        assert eng.health()["requests"] == 3  # pad row not counted
    finally:
        eng.close()


def test_engine_warmup_batched_streaming(tiny_tts):  # noqa: F811
    """warmup(include_streaming=True) with max_batch>1 also pre-runs the
    batched stream executables and the per-shape flattening detector."""
    import dataclasses

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts), max_batch=2, batch_wait_ms=20.0)
    try:
        wall = eng.warmup(SC, include_speaker_buckets=False,
                          include_streaming=True, stream_block_size=8)
        assert wall > 0
        assert eng.health()["requests"] == 0  # warmup bypasses stats
        chunks = list(eng.generate_stream("Post batched warmup.", None,
                                          seed=4, sc=SC, block_size=8))
        assert sum(c.shape[-1] for c in chunks) > 0
    finally:
        eng.close()


def test_sampler_config_from_preset_coercion():
    """Per-request sampler fields arrive as JSON strings/bools over HTTP
    (server.py builds SamplerConfig.from_preset from the request body): the
    int-valued knobs must come back as ints (jit static args; a float
    uncond_cache_interval would silently split the executable cache) and
    joint_uncond must survive as a bool."""
    from echo_tts_tpu.core.config import SamplerConfig

    sc = SamplerConfig.from_preset({
        "num_steps": "8", "uncond_cache_interval": "2",
        "first_block_steps": 16, "joint_uncond": True,
        "cfg_scale_text": "3.5",
    })
    assert sc.num_steps == 8 and isinstance(sc.num_steps, int)
    assert sc.uncond_cache_interval == 2
    assert isinstance(sc.uncond_cache_interval, int)
    assert sc.first_block_steps == 16
    assert isinstance(sc.first_block_steps, int)
    assert sc.joint_uncond is True
    assert sc.cfg_scale_text == 3.5
    assert SamplerConfig.from_preset(
        {"first_block_steps": "none"}).first_block_steps is None
