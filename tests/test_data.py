"""Dataset/collate tests with real (tiny) AE encoding over generated WAVs
(reference: train_utils.py:86-274)."""
import json

import numpy as np
import pytest

from echo_tts_tpu.pipeline.audio_io import load_audio, read_wav, resample, write_wav
from echo_tts_tpu.train.data import (
    EchoTTSDataset,
    TrainingSample,
    batches,
    collate,
    prepare_samples_from_directory,
)

from test_pipeline_parity import tiny_tts  # noqa: F401


def test_wav_roundtrip(tmp_path):
    sr = 44100
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)[None]
    p = str(tmp_path / "a.wav")
    write_wav(p, x, sr)
    back, sr2 = read_wav(p)
    assert sr2 == sr and back.shape == x.shape
    np.testing.assert_allclose(back, x, atol=1e-3)


def test_resample():
    sr = 22050
    x = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)[None]
    y = resample(x, sr, 44100)
    assert abs(y.shape[-1] - 2 * sr) <= 2


def test_dataset_and_collate(tmp_path, tiny_tts):  # noqa: F811
    _, _, tts = tiny_tts
    sr = tts.ae_cfg.sample_rate
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"s{i}.wav")
        n = tts.ae_cfg.frame_length * (20 + 4 * i)
        write_wav(p, (0.2 * rng.standard_normal(n)).astype(np.float32)[None], sr)
        paths.append(p)

    transcripts = {p: f"[S1] sample {i}" for i, p in enumerate(paths)}
    samples = prepare_samples_from_directory(str(tmp_path), transcripts)
    assert len(samples) == 3

    ds = EchoTTSDataset(samples, tts.ae_params, tts.ae_cfg, tts.pca,
                        max_latent_length=32)
    item = ds[0]
    assert item["latent"].shape[1] == tts.dit_cfg.latent_size
    assert item["latent"].shape[0] <= 32

    batch = collate([ds[i] for i in range(3)], max_text_length=32,
                    bucket_granularity=16)
    assert batch["latent"].shape[0] == 3
    assert batch["latent"].shape[1] % 16 == 0
    assert batch["text_input_ids"].shape == (3, 32)
    assert batch["latent_mask"].any(axis=1).all()

    bs = list(batches(ds, 2, np.random.default_rng(1), max_text_length=32))
    assert len(bs) == 1 and bs[0]["latent"].shape[0] == 2

    # threaded-prefetch init (host decode overlapped with device encode)
    # produces bit-identical caches to the serial path
    ds_serial = EchoTTSDataset(samples, tts.ae_params, tts.ae_cfg, tts.pca,
                               max_latent_length=32, io_workers=0)
    for p in ds.latent_cache:
        np.testing.assert_array_equal(ds.latent_cache[p],
                                      ds_serial.latent_cache[p])
    for p in ds.speaker_cache:
        np.testing.assert_array_equal(ds.speaker_cache[p][0],
                                      ds_serial.speaker_cache[p][0])

    # batches_prefetch: identical batch sequence, built on a producer thread
    from echo_tts_tpu.train.data import batches_prefetch

    ref = list(batches(ds, 2, np.random.default_rng(2), max_text_length=32))
    pre = list(batches_prefetch(ds, 2, np.random.default_rng(2), prefetch=2,
                                max_text_length=32))
    assert len(ref) == len(pre)
    for a, b in zip(ref, pre):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


class _FakeASR:
    """Injectable ASR stand-in (the real path needs downloaded weights)."""

    def __init__(self, fail_on=()):
        self.fail_on = set(fail_on)
        self.calls = []

    def __call__(self, path):
        self.calls.append(path)
        if path in self.fail_on:
            raise RuntimeError("decode error")
        return {"text": f"hello from {pathlib_name(path)}"}


def pathlib_name(p):
    import os

    return os.path.splitext(os.path.basename(p))[0]


def test_transcription_api(tmp_path):
    from echo_tts_tpu.train.data import (
        transcribe_audio,
        transcribe_audio_files,
        transcribe_audio_files_parakeet,
        transcribe_audio_files_parallel,
    )

    paths = [str(tmp_path / f"x{i}.wav") for i in range(3)]
    asr = _FakeASR()
    # single: [S1] tag auto-prepended (reference train_utils.py:609-612)
    assert transcribe_audio(paths[0], asr=asr) == "[S1] hello from x0"
    # batch: per-file errors collected and skipped (train_utils.py:715-733)
    asr = _FakeASR(fail_on={paths[1]})
    out = transcribe_audio_files(paths, asr=asr)
    assert set(out) == {paths[0], paths[2]}
    assert all(v.startswith("[S1] ") for v in out.values())
    with pytest.raises(RuntimeError):
        transcribe_audio_files(paths, asr=asr, on_error="raise")
    # parakeet variant shares the surface
    assert set(transcribe_audio_files_parakeet(paths, asr=_FakeASR())) == set(paths)
    # parallel variant: same results, any order
    par = transcribe_audio_files_parallel(paths, asr=_FakeASR(), num_workers=2)
    assert par == transcribe_audio_files(paths, asr=_FakeASR())


def test_prepare_samples_transcribe_missing(tmp_path):
    sr = 8000
    for i in range(2):
        write_wav(str(tmp_path / f"s{i}.wav"),
                  np.zeros((1, sr // 4), np.float32), sr)
    provided = {str(tmp_path / "s0.wav"): "[S1] provided"}
    samples = prepare_samples_from_directory(
        str(tmp_path), provided, transcribe_missing=True, asr=_FakeASR())
    assert len(samples) == 2
    texts = {s.audio_path: s.text for s in samples}
    assert texts[str(tmp_path / "s0.wav")] == "[S1] provided"
    assert texts[str(tmp_path / "s1.wav")] == "[S1] hello from s1"


def test_transcription_language_forwarding(tmp_path):
    """`language` reaches ASR callables that accept it (reference whisper
    surface, train_utils.py:550-580) and is silently dropped for path-only
    callables; the parakeet wrapper never forwards it (train_utils.py:642)."""
    from echo_tts_tpu.train.data import (
        transcribe_audio,
        transcribe_audio_files,
        transcribe_audio_files_parakeet,
    )

    seen = []

    def asr_lang(path, language=None):
        seen.append(language)
        return {"text": "hi"}

    p = str(tmp_path / "a.wav")
    assert transcribe_audio(p, language="de", asr=asr_lang) == "[S1] hi"
    assert seen == ["de"]
    transcribe_audio_files([p], language="fr", asr=asr_lang)
    assert seen[-1] == "fr"
    # default language is en
    transcribe_audio_files([p], asr=asr_lang)
    assert seen[-1] == "en"
    # parakeet: language ignored, batch_size is a progress cadence
    transcribe_audio_files_parakeet([p], language="de", batch_size=1,
                                    asr=asr_lang)
    assert seen[-1] is None
    # path-only callables still work with a language set
    assert transcribe_audio(p, language="en", asr=_FakeASR()).startswith("[S1]")


def test_batches_prefetch_abandoned_consumer(tmp_path, tiny_tts):  # noqa: F811
    """Closing the generator early (exception in the epoch loop) must stop
    the producer thread — a blocked q.put would pin batches in memory for
    the rest of the process."""
    import threading

    from echo_tts_tpu.train.data import batches_prefetch

    _, _, tts = tiny_tts
    sr = tts.ae_cfg.sample_rate
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        p = str(tmp_path / f"s{i}.wav")
        n = tts.ae_cfg.frame_length * 12
        write_wav(p, (0.2 * rng.standard_normal(n)).astype(np.float32)[None], sr)
        paths.append(p)
    ds = EchoTTSDataset([TrainingSample(p, "[S1] t") for p in paths],
                        tts.ae_params, tts.ae_cfg, tts.pca,
                        max_latent_length=16, io_workers=0)

    before = threading.active_count()
    gen = batches_prefetch(ds, 1, np.random.default_rng(1), prefetch=1,
                           max_text_length=32)
    next(gen)  # producer running, queue full behind us
    gen.close()  # GeneratorExit -> finally -> stop + drain + join
    deadline = __import__("time").monotonic() + 5
    while threading.active_count() > before and __import__("time").monotonic() < deadline:
        __import__("time").sleep(0.02)
    assert threading.active_count() <= before
