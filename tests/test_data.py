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
