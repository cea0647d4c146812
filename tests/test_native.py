"""Native C++ component tests: build, upfirdn/resample parity vs scipy,
mono-mix helper."""
import numpy as np
import pytest

from echo_tts_tpu.native.build import build, load
from echo_tts_tpu.native.resample_py import (
    mono_mix_normalize_native,
    resample_native,
    upfirdn_native,
    _design_filter,
)


@pytest.fixture(scope="module", autouse=True)
def built():
    build()
    assert load() is not None


def test_upfirdn_matches_scipy():
    from scipy.signal import upfirdn as scipy_upfirdn

    rng = np.random.default_rng(0)
    x = rng.standard_normal(3000).astype(np.float32)
    h = _design_filter(3, 2)
    mine = upfirdn_native(x, h, 3, 2)
    ref = scipy_upfirdn(h.astype(np.float64), x.astype(np.float64), 3, 2)
    np.testing.assert_allclose(mine, ref[: len(mine)], atol=1e-6)


@pytest.mark.parametrize("pair", [(22050, 44100), (16000, 44100),
                                  (48000, 44100), (44100, 16000)])
def test_resample_matches_scipy(pair):
    from scipy.signal import resample_poly

    sf, st = pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4000).astype(np.float32)
    g = np.gcd(sf, st)
    ref = resample_poly(x.astype(np.float64), st // g, sf // g,
                        window=("kaiser", 5.0))
    mine = resample_native(x[None], sf, st)[0]
    assert len(mine) == len(ref)
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_mp3_roundtrip_and_load_audio(tmp_path):
    """Encode a tone with libmp3lame, decode with libmpg123, and check the
    waveform survives (mp3 is lossy, so compare by correlation after
    aligning out the encoder delay). Covers the reference's compressed-
    audio-prompt path (its demo prompts are .mp3; inference.py:141-149)."""
    from echo_tts_tpu.native.mp3_py import (decode_mp3, encode_mp3,
                                            mp3_available,
                                            mp3_encode_available)

    if not (mp3_available() and mp3_encode_available()):
        pytest.skip("system libmpg123/libmp3lame not present")
    sr = 44100
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    path = str(tmp_path / "tone.mp3")
    assert encode_mp3(path, x, sr)
    y, sr2 = decode_mp3(path)
    assert sr2 == sr and y.shape[0] == 1
    lag = int(np.argmax(np.correlate(y[0][:4000], x[0][:2000], "valid")))
    n = min(x.shape[1], y.shape[1] - lag) - 1000
    corr = np.corrcoef(x[0][:n], y[0][lag:lag + n])[0, 1]
    assert corr > 0.99, corr

    # load_audio routes .mp3 through the native decoder (mono, 44.1k,
    # peak-normalized only if >1 — reference inference.py:141-149)
    from echo_tts_tpu.pipeline.audio_io import load_audio

    au = load_audio(path)
    assert au.shape[0] == 1 and au.dtype == np.float32
    assert np.abs(au).max() <= 1.0


def test_mp3_stereo_decode_and_duration_cap(tmp_path):
    from echo_tts_tpu.native.mp3_py import (decode_mp3, encode_mp3,
                                            mp3_available,
                                            mp3_encode_available)

    if not (mp3_available() and mp3_encode_available()):
        pytest.skip("system libmpg123/libmp3lame not present")
    sr = 44100
    t = np.arange(sr * 3) / sr
    x = np.stack([0.4 * np.sin(2 * np.pi * 330 * t),
                  0.4 * np.sin(2 * np.pi * 550 * t)]).astype(np.float32)
    path = str(tmp_path / "stereo.mp3")
    assert encode_mp3(path, x, sr)
    y, sr2 = decode_mp3(path)
    assert sr2 == sr and y.shape[0] == 2
    assert abs(y.shape[1] - x.shape[1]) < sr // 4  # codec delay padding only
    y_cap, _ = decode_mp3(path, max_duration=1.0)
    assert y_cap.shape[1] == sr  # trimmed exactly to the cap


def test_mono_mix_normalize():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 500)).astype(np.float32) * 3.0
    out = mono_mix_normalize_native(x)
    ref = x.mean(axis=0, keepdims=True)
    ref = ref / max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(out, ref, atol=1e-6)
