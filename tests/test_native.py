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


def test_mono_mix_normalize():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 500)).astype(np.float32) * 3.0
    out = mono_mix_normalize_native(x)
    ref = x.mean(axis=0, keepdims=True)
    ref = ref / max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(out, ref, atol=1e-6)
