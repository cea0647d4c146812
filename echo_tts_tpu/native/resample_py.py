"""Python wrapper: scipy-compatible resample_poly on the native upfirdn core.

Filter design replicates scipy.signal.resample_poly's default: windowed-sinc
FIR with a Kaiser(5.0) window, 10*max(up,down) half-taps, cutoff at
1/max(up,down) — designed in numpy so scipy is not required at run time.
"""
from __future__ import annotations

from math import gcd
from typing import Optional

import numpy as np

from echo_tts_tpu.native.build import load


def _design_filter(up: int, down: int) -> np.ndarray:
    max_rate = max(up, down)
    f_c = 1.0 / max_rate          # relative to Nyquist
    half_len = 10 * max_rate      # scipy default
    n = 2 * half_len + 1
    t = np.arange(n, dtype=np.float64) - half_len
    h = f_c * np.sinc(f_c * t)
    h *= np.kaiser(n, 5.0)
    h /= h.sum()  # firwin's unity DC gain normalization
    h *= up       # upsampling gain
    return h.astype(np.float32)


def upfirdn_native(x: np.ndarray, h: np.ndarray, up: int, down: int) -> Optional[np.ndarray]:
    import ctypes

    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    h = np.ascontiguousarray(h, dtype=np.float32)
    n_out = (len(x) * up + down - 1) // down
    # scipy upfirdn output length: ceil(((n_in-1)*up + len(h)) / down)
    n_out = -(-((len(x) - 1) * up + len(h)) // down)
    out = np.empty(n_out, dtype=np.float32)
    rc = lib.upfirdn_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(h),
        up, down,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out)
    if rc != 0:
        return None
    return out


def resample_native(audio: np.ndarray, sr_from: int, sr_to: int) -> Optional[np.ndarray]:
    """scipy.signal.resample_poly-compatible rate conversion on the last
    axis; returns None if the native library is unavailable."""
    if sr_from == sr_to:
        return np.asarray(audio, dtype=np.float32)
    g = gcd(sr_from, sr_to)
    up, down = sr_to // g, sr_from // g
    h = _design_filter(up, down)
    half_len = (len(h) - 1) // 2

    # scipy alignment: zero-prepad h so the delay removal index is integral
    n_pre_pad = (down - half_len % down) % down
    n_pre_remove = (half_len + n_pre_pad) // down
    h = np.concatenate([np.zeros(n_pre_pad, np.float32), h])

    flat = np.asarray(audio, dtype=np.float32).reshape(-1, audio.shape[-1])
    n_in = audio.shape[-1]
    n_out = -(-n_in * up // down)  # ceil

    # grow post-pad until the upfirdn output covers the removal window
    def out_len(n_h):
        return -(-((n_in - 1) * up + n_h) // down)

    n_post_pad = 0
    while out_len(len(h) + n_post_pad) < n_out + n_pre_remove:
        n_post_pad += down
    if n_post_pad:
        h = np.concatenate([h, np.zeros(n_post_pad, np.float32)])

    outs = []
    for row in flat:
        y = upfirdn_native(row, h, up, down)
        if y is None:
            return None
        outs.append(y[n_pre_remove : n_pre_remove + n_out])
    return np.stack(outs).reshape(*audio.shape[:-1], n_out)


def mono_mix_normalize_native(audio: np.ndarray) -> Optional[np.ndarray]:
    import ctypes

    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(audio, dtype=np.float32)
    ch, n = x.shape
    out = np.empty(n, dtype=np.float32)
    rc = lib.mono_mix_normalize_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ch, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out[None]
