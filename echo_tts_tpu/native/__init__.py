"""Native (C++) host-side components, loaded via ctypes.

Build once with `python -m echo_tts_tpu.native.build` (or let `load()` build
lazily when a compiler is present). Python falls back to scipy when the
shared object is unavailable, so the native path is an acceleration, not a
hard dependency.
"""
from echo_tts_tpu.native.build import build, load  # noqa: F401
