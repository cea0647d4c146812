"""Test config: force CPU backend with a simulated 8-device mesh so DP/TP
sharding tests run without TPUs (SURVEY.md §4 item 4)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# The image pins JAX_PLATFORMS=axon (TPU tunnel) and registers the backend in
# sitecustomize, so a hard override + config.update is required — tests must
# run on the simulated-CPU mesh with true-fp32 matmuls.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_executable_population():
    """XLA:CPU segfaults (or SIGABRTs) inside backend_compile once several
    hundred compiled executables accumulate in ONE process: reproduced twice
    at the identical suite position (test_serve micro-batching, ~test 136 of
    173, 2026-08-21) while the same tests pass in any smaller grouping.
    Dropping jax's compiled-executable caches at each module boundary keeps
    the per-process population bounded at one module's worth; cross-module
    recompiles of the shared tiny-model executables cost a few minutes over
    the full suite."""
    yield
    jax.clear_caches()
