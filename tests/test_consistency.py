"""Cross-path consistency: blockwise [N] vs one-shot sampling (SURVEY.md §4
item 5), multihost feeding helpers, kill-a-host bookkeeping."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.core.config import DiTConfig, MeshConfig, SamplerConfig
from echo_tts_tpu.models.dit import init_dit_params
from echo_tts_tpu.parallel.mesh import make_mesh
from echo_tts_tpu.parallel.multihost import HostHealth, feed_process_local_batch
from echo_tts_tpu.sampling.blockwise import (
    sample_blockwise_euler_cfg_independent_guidances,
)
from echo_tts_tpu.sampling.euler_cfg import sample_euler_cfg_independent_guidances

CFG = DiTConfig().tiny()


def test_blockwise_single_block_close_to_oneshot():
    """blocks=[N] with the latent modules present ≈ one-shot: the only
    difference is the latent-prefix KV, whose keys are all masked
    (latent_pos < start_pos=0 is empty), so outputs should agree closely."""
    key = jax.random.PRNGKey(0)
    params = init_dit_params(key, CFG, dtype=jnp.float32)
    B, T, SPK, SEQ = 1, 10, 8, 16
    ks = jax.random.split(key, 4)
    ids = jax.random.randint(ks[0], (B, T), 0, 256)
    tmask = jnp.ones((B, T), bool)
    spk = jax.random.normal(ks[1], (B, SPK, CFG.latent_size))
    smask = jnp.ones((B, SPK), bool)
    noise = jax.random.normal(ks[2], (B, SEQ, CFG.latent_size))
    sc = SamplerConfig(num_steps=3, sequence_length=SEQ, truncation_factor=0.8)

    oneshot = sample_euler_cfg_independent_guidances(
        params, CFG, sc, spk, smask, ids, tmask, noise, model_dtype=jnp.float32)
    blockwise = sample_blockwise_euler_cfg_independent_guidances(
        params, CFG, sc, spk, smask, ids, tmask, [SEQ], noises=[noise],
        model_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(blockwise), np.asarray(oneshot),
                               atol=1e-4, rtol=1e-3)


def test_feed_process_local_batch():
    mesh = make_mesh(MeshConfig(dp=4, tp=1))
    batch = {"a": np.arange(8, dtype=np.float32).reshape(4, 2)}
    out = feed_process_local_batch(mesh, batch)
    assert out["a"].sharding.spec == jax.sharding.PartitionSpec("dp", None)
    np.testing.assert_array_equal(np.asarray(out["a"]), batch["a"])


def test_host_health_staleness(monkeypatch):
    import echo_tts_tpu.parallel.multihost as mh

    clock = {"t": 0.0}
    monkeypatch.setattr(mh.time, "monotonic", lambda: clock["t"])
    hh = HostHealth(stale_after_s=10)
    hh.beat(0)
    hh.beat(1)
    clock["t"] = 5
    hh.beat(1)
    clock["t"] = 12
    assert hh.stale_hosts() == [0]
