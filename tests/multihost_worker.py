"""Worker for the real 2-process distributed test (SURVEY.md §5.3/§5.8).

Each process runs `jax.distributed.initialize` against a localhost
coordinator on the CPU backend, builds a 2-host dp mesh, and drives the
`process_count() > 1` branches of parallel/multihost.py:
`feed_process_local_batch` (jax.make_array_from_process_local_data),
`barrier` (sync_global_devices), and a dp=2 identity check — each host
feeds its own rows and the globally-assembled computation must equal the
host-local math.

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>
Prints "MULTIHOST_OK <pid>" on success and exits 0.
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh

    from echo_tts_tpu.core.config import DiTConfig, SamplerConfig
    from echo_tts_tpu.models.dit import init_dit_params
    from echo_tts_tpu.parallel.multihost import barrier, feed_process_local_batch
    from echo_tts_tpu.sampling.euler_cfg import (
        draw_noise,
        sample_euler_cfg_independent_guidances,
    )

    devs = np.array(jax.devices()[:nproc]).reshape(nproc, 1)
    mesh = Mesh(devs, ("dp", "tp"))

    # REAL dp=2 sampling identity (SURVEY §4 item 4 / VERDICT r2 item 3):
    # both processes build identical tiny params by seed; each host feeds
    # ITS OWN utterance row; the globally-sharded sample must equal the
    # single-host batched reference each process computes locally.
    cfg = DiTConfig().tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sc = SamplerConfig(num_steps=2, sequence_length=8, truncation_factor=0.8)
    B, T, SPK = nproc, 12, 8

    def row(i, arr):
        return np.asarray(arr[i : i + 1])

    key = jax.random.PRNGKey(42)
    ks = jax.random.split(key, 3)
    ids_all = np.asarray(jax.random.randint(ks[0], (B, T), 0, 256))
    tmask_all = np.ones((B, T), bool)
    spk_all = np.asarray(jax.random.normal(ks[1], (B, SPK, cfg.latent_size)),
                         np.float32)
    smask_all = np.ones((B, SPK), bool)
    noise_all = np.asarray(draw_noise(7, (B, sc.sequence_length,
                                          cfg.latent_size)))

    local = {"ids": row(pid, ids_all), "tmask": row(pid, tmask_all),
             "spk": row(pid, spk_all), "smask": row(pid, smask_all),
             "noise": row(pid, noise_all)}
    g = feed_process_local_batch(mesh, local)
    assert g["ids"].shape == (B, T), g["ids"].shape
    assert not g["ids"].is_fully_addressable  # really distributed

    with mesh:
        out = sample_euler_cfg_independent_guidances(
            params, cfg, sc, g["spk"], g["smask"], g["ids"], g["tmask"],
            g["noise"], model_dtype=jnp.float32)
    gathered = np.asarray(multihost_utils.process_allgather(out, tiled=True))

    # single-host reference computed INDEPENDENTLY by each process
    ref = np.asarray(sample_euler_cfg_independent_guidances(
        params, cfg, sc, jnp.asarray(spk_all), jnp.asarray(smask_all),
        jnp.asarray(ids_all), jnp.asarray(tmask_all), jnp.asarray(noise_all),
        model_dtype=jnp.float32))
    np.testing.assert_allclose(gathered, ref, atol=2e-5, rtol=1e-4)

    barrier("test-end")  # exercises sync_global_devices
    print(f"MULTIHOST_OK {pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
