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

    from jax.experimental import multihost_utils
    from jax.sharding import Mesh

    from echo_tts_tpu.parallel.multihost import barrier, feed_process_local_batch

    devs = np.array(jax.devices()[:nproc]).reshape(nproc, 1)
    mesh = Mesh(devs, ("dp", "tp"))

    # per-host local rows -> global dp-sharded arrays
    local = {"x": np.full((1, 4), float(pid), np.float32),
             "mask": np.ones((1, 4), bool)}
    g = feed_process_local_batch(mesh, local)
    assert g["x"].shape == (nproc, 4), g["x"].shape
    assert not g["x"].is_fully_addressable  # really distributed

    # dp identity: row p of the global computation == the host-local math
    y = jax.jit(lambda t: t["x"] * 2.0 + jnp_where_mask(t))(g)
    gathered = multihost_utils.process_allgather(y, tiled=True)
    expect = np.stack([np.full((4,), 2.0 * p + 1.0) for p in range(nproc)])
    np.testing.assert_allclose(np.asarray(gathered), expect)

    barrier("test-end")  # exercises sync_global_devices
    print(f"MULTIHOST_OK {pid}", flush=True)
    return 0


def jnp_where_mask(t):
    import jax.numpy as jnp

    return jnp.where(t["mask"], 1.0, 0.0)


if __name__ == "__main__":
    sys.exit(main())
