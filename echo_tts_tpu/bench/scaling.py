"""Weak-scaling harness (BASELINE config 5): N utterances data-parallel over
a dp mesh; psum-free sampling means efficiency loss is input-feed + straggler
variance only (target >=0.85, SURVEY.md §7.3 item 6).

Runs on real devices or the CPU-simulated mesh (CI). Per-host input feeding
uses jax.make_array_from_process_local_data on the dp axis when multi-host.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding

from echo_tts_tpu.core.config import DiTConfig, MeshConfig, SamplerConfig
from echo_tts_tpu.models.dit import init_dit_params
from echo_tts_tpu.parallel.mesh import make_mesh
from echo_tts_tpu.parallel.sharding import batch_pspec
from echo_tts_tpu.sampling.euler_cfg import sample_euler_cfg_independent_guidances


def run_weak_scaling(
    cfg: Optional[DiTConfig] = None,
    sc: Optional[SamplerConfig] = None,
    utterances_per_device: int = 1,
    max_devices: Optional[int] = None,
    model_dtype=jnp.float32,
    text_len: int = 32,
    speaker_len: int = 16,
    repeats: int = 2,
) -> dict:
    """Times batched sampling at dp=1 and dp=N; returns throughput and
    weak-scaling efficiency (per-device throughput ratio)."""
    cfg = cfg or DiTConfig().tiny()
    sc = sc or SamplerConfig(num_steps=2, sequence_length=16, truncation_factor=0.8)
    n_dev = max_devices or len(jax.devices())

    key = jax.random.PRNGKey(0)
    params = init_dit_params(key, cfg, dtype=model_dtype)

    def run(dp: int) -> float:
        mesh = make_mesh(MeshConfig(dp=dp, tp=1))
        b = dp * utterances_per_device
        ks = jax.random.split(key, 4)
        put = lambda a: jax.device_put(a, NamedSharding(mesh, batch_pspec(a.ndim)))
        ids = put(jax.random.randint(ks[0], (b, text_len), 0, 256))
        tmask = put(jnp.ones((b, text_len), bool))
        spk = put(jax.random.normal(ks[1], (b, speaker_len, cfg.latent_size)))
        smask = put(jnp.ones((b, speaker_len), bool))
        noise = put(jax.random.normal(ks[2], (b, sc.sequence_length, cfg.latent_size)))

        def go():
            out = sample_euler_cfg_independent_guidances(
                params, cfg, sc, spk, smask, ids, tmask, noise,
                model_dtype=model_dtype)
            out.block_until_ready()

        go()  # compile
        t0 = time.perf_counter()
        for _ in range(repeats):
            go()
        return (time.perf_counter() - t0) / repeats

    t1 = run(1)
    tn = run(n_dev)
    thr1 = utterances_per_device / t1
    thrn = n_dev * utterances_per_device / tn
    eff = (thrn / n_dev) / thr1
    return {"devices": n_dev, "t_dp1_s": t1, "t_dpN_s": tn,
            "utt_per_s_dp1": thr1, "utt_per_s_dpN": thrn,
            "weak_scaling_efficiency": eff}


if __name__ == "__main__":
    import json

    print(json.dumps(run_weak_scaling(), indent=2))
