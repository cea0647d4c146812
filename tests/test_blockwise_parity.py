"""Noise-injected parity of the blockwise/continuation sampler vs the
reference (reference: inference_blockwise.py), tiny model, fp32 CPU."""
import numpy as np
import pytest

import jax.numpy as jnp

from echo_tts_tpu.core.config import DiTConfig, SamplerConfig
from echo_tts_tpu.checkpoints.convert import convert_dit_state, torch_state_to_numpy
from echo_tts_tpu.sampling.blockwise import (
    sample_blockwise_euler_cfg_independent_guidances,
)

from ref_utils import build_torch_dit

CFG = DiTConfig().tiny()


@pytest.fixture(scope="module")
def setup():
    import sys
    import torch

    sys.path.insert(0, "/root/reference")
    from ref_utils import load_reference_inference_module

    load_reference_inference_module()  # pre-stub deps for inference imports
    import inference_blockwise as ref_bw

    tm = build_torch_dit(CFG, seed=4)
    params = convert_dit_state(torch_state_to_numpy(tm), CFG)

    g = torch.Generator().manual_seed(21)
    B, T, SPK = 1, 10, 8
    ids = torch.randint(0, 256, (B, T), generator=g)
    text_mask = torch.ones(B, T, dtype=torch.bool)
    spk = torch.randn(B, SPK, CFG.latent_size, generator=g)
    spk_mask = torch.ones(B, SPK, dtype=torch.bool)
    return tm, params, ref_bw, ids, text_mask, spk, spk_mask


def _torch_noises(seed, block_sizes, latent):
    """Reproduce the reference's sequential per-block randn draws
    (inference_blockwise.py:42,76)."""
    import torch

    gen = torch.Generator(device="cpu").manual_seed(seed)
    out = []
    for bs in block_sizes:
        out.append(torch.randn((1, bs, latent), dtype=torch.float32,
                               generator=gen).numpy())
    return out


@pytest.mark.parametrize("continuation", [False, True])
def test_blockwise_parity(setup, continuation):
    import torch

    tm, params, ref_bw, ids, text_mask, spk, spk_mask = setup
    sc = SamplerConfig(num_steps=4, cfg_scale_text=3.0, cfg_scale_speaker=5.0,
                       cfg_min_t=0.5, cfg_max_t=1.0, truncation_factor=0.8,
                       rescale_k=1.2, rescale_sigma=3.0)
    block_sizes = [8, 4]
    seed = 9

    cont = None
    if continuation:
        g = torch.Generator().manual_seed(33)
        cont = torch.randn(1, 8, CFG.latent_size, generator=g)

    with torch.no_grad():
        ref = ref_bw.sample_blockwise_euler_cfg_independent_guidances(
            model=tm, speaker_latent=spk, speaker_mask=spk_mask,
            text_input_ids=ids, text_mask=text_mask, rng_seed=seed,
            block_sizes=block_sizes, num_steps=sc.num_steps,
            cfg_scale_text=sc.cfg_scale_text,
            cfg_scale_speaker=sc.cfg_scale_speaker,
            cfg_min_t=sc.cfg_min_t, cfg_max_t=sc.cfg_max_t,
            truncation_factor=sc.truncation_factor,
            rescale_k=sc.rescale_k, rescale_sigma=sc.rescale_sigma,
            speaker_kv_scale=None, speaker_kv_max_layers=None,
            speaker_kv_min_t=None,
            continuation_latent=cont,
        ).numpy()

    noises = _torch_noises(seed, block_sizes, CFG.latent_size)
    out = sample_blockwise_euler_cfg_independent_guidances(
        params, CFG, sc,
        jnp.asarray(spk.numpy()), jnp.asarray(spk_mask.numpy()),
        jnp.asarray(ids.numpy()), jnp.asarray(text_mask.numpy()),
        block_sizes, noises=noises,
        continuation_latent=None if cont is None else jnp.asarray(cont.numpy()),
        model_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)
