"""Checkpoint I/O tests: npz pytree round-trip and the full safetensors ->
converted-pytree load path (weight-norm folding included)."""
import numpy as np

import jax.numpy as jnp

from echo_tts_tpu.core.config import AEConfig, DiTConfig
from echo_tts_tpu.checkpoints.io import (
    load_ae_from_safetensors,
    load_dit_from_safetensors,
    load_pytree,
    save_pytree,
)

from ref_utils import build_torch_dit
from test_s1dac_parity import build_torch_tiny_ae

DCFG = DiTConfig().tiny()
ACFG = AEConfig().tiny()


def test_npz_pytree_roundtrip(tmp_path):
    tree = {"a": {"b": np.arange(6).reshape(2, 3).astype(np.float32)},
            "list": [np.ones(2), {"x": np.zeros(3)}]}
    p = str(tmp_path / "t.npz")
    save_pytree(p, tree)
    back = load_pytree(p)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["list"][1]["x"], tree["list"][1]["x"])
    assert isinstance(back["list"], list)


def test_load_dit_from_safetensors(tmp_path):
    from safetensors.torch import save_file

    tm = build_torch_dit(DCFG, seed=1)
    p = str(tmp_path / "dit.safetensors")
    save_file({k: v.contiguous() for k, v in tm.state_dict().items()}, p)

    params, cfg = load_dit_from_safetensors(p, cfg=DCFG, dtype=jnp.float32)
    assert params["blocks"]["attention"]["wq"].shape == (
        DCFG.num_layers, DCFG.model_size, DCFG.model_size)
    assert "latent_encoder" in params

    params2, cfg2 = load_dit_from_safetensors(
        p, cfg=DCFG, dtype=jnp.float32, delete_blockwise_modules=True)
    assert "latent_encoder" not in params2
    assert "wk_latent" not in params2["blocks"]["attention"]
    assert not cfg2.has_latent_modules


def test_load_ae_from_safetensors(tmp_path):
    import torch
    from safetensors.torch import save_file

    dac = build_torch_tiny_ae(ACFG, seed=2)
    p = str(tmp_path / "ae.safetensors")
    save_file({k: v.contiguous() for k, v in dac.state_dict().items()}, p)

    params, cfg = load_ae_from_safetensors(p, cfg=ACFG)
    # weight-norm folded: effective stem weight matches torch's materialized one
    ref_w = dac.encoder.block[0].conv.weight.detach().numpy()
    np.testing.assert_allclose(np.asarray(params["encoder"]["stem"]["w"]),
                               ref_w, atol=1e-6)
