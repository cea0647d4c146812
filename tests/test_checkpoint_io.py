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


def test_tree_leaves_bf16_roundtrip(tmp_path):
    """np.savez stores ml_dtypes leaves (bf16) as raw void bytes;
    load_pytree_like must reinterpret them through the template's dtype
    (previously raised 'No cast function available' — every serving
    checkpoint is bf16)."""
    from echo_tts_tpu.checkpoints.io import load_pytree_like, save_tree_leaves

    tree = {"w": jnp.asarray(np.arange(6, dtype=np.float32) / 3,
                             jnp.bfloat16),
            "q": {"q": np.arange(4, dtype=np.int8),
                  "s": np.ones(4, np.float32)}}
    p = str(tmp_path / "bf16.npz")
    save_tree_leaves(p, tree)
    back = load_pytree_like(p, tree)
    assert back["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(back["w"], np.float32),
                                  np.asarray(tree["w"], np.float32))
    assert back["q"]["q"].dtype == jnp.int8
    np.testing.assert_array_equal(back["q"]["q"], tree["q"]["q"])


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


def test_train_state_resume(tmp_path):
    """Full params+optimizer-state resume — training continues identically
    after restore (capability the reference lacks, SURVEY.md §5.4)."""
    import jax

    from echo_tts_tpu.checkpoints.io import load_train_state, save_train_state
    from echo_tts_tpu.models.dit import init_dit_params
    from echo_tts_tpu.train.loop import TrainConfig, make_train_step

    cfg = DCFG
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=0, total_steps=10)
    opt, step = make_train_step(cfg, tc, model_dtype=jnp.float32)
    opt_state = opt.init(params)

    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    batch = {
        "latent": jax.random.normal(ks[0], (2, 8, cfg.latent_size)),
        "latent_mask": jnp.ones((2, 8), bool),
        "text_input_ids": jax.random.randint(ks[1], (2, 6), 0, 256),
        "text_mask": jnp.ones((2, 6), bool),
        "speaker_latent": jax.random.normal(ks[2], (2, 8, cfg.latent_size)),
        "speaker_mask": jnp.ones((2, 8), bool),
    }
    params1, opt_state1, _ = step(params, opt_state, jax.random.PRNGKey(2), batch)

    prefix = str(tmp_path / "ck")
    save_train_state(prefix, params1, opt_state1, step=1)
    params_r, opt_state_r, n = load_train_state(prefix, params1, opt_state1)
    assert n == 1

    # continuing from restored state must match continuing from live state
    import numpy as np

    p_a, _, loss_a = step(params1, opt_state1, jax.random.PRNGKey(3), batch)
    p_b, _, loss_b = step(params_r, opt_state_r, jax.random.PRNGKey(3), batch)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    la = jax.tree_util.tree_leaves(p_a)[0]
    lb = jax.tree_util.tree_leaves(p_b)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-7)


def test_orbax_roundtrip(tmp_path):
    """Orbax StandardCheckpointer save/restore of a params pytree
    (SURVEY.md §5.4)."""
    import jax

    from echo_tts_tpu.checkpoints.io import load_orbax, save_orbax
    from echo_tts_tpu.models.dit import init_dit_params

    params = init_dit_params(jax.random.PRNGKey(0), DCFG, dtype=jnp.float32)
    path = str(tmp_path / "ckpt_orbax")
    save_orbax(path, params)
    restored = load_orbax(path, like=params)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_pytree_sharded_onto_mesh(tmp_path):
    """Sharded load across the simulated mesh: leaves land with the TP
    param shardings, values intact (SURVEY.md §5.4)."""
    import jax

    from echo_tts_tpu.checkpoints.io import load_pytree_sharded, save_pytree
    from echo_tts_tpu.models.dit import init_dit_params
    from echo_tts_tpu.parallel.mesh import make_mesh
    from echo_tts_tpu.core.config import MeshConfig

    params = init_dit_params(jax.random.PRNGKey(1), DCFG, dtype=jnp.float32)
    path = str(tmp_path / "p.npz")
    save_pytree(path, params)
    mesh = make_mesh(MeshConfig(dp=4, tp=2))
    sharded = load_pytree_sharded(path, mesh)
    # a TP-sharded leaf: trunk attention wq (L, D, D) splits its last axis
    wq = sharded["blocks"]["attention"]["wq"]
    assert len(wq.sharding.device_set) == 8
    assert not wq.sharding.is_fully_replicated  # actually TP-split, not copied
    np.testing.assert_array_equal(
        np.asarray(wq), np.asarray(params["blocks"]["attention"]["wq"]))


def test_convert_checkpoint_cli(tmp_path):
    """scripts/convert_checkpoint.py end-to-end: tiny torch safetensors ->
    npz pytree, with config inference from checkpoint shapes."""
    import os
    import subprocess
    import sys

    from safetensors.torch import save_file

    tm = build_torch_dit(DCFG, seed=2)
    src = str(tmp_path / "dit.safetensors")
    save_file({k: v.contiguous() for k, v in tm.state_dict().items()}, src)
    dst = str(tmp_path / "dit.npz")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "convert_checkpoint.py"),
         "dit", src, dst, "--dtype", "f32", "--delete-blockwise"],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(dst)

    tree = load_pytree(dst)
    assert "latent_encoder" not in tree
    assert tree["blocks"]["attention"]["wq"].shape == (
        DCFG.num_layers, DCFG.model_size, DCFG.model_size)

def test_load_model_from_hf_monkeypatched(tmp_path, monkeypatch):
    """HF-hub entry points (reference: inference.py:14-135) route repo ids
    through hf_hub_download into the existing converters — exercised here
    with a patched download landing tiny reference-format files in tmp."""
    import huggingface_hub
    from safetensors.torch import save_file
    from safetensors.numpy import save_file as save_np

    from echo_tts_tpu.checkpoints.io import (
        load_fish_ae_from_hf, load_model_from_hf, load_pca_state_from_hf)
    from test_s1dac_parity import build_torch_tiny_ae

    tm = build_torch_dit(DCFG, seed=3)
    dit_p = str(tmp_path / "dit" / "pytorch_model.safetensors")
    (tmp_path / "dit").mkdir()
    save_file({k: v.contiguous() for k, v in tm.state_dict().items()}, dit_p)
    dac = build_torch_tiny_ae(ACFG, seed=4)
    ae_p = str(tmp_path / "ae" / "pytorch_model.safetensors")
    (tmp_path / "ae").mkdir()
    save_file({k: v.contiguous() for k, v in dac.state_dict().items()}, ae_p)
    pca_p = str(tmp_path / "dit" / "pca_state.safetensors")
    save_np({"pca_components": np.eye(8, dtype=np.float32)[:4],
             "pca_mean": np.zeros(8, np.float32),
             "latent_scale": np.asarray(2.5, np.float32)}, pca_p)

    calls = []

    def fake_download(repo_id, filename, token=None):
        calls.append((repo_id, filename, token))
        base = tmp_path / ("dit" if repo_id == "test/dit" else "ae")
        return str(base / filename)

    monkeypatch.setattr(huggingface_hub, "hf_hub_download", fake_download)

    params, cfg = load_model_from_hf("test/dit", dtype=jnp.float32,
                                     delete_blockwise_modules=True)
    assert "latent_encoder" not in params and not cfg.has_latent_modules
    assert params["blocks"]["attention"]["wq"].dtype == jnp.float32

    ae_params, ae_cfg = load_fish_ae_from_hf("test/ae")
    ref_w = dac.encoder.block[0].conv.weight.detach().numpy()
    np.testing.assert_allclose(np.asarray(ae_params["encoder"]["stem"]["w"]),
                               ref_w, atol=1e-6)

    pca = load_pca_state_from_hf("test/dit")
    assert pca.latent_scale == 2.5
    assert calls == [("test/dit", "pytorch_model.safetensors", None),
                     ("test/ae", "pytorch_model.safetensors", None),
                     ("test/dit", "pca_state.safetensors", None)]


def test_hf_download_graceful_without_package(monkeypatch):
    """Zero-egress / package-less environments get a clear error, not an
    ImportError mid-convert."""
    import builtins
    import sys

    import pytest

    from echo_tts_tpu.checkpoints.io import maybe_hf_download

    real_import = builtins.__import__

    def no_hf(name, *a, **k):
        if name == "huggingface_hub":
            raise ImportError("nope")
        return real_import(name, *a, **k)

    monkeypatch.delitem(sys.modules, "huggingface_hub", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_hf)
    with pytest.raises(RuntimeError, match="huggingface_hub is not installed"):
        maybe_hf_download("x/y", "f.safetensors")
