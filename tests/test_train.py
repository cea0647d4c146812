"""Training-path tests: loss parity vs the reference (noise/t injected,
double-normalization bug fixed — SURVEY.md §7.4), LoRA identity-at-init and
learning progress, checkpoint round-trip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.core.config import DiTConfig
from echo_tts_tpu.checkpoints.convert import convert_dit_state, torch_state_to_numpy
from echo_tts_tpu.models.dit import dit_forward, get_kv_cache_speaker, get_kv_cache_text
from echo_tts_tpu.train.loop import TrainConfig, make_train_step
from echo_tts_tpu.train.lora import (
    LoRAConfig,
    apply_lora,
    init_lora,
    load_lora_checkpoint,
    save_lora_checkpoint,
)
from echo_tts_tpu.train.loss import compute_diffusion_loss

from ref_utils import build_torch_dit

CFG = DiTConfig().tiny()


@pytest.fixture(scope="module")
def setup():
    import torch

    tm = build_torch_dit(CFG, seed=8)
    params = convert_dit_state(torch_state_to_numpy(tm), CFG)
    g = torch.Generator().manual_seed(40)
    B, T, TXT, SPK = 2, 12, 10, 8
    batch = {
        "latent": torch.randn(B, T, CFG.latent_size, generator=g),
        "latent_mask": torch.ones(B, T, dtype=torch.bool),
        "text_input_ids": torch.randint(0, 256, (B, TXT), generator=g),
        "text_mask": torch.ones(B, TXT, dtype=torch.bool),
        "speaker_latent": torch.randn(B, SPK, CFG.latent_size, generator=g),
        "speaker_mask": torch.ones(B, SPK, dtype=torch.bool),
    }
    batch["latent_mask"][1, 9:] = False
    return tm, params, batch


def test_loss_parity_vs_reference(setup):
    """Inject t and noise; reference normalizes twice (train_utils.py:356,364)
    so its loss equals ours / num_valid — compare accordingly."""
    import torch

    tm, params, batch = setup
    sys_mod = __import__("sys")
    sys_mod.path.insert(0, "/root/reference")
    from ref_utils import load_reference_inference_module

    load_reference_inference_module()
    import train_utils as ref_tu

    g = torch.Generator().manual_seed(41)
    B, T = batch["latent"].shape[:2]
    t = torch.rand(B, generator=g) ** 2.0
    noise = torch.randn_like(batch["latent"])

    # reference loss with the same t/noise: monkeypatch torch.rand/randn_like
    orig_rand, orig_randn_like = torch.rand, torch.randn_like
    torch.rand = lambda *a, **k: t.clone()
    torch.randn_like = lambda *a, **k: noise.clone()
    try:
        with torch.no_grad():
            ref_loss = ref_tu.compute_diffusion_loss(
                tm, batch["latent"], batch["latent_mask"],
                batch["text_input_ids"], batch["text_mask"],
                batch["speaker_latent"], batch["speaker_mask"]).item()
    finally:
        torch.rand, torch.randn_like = orig_rand, orig_randn_like

    loss = compute_diffusion_loss(
        params, CFG, jax.random.PRNGKey(0),
        jnp.asarray(batch["latent"].numpy()),
        jnp.asarray(batch["latent_mask"].numpy()),
        jnp.asarray(batch["text_input_ids"].numpy()),
        jnp.asarray(batch["text_mask"].numpy()),
        jnp.asarray(batch["speaker_latent"].numpy()),
        jnp.asarray(batch["speaker_mask"].numpy()),
        model_dtype=jnp.float32,
        t=jnp.asarray(t.numpy()), noise=jnp.asarray(noise.numpy()))

    num_valid = float(batch["latent_mask"].sum() * CFG.latent_size)
    # ours == ref * num_valid (we fixed the double normalization)
    np.testing.assert_allclose(float(loss), ref_loss * num_valid, rtol=2e-3)


def test_lora_identity_at_init(setup):
    _, params, batch = setup
    lc = LoRAConfig(rank=4)
    lora = init_lora(jax.random.PRNGKey(0), params, lc)
    eff = apply_lora(params, lora, lc)

    ids = jnp.asarray(batch["text_input_ids"].numpy())
    tmask = jnp.asarray(batch["text_mask"].numpy())
    smask = jnp.asarray(batch["speaker_mask"].numpy())
    spk = jnp.asarray(batch["speaker_latent"].numpy())
    x = jnp.asarray(batch["latent"].numpy())
    t = jnp.full((x.shape[0],), 0.5)

    for p in (params, eff):
        kvt = get_kv_cache_text(p, CFG, ids, tmask)
        kvs = get_kv_cache_speaker(p, CFG, spk)
        out = dit_forward(p, CFG, x, t, tmask, smask, kvt, kvs)
        if p is params:
            base_out = out
    np.testing.assert_allclose(np.asarray(out), np.asarray(base_out), atol=1e-6)


def test_lora_training_reduces_loss(setup):
    _, params, batch = setup
    lc = LoRAConfig(rank=4)
    tc = TrainConfig(learning_rate=2e-2, warmup_steps=2, total_steps=30)
    lora = init_lora(jax.random.PRNGKey(1), params, lc)
    opt, step = make_train_step(CFG, tc, model_dtype=jnp.float32, lora_cfg=lc)
    opt_state = opt.init(lora)

    jb = {k: jnp.asarray(v.numpy()) for k, v in batch.items()}
    losses = []
    rng = jax.random.PRNGKey(2)
    for i in range(15):
        # fixed data/rng -> loss should drop as adapters fit the batch
        lora, opt_state, loss = step(params, lora, opt_state,
                                     jax.random.PRNGKey(7), jb)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_full_train_step_runs(setup):
    _, params, batch = setup
    tc = TrainConfig(learning_rate=1e-4, warmup_steps=0, total_steps=10)
    opt, step = make_train_step(CFG, tc, model_dtype=jnp.float32)
    opt_state = opt.init(params)
    jb = {k: jnp.asarray(v.numpy()) for k, v in batch.items()}
    params2, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(3), jb)
    assert np.isfinite(float(loss))
    # some parameter must have moved
    delta = sum(float(jnp.sum(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(params),
                                jax.tree_util.tree_leaves(params2)))
    assert delta > 0.0


def test_lora_checkpoint_roundtrip(tmp_path, setup):
    _, params, _ = setup
    lc = LoRAConfig(rank=4)
    lora = init_lora(jax.random.PRNGKey(5), params, lc)
    path = str(tmp_path / "lora.npz")
    save_lora_checkpoint(path, lora, lc)
    lora2, lc2 = load_lora_checkpoint(path)
    assert lc2.rank == lc.rank and lc2.alpha == lc.alpha
    for tgt in lora:
        np.testing.assert_allclose(np.asarray(lora[tgt]["a"]),
                                   np.asarray(lora2[tgt]["a"]), atol=1e-7)


def test_trainable_pallas_attention_grads_match_xla(setup):
    """The custom-VJP attention (Pallas fwd + bwd kernels) must produce the
    same loss and gradients as the plain XLA path (interpret mode on CPU)."""
    from echo_tts_tpu.models import dit as dit_mod

    tm, params, batch_t = setup
    batch = {k: jnp.asarray(v.numpy()) for k, v in batch_t.items()}
    rng = jax.random.PRNGKey(3)
    t = jnp.full((batch["latent"].shape[0],), 0.4, jnp.float32)
    noise = jax.random.normal(jax.random.fold_in(rng, 1),
                              batch["latent"].shape, jnp.float32)

    def loss_fn(p):
        return compute_diffusion_loss(
            p, CFG, rng, batch["latent"], batch["latent_mask"],
            batch["text_input_ids"], batch["text_mask"],
            batch["speaker_latent"], batch["speaker_mask"],
            model_dtype=jnp.float32, t=t, noise=noise)

    dit_mod.set_attention_impl("xla")
    try:
        l_ref, g_ref = jax.value_and_grad(loss_fn)(params)
    finally:
        dit_mod.set_attention_impl("auto")

    dit_mod.set_attention_impl("pallas_vjp_interpret")
    try:
        l_new, g_new = jax.value_and_grad(loss_fn)(params)
    finally:
        dit_mod.set_attention_impl("auto")

    np.testing.assert_allclose(float(l_new), float(l_ref), atol=1e-5, rtol=1e-5)
    leaves_ref = jax.tree_util.tree_leaves(g_ref)
    leaves_new = jax.tree_util.tree_leaves(g_new)
    assert len(leaves_ref) == len(leaves_new)
    for a, b in zip(leaves_ref, leaves_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-3)
