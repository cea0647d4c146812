"""Streamed causal S1-DAC decode == full decode (BASELINE config 4;
reference: README:122-124, gradio_app.py:43 note on chunked decoding)."""
import numpy as np
import pytest

import jax.numpy as jnp

from echo_tts_tpu.core.config import AEConfig
from echo_tts_tpu.checkpoints.convert import convert_ae_state, fold_weight_norm, torch_state_to_numpy
from echo_tts_tpu.models import s1dac

from test_s1dac_parity import build_torch_tiny_ae

ACFG = AEConfig().tiny()


@pytest.fixture(scope="module")
def ae():
    dac = build_torch_tiny_ae(ACFG, seed=11)
    return convert_ae_state(fold_weight_norm(torch_state_to_numpy(dac)), ACFG)


def test_streaming_matches_full(ae):
    import torch

    g = torch.Generator().manual_seed(1)
    t = 40
    z_q = torch.randn(1, ACFG.latent_dim, t, generator=g).numpy() * 0.3
    z_q = jnp.asarray(z_q)

    full = np.asarray(s1dac.decode_zq(ae, ACFG, z_q))
    chunks = list(s1dac.decode_zq_streaming(ae, ACFG, z_q, chunk_frames=8,
                                            context_frames=24))
    streamed = np.concatenate([np.asarray(c) for c in chunks], axis=-1)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=1e-5, rtol=1e-4)


def test_streaming_small_context_differs(ae):
    """Sanity: with context << receptive field the tail should deviate,
    proving the context actually matters (guards against a trivially-passing
    test)."""
    import torch

    g = torch.Generator().manual_seed(2)
    z_q = jnp.asarray(torch.randn(1, ACFG.latent_dim, 40, generator=g).numpy())
    full = np.asarray(s1dac.decode_zq(ae, ACFG, z_q))
    chunks = list(s1dac.decode_zq_streaming(ae, ACFG, z_q, chunk_frames=8,
                                            context_frames=1))
    streamed = np.concatenate([np.asarray(c) for c in chunks], axis=-1)
    assert not np.allclose(streamed, full, atol=1e-5)


def test_stateful_streaming_matches_full(ae):
    """Carried-state streaming decode (KV window + per-stage conv tails)
    equals the full decode — including the sequence start (zero tails ==
    causal left-pads) and a final partial chunk (right-pad + crop)."""
    import torch

    g = torch.Generator().manual_seed(3)
    t = 44  # not a multiple of chunk_frames: exercises the padded last chunk
    z_q = jnp.asarray(torch.randn(1, ACFG.latent_dim, t, generator=g).numpy() * 0.3)

    full = np.asarray(s1dac.decode_zq(ae, ACFG, z_q))
    chunks = list(s1dac.decode_zq_streaming_stateful(ae, ACFG, z_q,
                                                     chunk_frames=8))
    streamed = np.concatenate([np.asarray(c) for c in chunks], axis=-1)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=2e-5, rtol=1e-4)


def _with_perturbed_res_biases(params, seed=0):
    """Copy of the AE params with NONZERO residual-unit conv biases.

    The tiny torch init zero-inits conv biases, making the streaming
    zero_below semantics unobservable (unit(0) == 0) — which masked a real
    kernel-coordinate bug in round 3. Every chain-stream test must run with
    biases that make unit(0) != 0."""
    import copy

    params = copy.deepcopy(params)
    rng = np.random.default_rng(seed)

    def bump(conv):
        b = conv.get("b")
        if b is None:
            b = np.zeros(conv["w"].shape[0], np.float32)
        conv["b"] = jnp.asarray(
            np.asarray(b) + 0.3 * rng.standard_normal(np.asarray(b).shape)
        ).astype(jnp.float32)

    for section in ("decoder", "encoder"):
        for blk in params[section]["blocks"]:
            for unit in blk["res_units"]:
                bump(unit["conv1"])
                bump(unit["conv2"])
    return params


def test_stateful_streaming_matches_full_pallas_interpret(ae):
    """Same equality through the Pallas res-chain kernel (interpret mode)
    with PERTURBED (nonzero) residual-unit biases, calling the step
    UNJITTED: exercises the kernel's zero_below streaming semantics for
    real — tail rows re-zeroed per unit at the stream start, live
    mid-stream. (The jitted wrapper's cache key excludes the conv-impl
    global, and zero biases make the semantics unobservable; both masked a
    real bug once.)"""
    import torch

    pert = _with_perturbed_res_biases(ae, seed=4)
    g = torch.Generator().manual_seed(4)
    z_q = jnp.asarray(torch.randn(1, ACFG.latent_dim, 24, generator=g).numpy() * 0.3)

    s1dac.set_conv_impl("xla")
    try:
        full = np.asarray(s1dac.decode_zq(pert, ACFG, z_q))  # eager, XLA truth
        s1dac.set_conv_impl("pallas_interpret")
        state = s1dac.streaming_decode_init(pert, ACFG, 1, dtype=z_q.dtype)
        chunks = []
        for start in range(0, z_q.shape[-1], 8):
            audio, state = s1dac.decode_zq_stream_step(  # UNJITTED on purpose
                pert, ACFG, state, z_q[:, :, start:start + 8], 1024)
            chunks.append(np.asarray(audio))
    finally:
        s1dac.set_conv_impl("auto")
    streamed = np.concatenate(chunks, axis=-1)
    np.testing.assert_allclose(streamed, full, atol=2e-5, rtol=1e-4)


def test_stateful_streaming_xla_perturbed_biases(ae):
    """The XLA streaming fallback under the same nonzero-bias regime (its
    per-unit re-zero mirrors the kernel's)."""
    import torch

    pert = _with_perturbed_res_biases(ae, seed=5)
    g = torch.Generator().manual_seed(5)
    z_q = jnp.asarray(torch.randn(1, ACFG.latent_dim, 24, generator=g).numpy() * 0.3)
    full = np.asarray(s1dac.decode_zq(pert, ACFG, z_q))
    state = s1dac.streaming_decode_init(pert, ACFG, 1, dtype=z_q.dtype)
    chunks = []
    for start in range(0, 24, 8):
        audio, state = s1dac.decode_zq_stream_step(
            pert, ACFG, state, z_q[:, :, start:start + 8], 1024)
        chunks.append(np.asarray(audio))
    np.testing.assert_allclose(np.concatenate(chunks, axis=-1), full,
                               atol=2e-5, rtol=1e-4)


def test_stateful_streaming_chunk_invariance(ae):
    """Different chunkings produce identical audio (state carries the exact
    context, so chunk boundaries cannot matter)."""
    import torch

    g = torch.Generator().manual_seed(5)
    z_q = jnp.asarray(torch.randn(1, ACFG.latent_dim, 32, generator=g).numpy() * 0.3)
    a = np.concatenate([np.asarray(c) for c in
                        s1dac.decode_zq_streaming_stateful(ae, ACFG, z_q, 4)],
                       axis=-1)
    b = np.concatenate([np.asarray(c) for c in
                        s1dac.decode_zq_streaming_stateful(ae, ACFG, z_q, 16)],
                       axis=-1)
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)
