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


def test_stateful_streaming_matches_full_pallas_interpret(ae):
    """Same equality through the Pallas res-chain kernel (interpret mode):
    exercises the kernel's zero_below streaming semantics — tail rows
    re-zeroed per unit at the stream start, live mid-stream."""
    import torch

    g = torch.Generator().manual_seed(4)
    z_q = jnp.asarray(torch.randn(1, ACFG.latent_dim, 24, generator=g).numpy() * 0.3)

    s1dac.set_conv_impl("pallas_interpret")
    try:
        full = np.asarray(s1dac.decode_zq(ae, ACFG, z_q))
        chunks = list(s1dac.decode_zq_streaming_stateful(ae, ACFG, z_q,
                                                         chunk_frames=8))
    finally:
        s1dac.set_conv_impl("auto")
    streamed = np.concatenate([np.asarray(c) for c in chunks], axis=-1)
    np.testing.assert_allclose(streamed, full, atol=2e-5, rtol=1e-4)


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
