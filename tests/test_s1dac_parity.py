"""Parity of the JAX S1-DAC vs the PyTorch reference on a tiny
structurally-identical causal build (reference: autoencoder.py:1144-1192
wiring), fp32 CPU. Covers causal conv pad math, weight-norm folding,
transposed-conv unpadding, RVQ code selection and the quantizer transformers
(SURVEY.md §4 item 2, §7.3 item 3)."""
import numpy as np
import pytest

import jax.numpy as jnp

from echo_tts_tpu.core.config import AEConfig
from echo_tts_tpu.checkpoints.convert import (
    convert_ae_state,
    fold_weight_norm,
    torch_state_to_numpy,
)
from echo_tts_tpu.models import s1dac

CFG = AEConfig().tiny()


def build_torch_tiny_ae(cfg: AEConfig, seed=0):
    """Mirror build_ae's wiring (reference: autoencoder.py:1144-1192) at tiny
    scale."""
    import torch

    from ref_utils import load_reference_autoencoder_module

    ae = load_reference_autoencoder_module()
    torch.manual_seed(seed)

    q_config = ae.ModelArgs(
        block_size=4096, n_layer=cfg.q_n_layer, n_head=cfg.q_n_head,
        dim=cfg.q_dim, intermediate_size=cfg.q_intermediate_size,
        head_dim=cfg.q_head_dim, norm_eps=cfg.norm_eps,
        dropout_rate=0.0, attn_dropout_rate=0.0, channels_first=True)

    def make_transformer():
        return ae.WindowLimitedTransformer(
            causal=True, window_size=cfg.q_window_size, input_dim=cfg.latent_dim,
            config=q_config)

    quantizer = ae.DownsampleResidualVectorQuantize(
        input_dim=cfg.latent_dim, n_codebooks=cfg.n_codebooks,
        codebook_size=cfg.codebook_size, codebook_dim=cfg.codebook_dim,
        quantizer_dropout=0.0, downsample_factor=cfg.downsample_factor,
        semantic_codebook_size=cfg.semantic_codebook_size,
        pre_module=make_transformer(), post_module=make_transformer())

    def transformer_general_config(**kw):
        return ae.ModelArgs(
            block_size=kw.get("block_size", 16384),
            n_layer=kw.get("n_layer", 8), n_head=kw.get("n_head", 8),
            dim=kw.get("dim", 512),
            intermediate_size=kw.get("intermediate_size", 1536),
            head_dim=kw.get("head_dim", 64),
            norm_eps=kw.get("norm_eps", 1e-5),
            dropout_rate=0.0, attn_dropout_rate=0.0,
            channels_first=kw.get("channels_first", True))

    dac = ae.DAC(
        encoder_dim=cfg.encoder_dim, encoder_rates=list(cfg.encoder_rates),
        latent_dim=cfg.latent_dim, decoder_dim=cfg.decoder_dim,
        decoder_rates=list(cfg.decoder_rates), quantizer=quantizer,
        sample_rate=cfg.sample_rate, causal=True,
        encoder_transformer_layers=list(cfg.encoder_transformer_layers),
        decoder_transformer_layers=list(cfg.decoder_transformer_layers),
        transformer_general_config=transformer_general_config)

    # randomize codebooks wider apart to avoid argmax ties in parity checks
    with torch.no_grad():
        for m in dac.modules():
            if isinstance(m, torch.nn.Embedding):
                m.weight.copy_(torch.randn_like(m.weight))
    return dac.eval()


@pytest.fixture(scope="module")
def setup():
    import torch

    dac = build_torch_tiny_ae(CFG, seed=2)
    state = fold_weight_norm(torch_state_to_numpy(dac))
    params = convert_ae_state(state, CFG)
    g = torch.Generator().manual_seed(5)
    audio = (0.5 * torch.randn(2, 1, 3 * CFG.frame_length + 7, generator=g)).clamp(-1, 1)
    return dac, params, audio


def test_encode_codes_parity(setup):
    import torch

    dac, params, audio = setup
    with torch.no_grad():
        ref_codes, _ = dac.encode(audio)
    codes = s1dac.encode_codes(params, CFG, jnp.asarray(audio.numpy()))
    np.testing.assert_array_equal(np.asarray(codes), ref_codes.numpy())


def test_encode_bf16_ae_accepts_fp32_audio(setup):
    """The bf16 low-VRAM AE (reference gradio_app.py:36-38) must encode
    fp32 request audio: encode_codes casts to the params dtype at entry
    (pre-fix this crashed in conv_general_dilated — caught on the real
    serving path by the r5 bring-up run, since only fp32 AEs had ever
    encoded). Codes must agree with the fp32 encode for a comfortable
    majority of frames (bf16 rounding can flip a nearest-codebook tie)."""
    import jax

    dac, params, audio = setup
    p16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.asarray(a).dtype == jnp.float32 else a, params)
    codes16 = s1dac.encode_codes(p16, CFG, jnp.asarray(audio.numpy()))
    codes32 = s1dac.encode_codes(params, CFG, jnp.asarray(audio.numpy()))
    assert codes16.shape == codes32.shape
    agree = float(np.mean(np.asarray(codes16) == np.asarray(codes32)))
    assert agree > 0.5, f"bf16 encode diverged: {agree:.2%} code agreement"


def test_encode_zq_parity(setup):
    import torch

    dac, params, audio = setup
    with torch.no_grad():
        ref = dac.encode_zq(audio).numpy()
    zq = s1dac.encode_zq(params, CFG, jnp.asarray(audio.numpy()))
    np.testing.assert_allclose(np.asarray(zq), ref, atol=2e-5, rtol=1e-4)


def test_decode_zq_parity(setup):
    import torch

    dac, params, audio = setup
    with torch.no_grad():
        z_q = dac.encode_zq(audio)
        ref = dac.decode_zq(z_q).numpy()
    out = s1dac.decode_zq(params, CFG, jnp.asarray(z_q.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-3)


def test_decode_codes_parity(setup):
    import torch

    dac, params, audio = setup
    with torch.no_grad():
        codes, lens = dac.encode(audio)
        ref, _ = dac.decode(codes, lens)
    out = s1dac.decode_codes(params, CFG, jnp.asarray(codes.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=5e-5, rtol=1e-3)


def test_get_delay_and_output_length(setup):
    dac, params, audio = setup
    assert s1dac.get_delay(CFG) == dac.get_delay()
    for n in (0, 100, 1000):
        assert s1dac.get_output_length(CFG, n) == dac.get_output_length(n)


def test_hop_and_frame_length(setup):
    dac, params, audio = setup
    assert dac.hop_length == CFG.hop_length
    assert dac.frame_length == CFG.frame_length
    zq = s1dac.encode_zq(params, CFG, jnp.asarray(audio.numpy()))
    # one z_q frame per frame_length samples (ceil)
    exp_frames = -(-audio.shape[-1] // CFG.frame_length)
    assert zq.shape == (2, CFG.latent_dim, exp_frames)


def test_rvq_from_latents_parity(setup):
    """rvq_from_latents matches the torch reference's third decode path
    (autoencoder.py:234-247): per-codebook nearest-neighbor on the projected
    latent slices, out_proj'd and summed."""
    import torch

    dac, params, _ = setup
    rvq_t = dac.quantizer.quantizer  # the residual RVQ stack
    n = sum(q.codebook_dim for q in rvq_t.quantizers)
    g = torch.Generator().manual_seed(21)
    lat_t = torch.randn(2, n, 12, generator=g)
    with torch.no_grad():
        zq_t, zp_t, codes_t = rvq_t.from_latents(lat_t)

    from echo_tts_tpu.models.s1dac import rvq_from_latents

    zq, zp, codes = rvq_from_latents(jnp.asarray(lat_t.numpy()),
                                     params["quantizer"]["residual"])
    np.testing.assert_array_equal(np.asarray(codes), codes_t.numpy())
    np.testing.assert_allclose(np.asarray(zp), zp_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(zq), zq_t.numpy(), atol=1e-5)

    # partial-channel input decodes only the whole codebooks that fit
    lat_partial = lat_t[:, : n - 1]
    with torch.no_grad():
        zq_t2, _, codes_t2 = rvq_t.from_latents(lat_partial)
    zq2, _, codes2 = rvq_from_latents(jnp.asarray(lat_partial.numpy()),
                                      params["quantizer"]["residual"])
    assert codes2.shape[1] == codes_t2.shape[1]
    np.testing.assert_allclose(np.asarray(zq2), zq_t2.numpy(), atol=1e-5)
