"""Pipeline-layer parity: tokenizer normalization table, flattening-point
detector, speaker chunking, PCA, and a full end-to-end tiny-model waveform
parity run vs the composed reference pipeline (BASELINE config 1 analogue)."""
import numpy as np
import pytest

import jax.numpy as jnp

from echo_tts_tpu.core.config import AEConfig, DiTConfig, PipelineConfig, SamplerConfig
from echo_tts_tpu.checkpoints.convert import (
    convert_ae_state,
    convert_dit_state,
    fold_weight_norm,
    torch_state_to_numpy,
)
from echo_tts_tpu.models.pca import PCAState
from echo_tts_tpu.pipeline import tokenizer as tok
from echo_tts_tpu.pipeline.flattening import find_flattening_point
from echo_tts_tpu.pipeline.pipeline import EchoTTS, sample_pipeline
from echo_tts_tpu.pipeline.speaker import get_speaker_latent_and_mask

from ref_utils import build_torch_dit, load_reference_inference_module
from test_s1dac_parity import build_torch_tiny_ae

DCFG = DiTConfig().tiny()
ACFG = AEConfig().tiny()


@pytest.mark.parametrize("text", [
    "Hello there… it’s a ”test”: one; two—three\nfour",
    "[S2] already tagged",
    "(parenthetical start)",
    "plain text gets tagged",
    "has S1 marker inline",
    "émoji 🎤 and ünïcode — multibyte UTF-8 bytes",
    "x" * 200,  # exceeds the max_length cap -> truncation parity
])
@pytest.mark.parametrize("normalize", [True, False])
def test_tokenizer_parity(text, normalize):
    ref_inf = load_reference_inference_module()
    ref_ids, ref_mask, ref_norm = ref_inf.get_text_input_ids_and_mask(
        [text], max_length=64, normalize=normalize, return_normalized_text=True)
    ids, mask, norm = tok.get_text_input_ids_and_mask([text], 64, normalize=normalize)
    np.testing.assert_array_equal(ids, ref_ids.numpy())
    np.testing.assert_array_equal(mask, ref_mask.numpy())
    assert norm == ref_norm


def test_flattening_parity():
    import torch

    ref_inf = load_reference_inference_module()
    g = torch.Generator().manual_seed(0)
    # noisy head + flat tail
    data = torch.randn(40, 8, generator=g)
    data[25:] = 0.01 * torch.randn(15, 8, generator=g)
    ref = ref_inf.find_flattening_point(data, window_size=5)
    mine = int(find_flattening_point(jnp.asarray(data.numpy()), window_size=5))
    assert mine == ref

    # never flat
    data2 = torch.randn(30, 8, generator=g) * 3
    ref2 = ref_inf.find_flattening_point(data2, window_size=5)
    mine2 = int(find_flattening_point(jnp.asarray(data2.numpy()), window_size=5))
    assert mine2 == ref2 == 30


@pytest.fixture(scope="module")
def tiny_tts():
    import torch

    tm = build_torch_dit(DCFG, seed=6)
    dac = build_torch_tiny_ae(ACFG, seed=7)
    dit_params = convert_dit_state(torch_state_to_numpy(tm), DCFG)
    ae_params = convert_ae_state(fold_weight_norm(torch_state_to_numpy(dac)), ACFG)

    rng = np.random.default_rng(1)
    # tiny AE latent (64) < DiT latent (80): any fixed matrix works for parity
    comp = (0.3 * rng.standard_normal((DCFG.latent_size, ACFG.latent_dim))).astype(np.float32)
    mean = (0.01 * rng.standard_normal(ACFG.latent_dim)).astype(np.float32)
    pca = PCAState.from_arrays(comp, mean, 2.0)

    pc = PipelineConfig(max_text_length=64, max_speaker_latent_length=64,
                        audio_chunk_latents=16, text_buckets=(64,),
                        speaker_buckets=(16, 32), latent_buckets=(16,))
    tts = EchoTTS(dit_params, DCFG, ae_params, ACFG, pca,
                  model_dtype=jnp.float32, pipe_cfg=pc)
    return tm, dac, tts


def test_speaker_builder_parity(tiny_tts):
    import torch

    tm, dac, tts = tiny_tts
    ref_inf = load_reference_inference_module()

    class TorchPCA:
        pca_components = torch.tensor(np.asarray(tts.pca.components))
        pca_mean = torch.tensor(np.asarray(tts.pca.mean))
        latent_scale = tts.pca.latent_scale

    g = torch.Generator().manual_seed(12)
    audio = (0.3 * torch.randn(1, 37 * ACFG.frame_length + 11, generator=g)).clamp(-1, 1)
    # The reference helper hard-codes AE_DOWNSAMPLE_FACTOR=2048
    # (inference.py:263), inapplicable at tiny-AE scale; replicate its exact
    # chunk/pad/mask/truncate logic (inference.py:266-309) with the tiny frame.
    down = ACFG.frame_length
    chunk = 16 * down
    with torch.no_grad():
        parts = []
        for i in range(0, audio.shape[1], chunk):
            c = audio[:, i : i + chunk]
            if c.shape[1] < chunk:
                c = torch.nn.functional.pad(c, (0, chunk - c.shape[1]))
            parts.append(ref_inf.ae_encode(dac, TorchPCA, c.unsqueeze(0)))
        ref_lat = torch.cat(parts, dim=1)
    actual = audio.shape[1] // down
    ref_lat = ref_lat[:, :actual]
    ref_mask = (torch.arange(ref_lat.shape[1]) < actual).unsqueeze(0)
    n = ref_lat.shape[1] // 4 * 4
    ref_lat, ref_mask = ref_lat[:, :n], ref_mask[:, :n]

    lat, mask = get_speaker_latent_and_mask(
        tts.ae_params, ACFG, tts.pca, audio.numpy(),
        max_speaker_latent_length=64, audio_chunk_latents=16)
    np.testing.assert_array_equal(mask, ref_mask.numpy())
    np.testing.assert_allclose(lat, ref_lat.numpy(), atol=1e-4, rtol=1e-3)


def test_e2e_waveform_parity(tiny_tts):
    """Full pipeline: text+speaker -> latents -> waveform, vs the composed
    reference path at the same seed-injected noise (SURVEY.md §4 item 5)."""
    import torch

    tm, dac, tts = tiny_tts
    ref_inf = load_reference_inference_module()

    class TorchPCA:
        pca_components = torch.tensor(np.asarray(tts.pca.components))
        pca_mean = torch.tensor(np.asarray(tts.pca.mean))
        latent_scale = tts.pca.latent_scale

    sc = SamplerConfig(num_steps=4, cfg_scale_text=3.0, cfg_scale_speaker=5.0,
                       cfg_min_t=0.5, cfg_max_t=1.0, truncation_factor=0.8,
                       sequence_length=16)
    text = "Hello world."
    seed = 17
    g = torch.Generator().manual_seed(31)
    # exactly 2 x 16-latent chunks so chunked == per-chunk encode on both sides
    speaker_audio = (0.3 * torch.randn(1, 32 * ACFG.frame_length, generator=g)).clamp(-1, 1)

    # ---- reference path, composed (its speaker helper hard-codes the
    # production 2048 frame, see test_speaker_builder_parity)
    chunk = 16 * ACFG.frame_length
    with torch.no_grad():
        ids, tmask, normed = ref_inf.get_text_input_ids_and_mask(
            [text], max_length=64, normalize=True, return_normalized_text=True)
        parts = []
        for i in range(0, speaker_audio.shape[1], chunk):
            parts.append(ref_inf.ae_encode(
                dac, TorchPCA, speaker_audio[:, i : i + chunk].unsqueeze(0)))
        slat = torch.cat(parts, dim=1)
        smask = torch.ones(1, slat.shape[1], dtype=torch.bool)
        ref_latents = ref_inf.sample_euler_cfg_independent_guidances(
            model=tm, speaker_latent=slat, speaker_mask=smask,
            text_input_ids=ids, text_mask=tmask, rng_seed=seed,
            num_steps=sc.num_steps, cfg_scale_text=sc.cfg_scale_text,
            cfg_scale_speaker=sc.cfg_scale_speaker, cfg_min_t=sc.cfg_min_t,
            cfg_max_t=sc.cfg_max_t, truncation_factor=sc.truncation_factor,
            rescale_k=None, rescale_sigma=None, speaker_kv_scale=None,
            speaker_kv_max_layers=None, speaker_kv_min_t=None,
            sequence_length=sc.sequence_length)
        ref_audio = ref_inf.ae_decode(dac, TorchPCA, ref_latents)
        # reference crop helper hard-codes 2048 samples/latent
        # (inference.py:338); the tiny AE's frame is 16, so apply its
        # detector with the tiny hop explicitly
        fp = ref_inf.find_flattening_point(ref_latents[0])
        ref_audio = ref_audio[..., : fp * ACFG.frame_length]
    ref_audio = ref_audio.numpy()

    # ---- ours (noise injected from the reference's torch RNG draw)
    gen = torch.Generator(device="cpu").manual_seed(seed)
    noise = torch.randn((1, sc.sequence_length, DCFG.latent_size),
                        generator=gen).numpy()
    audio, normalized, timings = sample_pipeline(
        tts, text, speaker_audio.numpy(), seed, sc=sc,
        normalize_text=True, noise=noise, use_buckets=False)

    assert normalized == normed[0]
    assert audio.shape == ref_audio.shape
    np.testing.assert_allclose(audio, ref_audio, atol=5e-4, rtol=1e-2)


def test_pca_random_shapes():
    """PCAState.random must honor out_dim even when out_dim > latent_dim
    (tiny configs); regression for the serve --random-tiny crash."""
    from echo_tts_tpu.models.pca import PCAState, deproject, project

    for latent_dim, out_dim in [(1024, 80), (64, 80)]:
        p = PCAState.random(latent_dim=latent_dim, out_dim=out_dim)
        assert p.components.shape == (out_dim, latent_dim)
        z = jnp.ones((1, latent_dim, 6))
        lat = project(p, z)
        assert lat.shape == (1, 6, out_dim)
        back = deproject(p, lat)
        assert back.shape == (1, latent_dim, 6)
