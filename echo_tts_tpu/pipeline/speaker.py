"""Speaker-reference conditioning builder (reference: inference.py:250-309).

Chunked AE-encode of up to 5 minutes of reference audio: fixed 640-latent
(~30 s) chunks so the TPU executable compiles ONCE and is reused for every
chunk — the reference loops the same shapes on GPU for the same reason
(max chunk seen in training, inference.py:256-257).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from echo_tts_tpu.core.config import AEConfig
from echo_tts_tpu.models import pca as pca_mod
from echo_tts_tpu.models import s1dac


@partial(jax.jit, static_argnames=("ae_cfg",))
def ae_encode(ae_params: dict, ae_cfg: AEConfig, pca: pca_mod.PCAState,
              audio: jnp.ndarray) -> jnp.ndarray:
    """audio (B, 1, T) -> (B, T/2048, 80) fp32 (reference: inference.py:223-229)."""
    z_q = s1dac.encode_zq(ae_params, ae_cfg, audio)
    return pca_mod.project(pca, z_q)


@partial(jax.jit, static_argnames=("ae_cfg",))
def ae_decode(ae_params: dict, ae_cfg: AEConfig, pca: pca_mod.PCAState,
              latents: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 80) -> waveform (B, 1, T*2048) fp32 (reference: inference.py:232-235)."""
    z_q = pca_mod.deproject(pca, latents)
    ae_dtype = jax.tree_util.tree_leaves(ae_params)[0].dtype
    return s1dac.decode_zq(ae_params, ae_cfg, z_q.astype(ae_dtype)).astype(jnp.float32)


def ae_reconstruct(ae_params, ae_cfg, pca, audio):
    """Round-trip audition helper (reference: inference.py:238-244)."""
    return ae_decode(ae_params, ae_cfg, pca, ae_encode(ae_params, ae_cfg, pca, audio))


def get_speaker_latent_and_mask(
    ae_params: dict,
    ae_cfg: AEConfig,
    pca: pca_mod.PCAState,
    audio: np.ndarray,                      # (1, samples)
    max_speaker_latent_length: int = 6400,
    audio_chunk_latents: int = 640,
    pad_to_max: bool = False,
    divis_by_patch_size: Optional[int] = 4,
) -> Tuple[np.ndarray, np.ndarray]:
    """reference: inference.py:250-309. Returns (latent (1, S, 80), mask (1, S))."""
    down = ae_cfg.frame_length  # 2048 samples/latent
    chunk_samples = audio_chunk_latents * down
    audio = np.asarray(audio)[:, : max_speaker_latent_length * down]

    latent_arr = []
    for i in range(0, audio.shape[1], chunk_samples):
        chunk = audio[:, i : i + chunk_samples]
        if chunk.shape[1] < chunk_samples:
            chunk = np.pad(chunk, ((0, 0), (0, chunk_samples - chunk.shape[1])))
        latent_arr.append(np.asarray(
            ae_encode(ae_params, ae_cfg, pca, jnp.asarray(chunk[None]))))
    speaker_latent = np.concatenate(latent_arr, axis=1)

    actual = audio.shape[1] // down
    mask = (np.arange(speaker_latent.shape[1]) < actual)[None]

    if pad_to_max and speaker_latent.shape[1] < max_speaker_latent_length:
        padn = max_speaker_latent_length - speaker_latent.shape[1]
        speaker_latent = np.pad(speaker_latent, ((0, 0), (0, padn), (0, 0)))
        mask = np.pad(mask, ((0, 0), (0, padn)))
    elif not pad_to_max:
        speaker_latent = speaker_latent[:, :actual]
        mask = mask[:, :actual]

    if divis_by_patch_size:
        n = speaker_latent.shape[1] // divis_by_patch_size * divis_by_patch_size
        speaker_latent = speaker_latent[:, :n]
        mask = mask[:, :n]

    return speaker_latent.astype(np.float32), mask


def find_min_bucket_gte(buckets, actual_length: int) -> int:
    """Smallest bucket >= length, else the max bucket
    (reference: gradio_app.py:139-166)."""
    cand = [b for b in buckets if b >= actual_length]
    return min(cand) if cand else max(buckets)
