"""Frozen configuration dataclasses for the Echo-TTS TPU framework.

The reference hard-codes hyperparameters in its loader (reference:
inference.py:22-42) and in module-level constants (gradio_app.py:36-56).
Here every subsystem gets a frozen dataclass so configs are hashable and can
be closed over by jit without retracing surprises.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """EchoDiT hyperparameters (reference: inference.py:22-42, model.py:472-559)."""

    latent_size: int = 80
    model_size: int = 2048
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 5888
    norm_eps: float = 1e-5
    # text encoder
    text_vocab_size: int = 256
    text_model_size: int = 1280
    text_num_layers: int = 14
    text_num_heads: int = 10
    text_intermediate_size: int = 3328
    # speaker / latent encoders (two identical instances)
    speaker_patch_size: int = 4
    speaker_model_size: int = 1280
    speaker_num_layers: int = 14
    speaker_num_heads: int = 10
    speaker_intermediate_size: int = 3328
    # conditioning
    timestep_embed_size: int = 512
    adaln_rank: int = 256
    # whether the blockwise modules (latent_encoder / wk_latent / wv_latent)
    # are present (reference: inference.py:46-56 `delete_blockwise_modules`)
    has_latent_modules: bool = True

    @property
    def head_dim(self) -> int:
        return self.model_size // self.num_heads

    @property
    def text_head_dim(self) -> int:
        return self.text_model_size // self.text_num_heads

    @property
    def speaker_head_dim(self) -> int:
        return self.speaker_model_size // self.speaker_num_heads

    def tiny(self) -> "DiTConfig":
        """A structurally-identical small config for tests."""
        return dataclasses.replace(
            self,
            model_size=64,
            num_layers=2,
            num_heads=4,
            intermediate_size=96,
            text_model_size=40,
            text_num_layers=2,
            text_num_heads=2,
            text_intermediate_size=64,
            speaker_model_size=40,
            speaker_num_layers=2,
            speaker_num_heads=2,
            speaker_intermediate_size=64,
            timestep_embed_size=32,
            adaln_rank=8,
        )


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Euler CFG sampler settings (reference: inference.py:446-468,
    sampler_presets.json). Field names mirror the reference's preset schema so
    its JSON presets load verbatim (string-valued numbers coerced)."""

    num_steps: int = 40
    cfg_scale_text: float = 3.0
    cfg_scale_speaker: float = 8.0
    cfg_min_t: float = 0.5
    cfg_max_t: float = 1.0
    truncation_factor: Optional[float] = 1.0
    rescale_k: Optional[float] = None
    rescale_sigma: Optional[float] = None
    speaker_kv_scale: Optional[float] = None
    speaker_kv_max_layers: Optional[int] = None
    speaker_kv_min_t: Optional[float] = None
    sequence_length: int = 640  # max trained length (reference: inference.py:467-468)
    init_scale: float = 0.999  # t-schedule scale (reference: inference.py:470-477)
    # Use ONE joint unconditional branch (text+speaker both masked) instead of
    # two independent ones — the reference suggests this NFE saving in a
    # comment (inference.py:530); 2 forward branches instead of 3 inside the
    # CFG window. Changes guidance semantics, so off by default.
    joint_uncond: bool = False
    # Refresh the unconditional CFG branches only every k-th window step and
    # reuse them (with a fresh conditional) in between — SmoothCache-family
    # cross-step caching (arXiv 2411.10510) applied to the two uncond
    # branches. 1 = exact reference semantics (default); 2 cuts the default
    # schedule's NFE from 20x3+20x1 to 10x3+30x1 (~20% wall).
    uncond_cache_interval: int = 1
    # Opt-in TTFA knob for STREAMING: run only this many Euler steps on the
    # first emitted block; later blocks keep num_steps. Time-to-first-audio
    # is ~the first block's Euler, so it drops roughly proportionally.
    # Non-exact, and not confined to the first chunk: the first block's
    # latents condition every later block through the latent-prefix KV.
    # None (default) = exact reference semantics. The continuous scheduler
    # ignores it (uniform group blocks have no per-row first-block step).
    first_block_steps: Optional[int] = None
    # ODE solver for the flow integration. "euler" (default) = exact
    # reference semantics (inference.py:558, first-order). "midpoint" =
    # opt-in explicit midpoint (RK2): 2 velocity evaluations per step with
    # O(dt^2) local accuracy, so ~half the steps reach the same integration
    # error — an NFE-reduction lever orthogonal to uncond caching (which it
    # does not compose with; see euler_cfg_scan). Non-exact vs the
    # reference's 40-step Euler trajectory by construction.
    solver: str = "euler"

    @staticmethod
    def from_preset(d: dict, **overrides) -> "SamplerConfig":
        """Ingest the reference's sampler_presets.json schema (string-valued
        numbers included; reference: gradio_app.py:574-578 `to_num`)."""

        def to_num(v, is_int=False):
            if v is None or v == "" or (isinstance(v, str) and v.strip().lower() == "none"):
                return None
            if isinstance(v, bool):  # joint_uncond over HTTP/JSON
                return v
            f = float(v)
            return int(f) if is_int else f

        kw = {}
        for f in dataclasses.fields(SamplerConfig):
            if f.name in d:
                if f.name == "solver":  # string-valued field
                    kw[f.name] = str(d[f.name])
                    continue
                is_int = f.name in ("num_steps", "speaker_kv_max_layers",
                                    "sequence_length", "uncond_cache_interval",
                                    "first_block_steps")
                kw[f.name] = to_num(d[f.name], is_int)
        kw.update(overrides)
        return SamplerConfig(**kw)


@dataclasses.dataclass(frozen=True)
class AEConfig:
    """Fish S1-DAC hyperparameters (reference: autoencoder.py:1144-1192)."""

    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 4, 8, 8)
    latent_dim: int = 1024
    decoder_dim: int = 1536
    decoder_rates: Tuple[int, ...] = (8, 8, 4, 2)
    encoder_transformer_layers: Tuple[int, ...] = (0, 0, 0, 4)
    decoder_transformer_layers: Tuple[int, ...] = (4, 0, 0, 0)
    # quantizer
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    semantic_codebook_size: int = 4096
    downsample_factor: Tuple[int, ...] = (2, 2)
    # pre/post transformer config (reference: autoencoder.py:1149-1158)
    q_n_layer: int = 8
    q_n_head: int = 16
    q_dim: int = 1024
    q_intermediate_size: int = 3072
    q_head_dim: int = 64
    q_window_size: int = 128
    # encoder/decoder block transformer window
    enc_window_size: int = 512
    norm_eps: float = 1e-5
    sample_rate: int = 44100

    @property
    def hop_length(self) -> int:
        h = 1
        for r in self.encoder_rates:
            h *= r
        return h  # 512

    @property
    def frame_length(self) -> int:
        # hop * quantizer downsample (reference: autoencoder.py:1044)
        d = 1
        for f in self.downsample_factor:
            d *= f
        return self.hop_length * d  # 2048

    def tiny(self) -> "AEConfig":
        # encoder_dim*2^i must stay divisible by 64 where a transformer exists
        # (the reference hard-codes n_head = dim // 64, autoencoder.py:859)
        return dataclasses.replace(
            self,
            encoder_dim=32,
            encoder_rates=(2, 2),
            latent_dim=64,
            decoder_dim=64,
            decoder_rates=(2, 2),
            encoder_transformer_layers=(0, 1),
            decoder_transformer_layers=(1, 0),
            n_codebooks=2,
            codebook_size=16,
            codebook_dim=4,
            semantic_codebook_size=32,
            q_n_layer=1,
            q_n_head=2,
            q_dim=64,
            q_intermediate_size=96,
            q_head_dim=32,
            q_window_size=8,
            enc_window_size=16,
        )


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Pipeline caps (reference: inference.py:255,359-362)."""

    max_text_length: int = 768
    max_speaker_latent_length: int = 6400
    audio_chunk_latents: int = 640  # speaker encode chunk (reference: inference.py:256-257)
    ae_downsample_factor: int = 2048
    sample_rate: int = 44100
    # shape buckets for compile stability (reference: gradio_app.py:315-345)
    text_buckets: Tuple[int, ...] = (768,)
    speaker_buckets: Tuple[int, ...] = (640, 2816, 6400)
    latent_buckets: Tuple[int, ...] = (640,)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout (net-new vs single-GPU reference; SURVEY.md §2.2).

    dp: independent utterances (psum-free sampling). tp: optional Megatron-style
    sharding of DiT heads / MLP columns over ICI for HBM headroom.
    """

    dp: int = 1
    tp: int = 1

    @property
    def num_devices(self) -> int:
        return self.dp * self.tp


DTYPE_POLICY = {
    # reference: gradio_app.py:36-38 (MODEL_DTYPE bf16, FISH_AE_DTYPE fp32)
    "dit": jnp.bfloat16,
    "ae": jnp.float32,
    "sampler_state": jnp.float32,
    "pca": jnp.float32,
}


def load_sampler_presets(path: str) -> dict:
    """Load a sampler_presets.json file into {name: SamplerConfig}."""
    with open(path) as f:
        raw = json.load(f)
    return {name: SamplerConfig.from_preset(d) for name, d in raw.items()}
