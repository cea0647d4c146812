"""Blockwise / continuation generation (reference: inference_blockwise.py:14-123).

TPU-native design: the prefix latent buffer is allocated at full static size
up front and filled with `lax.dynamic_update_slice` — exactly the reference's
scheme (inference_blockwise.py:59,120) — so every block reuses the SAME
compiled executable per block size. The latent KV cache is rebuilt from the
full (padded) prefix each block; garbage in not-yet-generated positions is
gated by the `latent_pos < start_pos` mask (reference: model.py:243-244). The
growing state stays device-resident between blocks (donated buffers), per
SURVEY.md §5.7.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from echo_tts_tpu.core.config import DiTConfig, SamplerConfig
from echo_tts_tpu.core.rope import precompute_rope
from echo_tts_tpu.models.dit import (
    get_kv_cache_speaker,
    get_kv_cache_text,
)
from echo_tts_tpu.sampling.euler_cfg import euler_cfg_scan


def sample_block_core(
    params: dict,
    cfg: DiTConfig,
    sc: SamplerConfig,
    prefix_latent: jnp.ndarray,   # (B, total_len, latent) fp32
    lat_state: dict,              # incremental KV (dit.init_latent_kv_state)
    start_pos: jnp.ndarray,       # () int32 — dynamic so all blocks of one size share a compile
    noise: jnp.ndarray,           # (B, block_size, latent) fp32
    text_mask, speaker_mask,
    kv_text, kv_speaker,
    block_size: int,
    total_len: int,
    model_dtype,
    valid_len=None,               # (B,) int32: per-row valid positions of
    #   THIS block (continuous batching — a row on its final partial block
    #   masks in-block self keys past its budget; see self_len in dit.py)
):
    """Unjitted single-block step (jit/fuse at the call site: `_sample_block`
    here; the streaming pipeline fuses it with the stateful vocoder step in
    pipeline._sample_block_and_decode).

    start_pos: scalar int32 (all rows aligned), or (B,) int32 for the
    continuous-batching path where each row of the device batch sits at its
    own absolute position (per-row RoPE, latent-key gating, and prefix
    writes; dit.extend_latent_kv handles the per-row KV append).

    The latent-prefix KV is INCREMENTAL (dit.extend_latent_kv): the latent
    encoder is causal, so each completed block's KV is appended into the
    preallocated device-resident buffers instead of re-encoding the whole
    padded prefix per block (the reference rebuilds:
    inference_blockwise.py:72-74; SURVEY §5.7 prescribed the append design).
    Per-block KV cost is O(block); unwritten tail positions are zeros, inert
    via the `latent_pos < start_pos` mask (reference model.py:243-244)."""
    from echo_tts_tpu.models.dit import extend_latent_kv

    per_row = jnp.ndim(start_pos) == 1
    start_pos = jnp.asarray(start_pos, jnp.int32)
    kv_latent = (lat_state["k"], lat_state["v"])
    n_lat = kv_latent[0].shape[3]
    latent_positions = jnp.arange(n_lat) * cfg.speaker_patch_size
    sp_col = start_pos[:, None] if per_row else start_pos
    latent_mask = (latent_positions[None, :] < sp_col)
    latent_mask = jnp.broadcast_to(latent_mask, (prefix_latent.shape[0], n_lat))

    # query RoPE at positions [start_pos, start_pos + block)
    cos_full, sin_full = precompute_rope(cfg.head_dim, total_len)
    if per_row:
        idx = start_pos[:, None] + jnp.arange(block_size)[None, :]  # (B, bs)
        cos = jnp.take(cos_full, idx, axis=0)
        sin = jnp.take(sin_full, idx, axis=0)
    else:
        cos = jax.lax.dynamic_slice_in_dim(cos_full, start_pos, block_size,
                                           axis=0)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, start_pos, block_size,
                                           axis=0)

    x_init = noise
    if sc.truncation_factor is not None:
        x_init = x_init * sc.truncation_factor

    x_out = euler_cfg_scan(
        params, cfg, sc, x_init, text_mask, speaker_mask, kv_text, kv_speaker,
        model_dtype, rope_q=(cos, sin), kv_latent=kv_latent,
        latent_mask=latent_mask, self_len=valid_len)

    # append this block's KV for the NEXT block's conditioning
    lat_state = extend_latent_kv(params, cfg, lat_state,
                                 x_out.astype(model_dtype), start_pos)
    if per_row:
        prefix_latent = jax.vmap(
            lambda buf, row, pp: jax.lax.dynamic_update_slice(
                buf, row, (pp, 0)))(prefix_latent, x_out, start_pos)
    else:
        prefix_latent = jax.lax.dynamic_update_slice(
            prefix_latent, x_out, (0, start_pos, 0))
    return prefix_latent, lat_state


_sample_block = partial(jax.jit, static_argnames=(
    "cfg", "sc", "block_size", "total_len", "model_dtype"),
    donate_argnums=(3, 4))(sample_block_core)


def sample_blockwise_stream(
    params: dict,
    cfg: DiTConfig,
    sc: SamplerConfig,
    speaker_latent: jnp.ndarray,
    speaker_mask: jnp.ndarray,
    text_input_ids: jnp.ndarray,
    text_mask: jnp.ndarray,
    block_sizes: Sequence[int],
    noises: Optional[List[jnp.ndarray]] = None,   # per-block (B, block, latent)
    rng_seed: int = 0,
    continuation_latent: Optional[jnp.ndarray] = None,
    model_dtype=jnp.bfloat16,
):
    """Generator form of the blockwise sampler: after each block, yields
    (prefix_latent (B, total_len, latent) fp32, start_pos, block_size) where
    [start_pos, start_pos + block_size) is the freshly sampled region.

    The consumer may stop early (end-of-speech detected downstream) — blocks
    are sampled lazily, so unconsumed blocks cost nothing. State between
    blocks stays device-resident (the prefix buffer is donated into each
    `_sample_block`, SURVEY.md §5.7)."""
    from echo_tts_tpu.models.dit import extend_latent_kv_jit, init_latent_kv_state

    p = cfg.speaker_patch_size
    cont = 0 if continuation_latent is None else int(continuation_latent.shape[1])
    if any(int(s) % p for s in block_sizes) or cont % p:
        raise ValueError(
            f"block sizes {list(map(int, block_sizes))} and continuation "
            f"length {cont} must be multiples of the latent patch size {p} "
            f"(extend_latent_kv appends in patches; round with "
            f"pipeline._block_schedule(..., patch={p}))")
    b = text_input_ids.shape[0]
    kv_text = get_kv_cache_text(params, cfg, text_input_ids, text_mask)
    kv_speaker = get_kv_cache_speaker(params, cfg, speaker_latent.astype(model_dtype))

    cont_len = 0 if continuation_latent is None else continuation_latent.shape[1]
    total_len = cont_len + sum(int(s) for s in block_sizes)

    prefix = jnp.zeros((b, total_len, cfg.latent_size), dtype=jnp.float32)
    lat_state = init_latent_kv_state(params, cfg, b, total_len, model_dtype)
    if continuation_latent is not None:
        prefix = prefix.at[:, :cont_len].set(continuation_latent.astype(jnp.float32))
        # seed the incremental caches with the continuation region
        lat_state = extend_latent_kv_jit(
            params, cfg, lat_state,
            continuation_latent.astype(model_dtype), jnp.int32(0))

    start_pos = cont_len
    for bi, block_size in enumerate(block_sizes):
        if noises is not None:
            noise = jnp.asarray(noises[bi], dtype=jnp.float32)
        else:
            key = jax.random.fold_in(jax.random.PRNGKey(rng_seed), bi)
            noise = jax.random.normal(key, (b, block_size, cfg.latent_size),
                                      dtype=jnp.float32)
        prefix, lat_state = _sample_block(
            params, cfg, sc, prefix, lat_state, jnp.int32(start_pos), noise,
            text_mask, speaker_mask, kv_text, kv_speaker,
            int(block_size), total_len, model_dtype)
        yield prefix, start_pos, int(block_size)
        start_pos += int(block_size)


def sample_blockwise_euler_cfg_independent_guidances(
    params: dict,
    cfg: DiTConfig,
    sc: SamplerConfig,
    speaker_latent: jnp.ndarray,
    speaker_mask: jnp.ndarray,
    text_input_ids: jnp.ndarray,
    text_mask: jnp.ndarray,
    block_sizes: Sequence[int],
    noises: Optional[List[jnp.ndarray]] = None,   # per-block (B, block, latent)
    rng_seed: int = 0,
    continuation_latent: Optional[jnp.ndarray] = None,
    model_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """reference: inference_blockwise.py:14-123. Returns fp32 latents
    (B, continuation_len + sum(block_sizes), latent_size).

    Speaker-KV force scaling inside blocks uses the same branchless per-step
    scale as the one-shot sampler; the reference re-scales the cache at each
    block start and unscales at the t-crossing (inference_blockwise.py:68-70,
    114-116), which is the same schedule per block. (Quirk consciously fixed:
    if speaker_kv_min_t > t0 the reference never unscales and compounds the
    scale across blocks — scale**block_idx — which is clearly unintended; we
    apply a constant scale in that regime instead.)
    """
    prefix = None
    for prefix, _, _ in sample_blockwise_stream(
            params, cfg, sc, speaker_latent, speaker_mask, text_input_ids,
            text_mask, block_sizes, noises=noises, rng_seed=rng_seed,
            continuation_latent=continuation_latent, model_dtype=model_dtype):
        pass
    return prefix
