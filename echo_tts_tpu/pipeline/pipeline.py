"""End-to-end sampling pipeline (reference: inference.py:341-400).

text -> ids/mask (cap 768) -> speaker audio -> chunked latents/mask ->
sampler -> PCA deproject + S1-DAC decode -> flattening-point crop.

Shape buckets (reference: gradio_app.py:315-345) are first-class here: text
and speaker lengths are padded to the configured buckets so the jitted
sampler compiles once per bucket combination, never per request.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from echo_tts_tpu.core.config import AEConfig, DiTConfig, PipelineConfig, SamplerConfig
from echo_tts_tpu.models.pca import PCAState
from echo_tts_tpu.pipeline import tokenizer as tok
from echo_tts_tpu.pipeline.flattening import crop_audio_to_flattening_point
from echo_tts_tpu.pipeline.speaker import (
    ae_decode,
    find_min_bucket_gte,
    get_speaker_latent_and_mask,
)
from echo_tts_tpu.sampling.euler_cfg import (
    draw_noise,
    sample_euler_cfg_independent_guidances,
)

# SampleFn contract mirrors reference inference.py:341-343:
# (speaker_latent, speaker_mask, text_ids, text_mask, rng_seed) -> latents
SampleFn = Callable[..., jnp.ndarray]

from functools import partial as _partial

from echo_tts_tpu.models import pca as _pca_mod
from echo_tts_tpu.models import s1dac as _s1dac


@_partial(jax.jit, static_argnames=("dit_cfg", "ae_cfg", "sc", "model_dtype"))
def _sample_and_decode(dit_params, dit_cfg, sc, ae_params, ae_cfg, pca,
                       speaker_latent, speaker_mask, ids, text_mask, noise,
                       model_dtype):
    """Sampler + PCA deproject + S1-DAC decode fused into ONE executable.

    The device sits behind a dispatch boundary (~20 ms/call through the
    remote-compile relay; a plain PCIe/gRPC hop elsewhere): running the
    sampler and the vocoder as separate jits costs an extra round-trip per
    utterance plus a host detour for the intermediate latents. Fusing them
    also lets XLA overlap the vocoder's first conv stages with the tail of
    the sampler's output projection. Returns (latents fp32, audio fp32) —
    the latents still come back for the flattening-point crop."""
    latents = sample_euler_cfg_independent_guidances(
        dit_params, dit_cfg, sc, speaker_latent, speaker_mask, ids, text_mask,
        noise, model_dtype=model_dtype)
    z_q = _pca_mod.deproject(pca, latents)
    ae_dtype = jax.tree_util.tree_leaves(ae_params)[0].dtype
    audio = _s1dac.decode_zq(ae_params, ae_cfg, z_q.astype(ae_dtype))
    return latents, audio.astype(jnp.float32)


@_partial(jax.jit, static_argnames=("dit_cfg", "sc", "ae_cfg", "block_size",
                                    "total_len", "model_dtype",
                                    "max_positions"),
          donate_argnums=(3, 4, 5))
def _sample_block_and_decode(dit_params, dit_cfg, sc, prefix, lat_state,
                             dec_state, start_pos, noise, text_mask,
                             speaker_mask, kv_text, kv_speaker, ae_params,
                             ae_cfg, pca, block_size, total_len, model_dtype,
                             max_positions):
    """One streaming step fused into ONE executable: blockwise Euler sampling
    of [start_pos, start_pos+block) + incremental latent-prefix KV append
    (models/dit.py:extend_latent_kv) + PCA deproject + the STATEFUL S1-DAC
    decode of exactly that block (models/s1dac.py:decode_zq_stream_step).

    The carried decoder state (post-module KV window + per-stage conv tails)
    makes the vocoder cost O(block) instead of O(receptive field ~1080
    frames) — the round-2 streaming path re-decoded ~17x redundant context
    per chunk — and the incremental KV replaces the per-block full-prefix
    re-encode. Fusing keeps it at one device dispatch per block (~20 ms
    relay overhead otherwise). prefix, lat_state, and dec_state are donated
    and stay device-resident across blocks (SURVEY.md §5.7)."""
    from echo_tts_tpu.sampling.blockwise import sample_block_core

    prefix, lat_state = sample_block_core(
        dit_params, dit_cfg, sc, prefix, lat_state, start_pos, noise,
        text_mask, speaker_mask, kv_text, kv_speaker, block_size, total_len,
        model_dtype)
    block_lat = jax.lax.dynamic_slice(
        prefix, (0, start_pos, 0),
        (prefix.shape[0], block_size, prefix.shape[2]))
    ae_dtype = jax.tree_util.tree_leaves(ae_params)[0].dtype
    z_q = _pca_mod.deproject(pca, block_lat).astype(ae_dtype)
    audio, dec_state = _s1dac.decode_zq_stream_step(
        ae_params, ae_cfg, dec_state, z_q, max_positions)
    return prefix, lat_state, dec_state, audio.astype(jnp.float32)


@_partial(jax.jit, static_argnames=("dit_cfg", "sc", "ae_cfg", "block_size",
                                    "total_len", "model_dtype",
                                    "max_positions"))
def _stream_first_block(dit_params, dit_cfg, sc, ae_params, ae_cfg, pca,
                        speaker_latent, speaker_mask, ids, text_mask, noise,
                        block_size, total_len, model_dtype, max_positions):
    """Streaming prologue + first block as ONE executable: text/speaker KV
    build, prefix/latent-KV/decoder-state init, first-block sampling, and
    its stateful decode. Time-to-first-audio pays a single device dispatch
    instead of ~5 (each ~20 ms through the relay), and XLA overlaps the KV
    builds with state initialization."""
    from echo_tts_tpu.models.dit import (
        get_kv_cache_speaker,
        get_kv_cache_text,
        init_latent_kv_state,
    )
    from echo_tts_tpu.sampling.blockwise import sample_block_core

    kv_text = get_kv_cache_text(dit_params, dit_cfg, ids, text_mask)
    kv_speaker = get_kv_cache_speaker(dit_params, dit_cfg,
                                      speaker_latent.astype(model_dtype))
    b = ids.shape[0]
    ae_dtype = jax.tree_util.tree_leaves(ae_params)[0].dtype
    prefix = jnp.zeros((b, total_len, dit_cfg.latent_size), jnp.float32)
    lat_state = init_latent_kv_state(dit_params, dit_cfg, b, total_len,
                                     model_dtype)
    dec_state = _s1dac.streaming_decode_init(ae_params, ae_cfg, b,
                                             dtype=ae_dtype)
    prefix, lat_state = sample_block_core(
        dit_params, dit_cfg, sc, prefix, lat_state, jnp.int32(0), noise,
        text_mask, speaker_mask, kv_text, kv_speaker, block_size, total_len,
        model_dtype)
    z_q = _pca_mod.deproject(pca, prefix[:, :block_size]).astype(ae_dtype)
    audio, dec_state = _s1dac.decode_zq_stream_step(
        ae_params, ae_cfg, dec_state, z_q, max_positions)
    return (kv_text, kv_speaker, prefix, lat_state, dec_state,
            audio.astype(jnp.float32))


@_partial(jax.jit, static_argnames=("dit_cfg", "sc", "ae_cfg", "block_size",
                                    "total_len", "model_dtype",
                                    "max_positions"),
          donate_argnums=(6,))
def _stream_step_rows(dit_params, dit_cfg, sc, ae_params, ae_cfg, pca,
                      gs, start_pos, valid_len, noise, block_size, total_len,
                      model_dtype, max_positions):
    """Continuous-batching streaming step: one fused executable samples a
    `block_size` block for EVERY row of the group at its OWN position
    (start_pos (B,) int32), appends each row's latent KV, and decodes the
    block through the per-row stateful vocoder. valid_len (B,) masks each
    row's in-block self keys past its remaining budget (a retiring row's
    final partial block must equal the solo run on its valid positions) —
    free/retired slots pass valid_len=0 and their outputs are discarded.

    gs is the donated device-resident group state:
      kv_text/kv_speaker  (L, B, H, T, Dh) per-row conditioning caches
      text_mask/speaker_mask (B, T) bool
      prefix (B, total_len, latent) fp32   lat (dit.init_latent_kv_state)
      dec (s1dac.streaming_decode_init per_row_pos=True)
    total_len includes one block of headroom past the sampler budget so a
    final partial block can write [pos, pos + block) in bounds.

    No reference analogue: the reference serves one utterance per call
    (gradio_app.py:229-430); this is the block-boundary-join serving design
    (VERDICT r3 item 4)."""
    from echo_tts_tpu.sampling.blockwise import sample_block_core

    prefix, lat_state = sample_block_core(
        dit_params, dit_cfg, sc, gs["prefix"], gs["lat"], start_pos, noise,
        gs["text_mask"], gs["speaker_mask"], gs["kv_text"], gs["kv_speaker"],
        block_size, total_len, model_dtype, valid_len=valid_len)
    block_lat = jax.vmap(
        lambda row, pp: jax.lax.dynamic_slice_in_dim(row, pp, block_size,
                                                     axis=0)
    )(prefix, jnp.asarray(start_pos, jnp.int32))
    ae_dtype = jax.tree_util.tree_leaves(ae_params)[0].dtype
    z_q = _pca_mod.deproject(pca, block_lat).astype(ae_dtype)
    audio, dec_state = _s1dac.decode_zq_stream_step(
        ae_params, ae_cfg, gs["dec"], z_q, max_positions)
    gs = dict(gs, prefix=prefix, lat=lat_state, dec=dec_state)
    # block_lat returned for the host-side flattening detector: the
    # scheduler accumulates per-row latents instead of re-fetching the
    # whole prefix every block (one jax.device_get covers audio + latents)
    return gs, audio.astype(jnp.float32), block_lat


@_partial(jax.jit, static_argnames=("dit_cfg", "ae_cfg", "model_dtype"),
          donate_argnums=(4,))
def _join_row(dit_params, dit_cfg, ae_params, ae_cfg, gs, row, ids, tmask,
              spk_latent, smask, model_dtype):
    """Admit a new stream into slot `row` of a RUNNING group (one fused
    dispatch): build its text/speaker KV, write them into the carried
    caches, and zero the slot's prefix / latent-KV / vocoder state. `row` is
    traced, so one executable serves every slot."""
    from echo_tts_tpu.models.dit import get_kv_cache_speaker, get_kv_cache_text

    kt = get_kv_cache_text(dit_params, dit_cfg, ids, tmask)
    ks = get_kv_cache_speaker(dit_params, dit_cfg,
                              spk_latent.astype(model_dtype))
    row = jnp.asarray(row, jnp.int32)

    def put1(buf, new):  # (L, B, H, T, Dh) caches: row slot on axis 1
        return jax.lax.dynamic_update_slice(
            buf, new.astype(buf.dtype), (0, row) + (0,) * (buf.ndim - 2))

    def zero_row(buf, axis):
        idx = (slice(None),) * axis + (row,)
        return buf.at[idx].set(jnp.zeros(buf.shape[:axis] + buf.shape[axis + 1:],
                                         buf.dtype))

    gs = dict(gs)
    gs["kv_text"] = tuple(put1(b, n) for b, n in zip(gs["kv_text"], kt))
    gs["kv_speaker"] = tuple(put1(b, n) for b, n in zip(gs["kv_speaker"], ks))
    gs["text_mask"] = gs["text_mask"].at[row].set(tmask[0])
    gs["speaker_mask"] = gs["speaker_mask"].at[row].set(smask[0])
    gs["prefix"] = zero_row(gs["prefix"], 0)
    gs["lat"] = {k: zero_row(v, 1) for k, v in gs["lat"].items()}
    dec = {"pos": gs["dec"]["pos"].at[row].set(0),
           "kv": [{k: zero_row(v, 0) for k, v in l.items()}
                  for l in gs["dec"]["kv"]],
           "up": [zero_row(v, 0) for v in gs["dec"]["up"]],
           "stem": zero_row(gs["dec"]["stem"], 0),
           "blocks": [{k: zero_row(v, 0) for k, v in b.items()}
                      for b in gs["dec"]["blocks"]],
           "head": zero_row(gs["dec"]["head"], 0)}
    gs["dec"] = dec
    return gs


@_partial(jax.jit, static_argnames=("dit_cfg", "sc", "ae_cfg", "block_size",
                                    "total_len", "model_dtype",
                                    "max_positions"),
          donate_argnums=(6,))
def _join_row_first_block(dit_params, dit_cfg, sc, ae_params, ae_cfg, pca,
                          gs, row, ids, tmask, spk_latent, smask, noise,
                          block_size, total_len, model_dtype, max_positions):
    """Fast-path admission into a RUNNING group (VERDICT r4 item 2): build
    the joiner's text/speaker KV, sample its FIRST `block_size` block SOLO
    (B=1 — the same math as the solo fused prologue, _stream_first_block,
    so the row's audio stays exactly the solo stream's), decode it through
    a fresh per-row vocoder state, and scatter the whole 1-row state into
    slot `row` of the group — ONE fused dispatch.

    The point: the joiner's first audio no longer waits for the next GROUP
    step (which serves every row and costs a full B-row block) — admission
    → first audio is this call alone (~a B=1 block sample, and `sc` may
    carry a reduced first-block step count via SamplerConfig.
    first_block_steps semantics: the caller passes the already-derived
    first-block sc). The group then continues the row at start_pos =
    block_size. `row` is traced (one executable per group size); `sc` is
    static, so a per-request first-block step count compiles one extra
    variant per group size.

    Returns (gs, audio (1, 1, block_size*frame_length) fp32, block_lat
    (1, block_size, latent) fp32)."""
    from echo_tts_tpu.models.dit import (
        get_kv_cache_speaker,
        get_kv_cache_text,
        init_latent_kv_state,
    )
    from echo_tts_tpu.sampling.blockwise import sample_block_core

    kt = get_kv_cache_text(dit_params, dit_cfg, ids, tmask)
    ks = get_kv_cache_speaker(dit_params, dit_cfg,
                              spk_latent.astype(model_dtype))
    ae_dtype = jax.tree_util.tree_leaves(ae_params)[0].dtype
    prefix1 = jnp.zeros((1, total_len, dit_cfg.latent_size), jnp.float32)
    lat1 = init_latent_kv_state(dit_params, dit_cfg, 1, total_len,
                                model_dtype)
    dec1 = _s1dac.streaming_decode_init(ae_params, ae_cfg, 1, dtype=ae_dtype,
                                        per_row_pos=True)
    prefix1, lat1 = sample_block_core(
        dit_params, dit_cfg, sc, prefix1, lat1, jnp.int32(0), noise, tmask,
        smask, kt, ks, block_size, total_len, model_dtype)
    block_lat = prefix1[:, :block_size]
    z_q = _pca_mod.deproject(pca, block_lat).astype(ae_dtype)
    audio, dec1 = _s1dac.decode_zq_stream_step(ae_params, ae_cfg, dec1, z_q,
                                               max_positions)

    # scatter the 1-row state into the group at slot `row` (same layout
    # contract as _join_row: ctx KV / lat KV batch on axis 1, prefix /
    # vocoder state on axis 0)
    row = jnp.asarray(row, jnp.int32)

    def put_ax(buf, new, axis):
        idx = (0,) * axis + (row,) + (0,) * (buf.ndim - axis - 1)
        return jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype), idx)

    gs = dict(gs)
    gs["kv_text"] = tuple(put_ax(b, n, 1) for b, n in zip(gs["kv_text"], kt))
    gs["kv_speaker"] = tuple(put_ax(b, n, 1)
                             for b, n in zip(gs["kv_speaker"], ks))
    gs["text_mask"] = gs["text_mask"].at[row].set(tmask[0])
    gs["speaker_mask"] = gs["speaker_mask"].at[row].set(smask[0])
    gs["prefix"] = put_ax(gs["prefix"], prefix1, 0)
    gs["lat"] = {k: put_ax(v, lat1[k], 1) for k, v in gs["lat"].items()}
    dec = gs["dec"]
    gs["dec"] = {
        "pos": put_ax(dec["pos"], dec1["pos"], 0),
        "kv": [{k: put_ax(v, n[k], 0) for k, v in l.items()}
               for l, n in zip(dec["kv"], dec1["kv"])],
        "up": [put_ax(v, n, 0) for v, n in zip(dec["up"], dec1["up"])],
        "stem": put_ax(dec["stem"], dec1["stem"], 0),
        "blocks": [{k: put_ax(v, n[k], 0) for k, v in b.items()}
                   for b, n in zip(dec["blocks"], dec1["blocks"])],
        "head": put_ax(dec["head"], dec1["head"], 0),
    }
    return gs, audio.astype(jnp.float32), block_lat


@jax.jit
def _resize_group(gs, perm, keep):
    """Re-pack the continuous group's row axis (elastic group sizing): new
    row i takes old row perm[i]; rows with keep[i]==False become inert free
    slots (context masks cleared, vocoder position zeroed — the rest of a
    freed slot's state is garbage the masks / valid_len=0 keep invisible
    until _join_row overwrites it). Rows are fully independent everywhere in
    the step (attention, latent KV, vocoder state are all per-row), so a
    gather along the row axis preserves each surviving row's stream exactly
    (tests/test_continuous_batching.py::test_resize_group_elastic_matches
    _solo). Specializes per (old_b, new_b) pair; the scheduler grows
    straight to the demanded power-of-two level in ONE transition (burst
    admission) and shrinks one level at a time, so only a handful of pairs
    ever compile (warmup covers them). The gather moves the whole per-row
    state (~0.6 GB per row at full serving shapes) once per transition —
    ~6 ms on-chip, one dispatch.

    On donation (ADVICE r4): `gs` is deliberately NOT donated. XLA
    input-output aliasing requires identical shapes, and a resize changes
    the row count on every leaf, so donation could never alias here — the
    transient old+new residency during the gather is inherent to the
    transition (bounded by 1.5x the larger size for a grow). The old
    state's buffers free when the caller rebinds `gs`, immediately after
    the call."""
    perm = jnp.asarray(perm, jnp.int32)
    keep = jnp.asarray(keep, jnp.bool_)
    t0 = lambda a: jnp.take(a, perm, axis=0)   # noqa: E731
    t1 = lambda a: jnp.take(a, perm, axis=1)   # noqa: E731
    dec = gs["dec"]
    return {
        "kv_text": tuple(t1(a) for a in gs["kv_text"]),
        "kv_speaker": tuple(t1(a) for a in gs["kv_speaker"]),
        "text_mask": jnp.where(keep[:, None], t0(gs["text_mask"]), False),
        "speaker_mask": jnp.where(keep[:, None], t0(gs["speaker_mask"]),
                                  False),
        "prefix": t0(gs["prefix"]),
        "lat": {k: t1(v) for k, v in gs["lat"].items()},
        "dec": {
            "pos": jnp.where(keep, t0(dec["pos"]), 0),
            "kv": [{k: t0(v) for k, v in l.items()} for l in dec["kv"]],
            "up": [t0(v) for v in dec["up"]],
            "stem": t0(dec["stem"]),
            "blocks": [{k: t0(v) for k, v in b.items()}
                       for b in dec["blocks"]],
            "head": t0(dec["head"]),
        },
    }


def init_stream_group(tts: EchoTTS, batch: int, total_len: int,
                      text_len: int, spk_len: int):
    """Fresh device-resident group state for the continuous scheduler: all
    slots free (zero caches, all-false masks — fully-masked segments
    contribute exact zeros, so inert)."""
    from echo_tts_tpu.models.dit import init_latent_kv_state

    cfg = tts.dit_cfg
    ae_dtype = jax.tree_util.tree_leaves(tts.ae_params)[0].dtype
    md = tts.model_dtype
    n_spk_pat = spk_len // cfg.speaker_patch_size
    z = lambda *s: jnp.zeros(s, md)  # noqa: E731
    return {
        "kv_text": (z(cfg.num_layers, batch, cfg.num_heads, text_len,
                      cfg.head_dim),
                    z(cfg.num_layers, batch, cfg.num_heads, text_len,
                      cfg.head_dim)),
        "kv_speaker": (z(cfg.num_layers, batch, cfg.num_heads, n_spk_pat,
                         cfg.head_dim),
                       z(cfg.num_layers, batch, cfg.num_heads, n_spk_pat,
                         cfg.head_dim)),
        "text_mask": jnp.zeros((batch, text_len), jnp.bool_),
        "speaker_mask": jnp.zeros((batch, spk_len), jnp.bool_),
        "prefix": jnp.zeros((batch, total_len, cfg.latent_size), jnp.float32),
        "lat": init_latent_kv_state(tts.dit_params, cfg, batch, total_len, md),
        "dec": _s1dac.streaming_decode_init(tts.ae_params, tts.ae_cfg, batch,
                                            dtype=ae_dtype, per_row_pos=True),
    }


@dataclasses.dataclass
class EchoTTS:
    """Bundles the three weight sets (reference loads them separately:
    inference.py:14-135) plus configs."""

    dit_params: dict
    dit_cfg: DiTConfig
    ae_params: dict
    ae_cfg: AEConfig
    pca: PCAState
    model_dtype: object = jnp.bfloat16
    pipe_cfg: PipelineConfig = PipelineConfig()


def sample_pipeline(
    tts: EchoTTS,
    text_prompt: str,
    speaker_audio: Optional[np.ndarray],       # (1, samples) or None
    rng_seed: int,
    sc: Optional[SamplerConfig] = None,
    sample_fn: Optional[SampleFn] = None,
    pad_to_max_speaker_latent_length: Optional[int] = None,
    pad_to_max_text_length: Optional[int] = None,
    normalize_text: bool = False,
    noise: Optional[np.ndarray] = None,
    use_buckets: bool = True,
    speaker_cache=None,
) -> Tuple[np.ndarray, str, dict]:
    """reference: inference.py:346-400. Returns (audio (B, 1, T), normalized
    text, timing dict).

    The no-speaker fallback is a zero latent (1, 4, 80) with an all-false
    mask — NOT absence of the cache (reference: inference.py:375-381).
    """
    sc = sc or SamplerConfig()
    (ids, text_mask, normalized, speaker_latent, speaker_mask,
     timings) = _prepare_inputs(
        tts, text_prompt, speaker_audio, normalize_text,
        pad_to_max_text_length, pad_to_max_speaker_latent_length, use_buckets,
        speaker_cache=speaker_cache)

    t0 = time.perf_counter()
    if noise is None:
        noise = draw_noise(rng_seed, (1, sc.sequence_length, tts.dit_cfg.latent_size))
    if sample_fn is None:
        # fused sampler+vocoder executable: one device dispatch per utterance
        # (see _sample_and_decode); "vocoder" time is folded into "sample"
        latents, audio = _sample_and_decode(
            tts.dit_params, tts.dit_cfg, sc, tts.ae_params, tts.ae_cfg,
            tts.pca, jnp.asarray(speaker_latent), jnp.asarray(speaker_mask),
            jnp.asarray(ids), jnp.asarray(text_mask), jnp.asarray(noise),
            tts.model_dtype)
        audio = np.asarray(audio)
        timings["sample"] = time.perf_counter() - t0
        timings["vocoder"] = 0.0
    else:
        latents = sample_fn(jnp.asarray(speaker_latent), jnp.asarray(speaker_mask),
                            jnp.asarray(ids), jnp.asarray(text_mask), rng_seed)
        latents.block_until_ready()
        timings["sample"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        audio = ae_decode(tts.ae_params, tts.ae_cfg, tts.pca, latents)
        audio = np.asarray(audio)
        timings["vocoder"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    audio = crop_audio_to_flattening_point(audio, np.asarray(latents[0]),
                                           samples_per_latent=tts.ae_cfg.frame_length)
    timings["crop"] = time.perf_counter() - t0

    return audio, normalized[0], timings


def sample_pipeline_batch(
    tts: EchoTTS,
    requests,                       # list of (text, speaker_audio|None, seed)
    sc: Optional[SamplerConfig] = None,
    normalize_text: bool = False,
    speaker_cache=None,
):
    """Batched form of `sample_pipeline`: N utterances through ONE fused
    sampler+vocoder executable (the serving micro-batcher's device call; the
    reference has no batched serving path — its only batch dim is the CFG
    triple, inference.py:499-504).

    Every request is prepared exactly as in the single path (own tokenize,
    own chunked speaker encode, own per-seed noise rows — `draw_noise(seed)`
    for batch row i is identical to the B=1 call, so results match the
    serial path), then padded to the max text/speaker bucket present in the
    batch; masks make the padding inert. Returns a list of
    (audio (1, 1, T_i), normalized_text, timings) in request order, each
    cropped at its own flattening point.
    """
    sc = sc or SamplerConfig()
    preps = [
        _prepare_inputs(tts, text, spk, normalize_text, None, None, True,
                        speaker_cache=speaker_cache)
        for text, spk, _seed in requests
    ]
    text_len = max(p[0].shape[1] for p in preps)
    spk_len = max(p[3].shape[1] for p in preps)
    ids = np.concatenate([_pad_to(np.asarray(p[0]), text_len) for p in preps])
    text_mask = np.concatenate(
        [_pad_to(np.asarray(p[1]), text_len) for p in preps])
    speaker_latent = np.concatenate(
        [_pad_to(np.asarray(p[3]), spk_len) for p in preps])
    speaker_mask = np.concatenate(
        [_pad_to(np.asarray(p[4]), spk_len) for p in preps])

    t0 = time.perf_counter()
    noise = jnp.concatenate([
        draw_noise(seed, (1, sc.sequence_length, tts.dit_cfg.latent_size))
        for _text, _spk, seed in requests])
    latents, audio = _sample_and_decode(
        tts.dit_params, tts.dit_cfg, sc, tts.ae_params, tts.ae_cfg, tts.pca,
        jnp.asarray(speaker_latent), jnp.asarray(speaker_mask),
        jnp.asarray(ids), jnp.asarray(text_mask), noise, tts.model_dtype)
    audio = np.asarray(audio)
    latents = np.asarray(latents)
    sample_wall = time.perf_counter() - t0

    out = []
    for i, p in enumerate(preps):
        t0 = time.perf_counter()
        cropped = crop_audio_to_flattening_point(
            audio[i:i + 1], latents[i],
            samples_per_latent=tts.ae_cfg.frame_length)
        timings = dict(p[5])
        timings["sample"] = sample_wall          # shared batched device call
        timings["vocoder"] = 0.0
        timings["crop"] = time.perf_counter() - t0
        timings["batch_size"] = float(len(requests))
        out.append((cropped, p[2][0], timings))
    return out


def _pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    if arr.shape[1] >= n:
        return arr[:, :n]
    pad = [(0, 0)] * arr.ndim
    pad[1] = (0, n - arr.shape[1])
    return np.pad(arr, pad)


def _prepare_inputs(tts: EchoTTS, text_prompt: str,
                    speaker_audio: Optional[np.ndarray], normalize_text: bool,
                    pad_to_max_text_length: Optional[int],
                    pad_to_max_speaker_latent_length: Optional[int],
                    use_buckets: bool,
                    speaker_cache=None):
    """Shared text/speaker preprocessing for the one-shot and streaming
    pipelines (reference: inference.py:366-390).

    speaker_cache: optional mutable mapping {key: (latent, mask)} consulted
    before the chunked AE encode — repeat speaker prompts (the common TTS
    serving pattern: one voice, many texts) skip the encoder entirely
    (~0.5 s for a 5-min reference, BASELINE.md). Keys include the audio
    content hash and the pad policy, so a cache hit is exactly the encode it
    replaces. Eviction policy belongs to the caller (serve.Engine uses an
    LRU)."""
    pc = tts.pipe_cfg
    timings = {}

    t0 = time.perf_counter()
    max_text = min(pad_to_max_text_length or pc.max_text_length, pc.max_text_length)
    ids, text_mask, normalized = tok.get_text_input_ids_and_mask(
        [text_prompt], max_length=max_text, normalize=normalize_text)
    if pad_to_max_text_length is None and use_buckets:
        # trim then bucket-pad for compile stability
        n = int(text_mask.sum())
        bucket = find_min_bucket_gte(pc.text_buckets, n)
        ids = _pad_to(ids, bucket)
        text_mask = _pad_to(text_mask, bucket)
    timings["tokenize"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if speaker_audio is None:
        n = pad_to_max_speaker_latent_length or 4
        speaker_latent = np.zeros((1, n, tts.dit_cfg.latent_size), np.float32)
        speaker_mask = np.zeros((1, n), bool)
    else:
        cache_key = None
        cached = None
        if speaker_cache is not None:
            import hashlib

            arr = np.ascontiguousarray(np.asarray(speaker_audio))
            cache_key = (arr.shape, hashlib.sha1(arr.tobytes()).hexdigest(),
                         pad_to_max_speaker_latent_length)
            cached = speaker_cache.get(cache_key)
        if cached is not None:
            speaker_latent, speaker_mask = cached
            timings["speaker_encode_cache_hit"] = 1.0
        else:
            speaker_latent, speaker_mask = get_speaker_latent_and_mask(
                tts.ae_params, tts.ae_cfg, tts.pca, speaker_audio,
                max_speaker_latent_length=(pad_to_max_speaker_latent_length
                                           or pc.max_speaker_latent_length),
                audio_chunk_latents=pc.audio_chunk_latents,
                pad_to_max=pad_to_max_speaker_latent_length is not None)
            if cache_key is not None:
                speaker_cache[cache_key] = (speaker_latent, speaker_mask)
        if pad_to_max_speaker_latent_length is None and use_buckets:
            bucket = find_min_bucket_gte(pc.speaker_buckets, speaker_latent.shape[1])
            speaker_latent = _pad_to(speaker_latent, bucket)
            speaker_mask = _pad_to(speaker_mask, bucket)
    timings["speaker_encode"] = time.perf_counter() - t0
    return ids, text_mask, normalized, speaker_latent, speaker_mask, timings


def _block_schedule(block_size, budget: int, patch: int = 1) -> list:
    """Expand a block spec into concrete sizes summing to `budget`.

    An int is a uniform size; a sequence is used in order, repeating its LAST
    entry until the budget fills (the final block truncates). A small first
    block cuts time-to-first-audio roughly proportionally — the first block's
    40-step Euler dominates TTFA — while later blocks stay large for
    throughput (e.g. (64, 192) -> [64, 192, 192, 192] at budget 640).

    `patch` (the DiT's speaker_patch_size) rounds every requested size UP to
    a patch multiple: the incremental latent-prefix KV patchifies each block
    by `patch` (dit.extend_latent_kv), so block sizes and start positions
    must be patch-aligned — an unaligned size would die with an opaque
    reshape error deep inside the fused streaming executable. Rounding (vs
    rejecting) keeps arbitrary client block_size values working (the HTTP
    API accepts any int, server.py)."""
    if isinstance(block_size, (int, np.integer)):
        sizes = [int(block_size)]
    else:
        sizes = [int(s) for s in block_size]
    if not sizes or any(s < 1 for s in sizes):
        raise ValueError(f"block sizes must be >= 1, got {block_size}")
    if patch > 1:
        if budget % patch:
            raise ValueError(
                f"block budget {budget} is not a multiple of the latent "
                f"patch size {patch} (the latent-prefix KV is patchified)")
        sizes = [-(-s // patch) * patch for s in sizes]
    out, i = [], 0
    while budget > 0:
        s = sizes[min(i, len(sizes) - 1)]
        out.append(min(s, budget))
        budget -= out[-1]
        i += 1
    return out


def _check_patch_aligned(block_sizes, cont_len: int, patch: int) -> None:
    """Clear error for patch-misaligned streaming inputs (see
    _block_schedule): dit.extend_latent_kv reshapes each appended block by
    the latent patch size, so every block size and the continuation length
    must be multiples of `patch`."""
    bad = [int(s) for s in block_sizes if int(s) % patch]
    if bad or cont_len % patch:
        raise ValueError(
            f"streaming block sizes {list(map(int, block_sizes))} and "
            f"continuation length {cont_len} must be multiples of the latent "
            f"patch size {patch} (blocks are appended to the latent-prefix "
            f"KV in patches; use pipeline._block_schedule(..., patch=...) "
            f"to round a schedule)")


def stream_blocks_fused(dit_params, dit_cfg, sc, ae_params, ae_cfg, pca,
                        speaker_latent, speaker_mask, ids, text_mask,
                        block_sizes, noises, model_dtype,
                        continuation_latent=None,
                        max_positions: Optional[int] = None):
    """Device-side streaming loop shared by sample_pipeline_stream and
    bench.py: per block, ONE fused executable samples the block, deprojects
    it, and decodes it through the stateful vocoder. Yields
    (prefix, audio (B, 1, bs*frame_length) fp32 device array, start, bs).
    A continuation prefix first advances the decoder state through the seed
    region (audio discarded — only new blocks are yielded)."""
    ids = jnp.asarray(ids)
    text_mask = jnp.asarray(text_mask)
    speaker_latent = jnp.asarray(speaker_latent)
    speaker_mask = jnp.asarray(speaker_mask)
    b = ids.shape[0]
    cont_len = 0 if continuation_latent is None else continuation_latent.shape[1]
    _check_patch_aligned(block_sizes, cont_len, dit_cfg.speaker_patch_size)
    total = cont_len + sum(int(s) for s in block_sizes)
    if max_positions is None:
        max_positions = max(1024, total)
    ae_dtype = jax.tree_util.tree_leaves(ae_params)[0].dtype
    # first_block_steps (opt-in TTFA knob): the FIRST emitted block samples
    # with its own (smaller) step count; the field itself is stripped from
    # every sc handed to an executable so it never splits the jit cache
    sc_rest = dataclasses.replace(sc, first_block_steps=None)
    sc0 = (dataclasses.replace(sc_rest, num_steps=int(sc.first_block_steps))
           if sc.first_block_steps else sc_rest)

    if continuation_latent is None:
        # fused prologue: one dispatch to first audio
        bs0 = int(block_sizes[0])
        (kv_text, kv_speaker, prefix, lat_state, dec_state,
         audio) = _stream_first_block(
            dit_params, dit_cfg, sc0, ae_params, ae_cfg, pca, speaker_latent,
            speaker_mask, ids, text_mask, jnp.asarray(noises[0], jnp.float32),
            bs0, total, model_dtype, max_positions)
        yield prefix, audio, 0, bs0
        start = bs0
        rest = list(enumerate(block_sizes))[1:]
    else:
        from echo_tts_tpu.models.dit import (
            extend_latent_kv_jit,
            get_kv_cache_speaker,
            get_kv_cache_text,
            init_latent_kv_state,
        )

        kv_text = get_kv_cache_text(dit_params, dit_cfg, ids, text_mask)
        kv_speaker = get_kv_cache_speaker(dit_params, dit_cfg,
                                          speaker_latent.astype(model_dtype))
        prefix = jnp.zeros((b, total, dit_cfg.latent_size), jnp.float32)
        dec_state = _s1dac.streaming_decode_init(ae_params, ae_cfg, b,
                                                 dtype=ae_dtype)
        lat_state = init_latent_kv_state(dit_params, dit_cfg, b, total,
                                         model_dtype)
        prefix = prefix.at[:, :cont_len].set(
            continuation_latent.astype(jnp.float32))
        # seed both carried states with the continuation region: the
        # incremental latent KV in one append, the vocoder state by decoding
        # (and discarding) the seed audio in chunks
        lat_state = extend_latent_kv_jit(
            dit_params, dit_cfg, lat_state,
            continuation_latent.astype(model_dtype), jnp.int32(0))
        z_cont = _pca_mod.deproject(pca, prefix[:, :cont_len]).astype(ae_dtype)
        done = 0
        while done < cont_len:
            n = min(64, cont_len - done)
            _, dec_state = _s1dac.decode_zq_stream_step_jit(
                ae_params, ae_cfg, dec_state, z_cont[:, :, done:done + n],
                max_positions)
            done += n
        start = cont_len
        rest = list(enumerate(block_sizes))

    for bi, bs in rest:
        noise = jnp.asarray(noises[bi], jnp.float32)
        # a continuation's first emitted block is also "first" for the knob
        sc_b = sc0 if (continuation_latent is not None and bi == 0) else sc_rest
        prefix, lat_state, dec_state, audio = _sample_block_and_decode(
            dit_params, dit_cfg, sc_b, prefix, lat_state, dec_state,
            jnp.int32(start), noise, text_mask, speaker_mask, kv_text,
            kv_speaker, ae_params, ae_cfg, pca, int(bs), total, model_dtype,
            max_positions)
        yield prefix, audio, start, int(bs)
        start += int(bs)


class _StreamEmitter:
    """Per-utterance emission state shared by the solo and batched streaming
    pipelines (their audio must stay interchangeable — the engine picks one
    or the other by group size): detector-window holdback, flattening-point
    early stop, per-block chunk slicing.

    Emission is held back by one detector window so a flattening point near
    a block boundary crops audio BEFORE it is sent; detection counts only
    windows fully inside the observed data (the detector zero-pads past its
    input, which would fake "flat" windows at every boundary)."""

    WINDOW = 20  # detector window (reference: inference.py:315)

    def __init__(self, total: int, spl: int, cont_len: int = 0,
                 stop_at_flattening: bool = True):
        self.total = total
        self.spl = spl
        self.cont_len = cont_len
        self.stop_at_flattening = stop_at_flattening
        self.emitted_to = cont_len
        self.held = np.zeros((1, 1, 0), np.float32)
        self.stopped = False

    def on_block(self, lat_row, audio_row: np.ndarray,
                 start: int, bs: int):
        """lat_row: (>= start+bs, latent) fp32 latents, or None when
        stop_at_flattening is off (callers then skip the device->host latent
        fetch entirely — it costs a relay round-trip per block); audio_row:
        (1, 1, bs*spl) this block's decoded audio. Returns (chunk — possibly
        empty, stopped). After `stopped`, the row emits nothing further."""
        from echo_tts_tpu.pipeline import flattening

        end = start + bs
        is_final = end == self.total
        # held covers [emitted_to, start); this block decoded [start, end)
        audio = np.concatenate([self.held, audio_row], axis=-1)
        self.held = np.zeros((1, 1, 0), np.float32)

        fp = None
        if self.stop_at_flattening:
            # detect on the GENERATED region only (continuation audio may
            # contain legitimate silence)
            cand = self.cont_len + int(flattening.find_flattening_point(
                lat_row[self.cont_len:end]))
            if cand <= end - self.WINDOW or (is_final and cand < end):
                fp = cand
        if fp is not None and fp < end:
            keep = max(0, fp - self.emitted_to)
            self.stopped = True
            return audio[:, :, : keep * self.spl], True
        if is_final:
            self.stopped = True
            return audio, True
        hold_from = max(self.emitted_to, end - self.WINDOW)
        out = audio[:, :, : (hold_from - self.emitted_to) * self.spl]
        self.held = audio[:, :, (hold_from - self.emitted_to) * self.spl:]
        self.emitted_to = hold_from
        return out, False


def sample_pipeline_stream(
    tts: EchoTTS,
    text_prompt: str,
    speaker_audio: Optional[np.ndarray],
    rng_seed: int,
    sc: Optional[SamplerConfig] = None,
    block_size=(64, 192),
    normalize_text: bool = False,
    stop_at_flattening: bool = True,
    decode_context_frames: Optional[int] = None,
    continuation_audio: Optional[np.ndarray] = None,
    speaker_cache=None,
):
    """Streaming generation: blockwise sampling + causal streamed decode.

    Yields fp32 waveform chunks (1, 1, n_samples), one per latent block, as
    soon as each block is sampled and decoded — time-to-first-audio is one
    block (+ KV build) instead of the full utterance. This is the serving
    form of the reference's blockwise/continuation mode
    (inference_blockwise.py:14-123) combined with the causal S1-DAC decode
    that the reference cites as the reason streaming works (README:122-124).

    End-of-speech: when `stop_at_flattening`, the flattening-point detector
    (reference: inference.py:315-338) runs on the latents generated so far
    after each block, counting only windows FULLY inside the observed data
    (the detector zero-pads past its input, which would fake "flat" windows
    at every block boundary). Emission is held back by one detector window
    (~0.93 s) so audio past the flattening point is never sent; the stream
    crops exactly where the one-shot path would and STOPS — unlike the
    reference, which always generates all 640 latents and crops afterwards.

    Exactness: the vocoder runs STATEFULLY (models/s1dac.py:
    decode_zq_stream_step — post-module KV window + per-stage conv tails),
    so each block decodes exactly its own frames at O(block) cost while
    matching the full decode (verified in tests). One fused executable per
    block covers sampling + deproject + decode (_sample_block_and_decode).
    `decode_context_frames` is accepted for compatibility but unused (the
    carried state IS the context). Requires a checkpoint WITH blockwise
    modules (cfg.has_latent_modules).

    Continuation (reference: inference_blockwise.py:126-220): when
    `continuation_audio` (1, samples) is given, it is AE-encoded to latents
    that seed the blockwise prefix; `text_prompt` must include the
    continuation's transcript (the reference re-transcribes it,
    inference_blockwise.py:189-190). Only NEW audio is emitted; the
    flattening detector runs on the generated region only.
    """
    if not tts.dit_cfg.has_latent_modules:
        raise ValueError(
            "streaming generation needs the blockwise (latent-prefix) modules;"
            " this checkpoint was converted with delete_blockwise_modules")
    sc = sc or SamplerConfig()
    ids, text_mask, _, speaker_latent, speaker_mask, _ = _prepare_inputs(
        tts, text_prompt, speaker_audio, normalize_text, None, None, True,
        speaker_cache=speaker_cache)

    block_sizes = _block_schedule(block_size, sc.sequence_length,
                                  tts.dit_cfg.speaker_patch_size)
    spl = tts.ae_cfg.frame_length

    cont_latent, cont_len = None, 0
    if continuation_audio is not None:
        # chunked/bucketed encode (whole frames only — raw-length ae_encode
        # would encode a partial last frame AND compile per unique length
        # through the relay); crop to the valid length, then to a multiple of
        # the latent patch size (the prefix is patchified by 4,
        # reference inference_blockwise.py:186-188)
        cont_latent_np, cont_mask_np = get_speaker_latent_and_mask(
            tts.ae_params, tts.ae_cfg, tts.pca, np.asarray(continuation_audio),
            max_speaker_latent_length=tts.pipe_cfg.max_speaker_latent_length,
            audio_chunk_latents=tts.pipe_cfg.audio_chunk_latents,
            pad_to_max=False)
        n_valid = int(cont_mask_np.sum())
        n_valid -= n_valid % tts.dit_cfg.speaker_patch_size
        if n_valid == 0:
            raise ValueError("continuation audio shorter than one latent patch")
        cont_latent = jnp.asarray(cont_latent_np[:, :n_valid])
        cont_len = n_valid
        # the 640-latent context is the trained maximum: the continuation
        # spends part of the budget (reference inference_blockwise.py:200
        # requires cont + sum(blocks) < max)
        budget = sc.sequence_length - cont_len
        if budget < 1:
            raise ValueError(
                f"continuation occupies {cont_len} of the {sc.sequence_length}"
                "-latent budget; nothing left to generate")
        block_sizes = _block_schedule(  # noise slices follow
            block_size, budget, tts.dit_cfg.speaker_patch_size)

    # same RNG contract as one-shot: noise for block i is the one-shot noise
    # tensor's rows [start_i, end_i) (blockwise-vs-oneshot consistency tests)
    full_noise = draw_noise(rng_seed, (1, sc.sequence_length, tts.dit_cfg.latent_size))
    noises, off = [], 0
    for bs in block_sizes:
        noises.append(full_noise[:, off:off + bs])
        off += bs

    # continuation frames are context only — never re-emitted
    total = cont_len + sum(block_sizes)
    em = _StreamEmitter(total, spl, cont_len, stop_at_flattening)
    for prefix, audio_dev, start, bs in stream_blocks_fused(
            tts.dit_params, tts.dit_cfg, sc, tts.ae_params, tts.ae_cfg,
            tts.pca, speaker_latent, speaker_mask, ids, text_mask,
            block_sizes, noises, tts.model_dtype,
            continuation_latent=cont_latent):
        lat_row = (np.asarray(prefix[0, : start + bs], np.float32)
                   if stop_at_flattening else None)
        chunk, stopped = em.on_block(
            lat_row, np.asarray(audio_dev, np.float32), start, bs)
        yield chunk
        if stopped:
            return


def sample_pipeline_stream_batch(
    tts: EchoTTS,
    requests,                       # list of (text, speaker_audio|None, seed)
    sc: Optional[SamplerConfig] = None,
    block_size=(64, 192),
    normalize_text: bool = False,
    stop_at_flattening: bool = True,
    speaker_cache=None,
):
    """Batched streaming: N utterances stream through ONE fused device call
    per block (the streaming analogue of sample_pipeline_batch; the
    reference has neither). Yields {request_index: chunk (1, 1, n>0)} dicts
    as blocks complete — a row appears ONLY with non-empty audio (holdback
    can make a row's share of an early block empty) and stops appearing
    after its flattening point; concatenating a row's chunks equals the B=1
    stream with the same seed to fp tolerance (per-seed noise rows match,
    masks make bucket padding inert; B=N vs B=1 executables may tile
    differently, so bit-exactness is not guaranteed — the parity test uses
    2e-5). The host-side emission/cropping logic is the shared
    _StreamEmitter, so solo and batched CROPPING cannot diverge. The batch
    stops sampling early only when EVERY row has stopped. Continuation is
    not batched — use sample_pipeline_stream."""
    if not tts.dit_cfg.has_latent_modules:
        raise ValueError(
            "streaming generation needs the blockwise (latent-prefix) modules;"
            " this checkpoint was converted with delete_blockwise_modules")
    sc = sc or SamplerConfig()
    n = len(requests)
    preps = [
        _prepare_inputs(tts, text, spk, normalize_text, None, None, True,
                        speaker_cache=speaker_cache)
        for text, spk, _seed in requests
    ]
    text_len = max(p[0].shape[1] for p in preps)
    spk_len = max(p[3].shape[1] for p in preps)
    ids = np.concatenate([_pad_to(np.asarray(p[0]), text_len) for p in preps])
    text_mask = np.concatenate(
        [_pad_to(np.asarray(p[1]), text_len) for p in preps])
    speaker_latent = np.concatenate(
        [_pad_to(np.asarray(p[3]), spk_len) for p in preps])
    speaker_mask = np.concatenate(
        [_pad_to(np.asarray(p[4]), spk_len) for p in preps])

    block_sizes = _block_schedule(block_size, sc.sequence_length,
                                  tts.dit_cfg.speaker_patch_size)
    spl = tts.ae_cfg.frame_length
    noises = []
    full = jnp.concatenate([
        draw_noise(seed, (1, sc.sequence_length, tts.dit_cfg.latent_size))
        for _t, _s, seed in requests])
    off = 0
    for bs in block_sizes:
        noises.append(full[:, off:off + bs])
        off += bs

    total = sum(block_sizes)
    ems = [_StreamEmitter(total, spl, 0, stop_at_flattening)
           for _ in range(n)]

    for prefix, audio_dev, start, bs in stream_blocks_fused(
            tts.dit_params, tts.dit_cfg, sc, tts.ae_params, tts.ae_cfg,
            tts.pca, speaker_latent, speaker_mask, ids, text_mask,
            block_sizes, noises, tts.model_dtype):
        audio_np = np.asarray(audio_dev, np.float32)
        lat_np = (np.asarray(prefix[:, : start + bs], np.float32)
                  if stop_at_flattening else None)
        out = {}
        for i in range(n):
            if ems[i].stopped:
                continue
            chunk, _ = ems[i].on_block(
                lat_np[i] if lat_np is not None else None,
                audio_np[i:i + 1], start, bs)
            if chunk.shape[-1]:
                out[i] = chunk
        yield out
        if all(e.stopped for e in ems):
            return
