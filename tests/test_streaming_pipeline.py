"""Streaming generation pipeline (sample_pipeline_stream): per-block audio
chunks, exactness vs the non-streamed blockwise path, and flattening-point
early stop. Serving form of reference inference_blockwise.py + the causal
streamed decode (README:122-124)."""
import numpy as np
import pytest

import jax.numpy as jnp

from echo_tts_tpu.core.config import SamplerConfig
from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream
from echo_tts_tpu.pipeline.speaker import ae_decode
from echo_tts_tpu.pipeline import pipeline as pipe_mod
from echo_tts_tpu.sampling.blockwise import (
    sample_blockwise_euler_cfg_independent_guidances,
)
from echo_tts_tpu.sampling.euler_cfg import draw_noise

from test_pipeline_parity import tiny_tts  # fixture reuse  # noqa: F401

SC = SamplerConfig(num_steps=2, sequence_length=16, truncation_factor=0.8)
TEXT = "Streaming test."


def _prep(tts):
    from echo_tts_tpu.pipeline.pipeline import _prepare_inputs

    ids, text_mask, _, spk_lat, spk_mask, _ = _prepare_inputs(
        tts, TEXT, None, True, None, None, True)
    return ids, text_mask, spk_lat, spk_mask


def test_stream_matches_blockwise_full_decode(tiny_tts):  # noqa: F811
    _, _, tts = tiny_tts
    chunks = list(sample_pipeline_stream(
        tts, TEXT, None, rng_seed=3, sc=SC, block_size=8,
        normalize_text=True, stop_at_flattening=False))
    assert len(chunks) == 2  # one yield per block (first may be held back)
    streamed = np.concatenate(chunks, axis=-1)

    ids, text_mask, spk_lat, spk_mask = _prep(tts)
    noise = draw_noise(3, (1, SC.sequence_length, tts.dit_cfg.latent_size))
    lat = sample_blockwise_euler_cfg_independent_guidances(
        tts.dit_params, tts.dit_cfg, SC,
        jnp.asarray(spk_lat), jnp.asarray(spk_mask),
        jnp.asarray(ids), jnp.asarray(text_mask),
        (8, 8), noises=[noise[:, :8], noise[:, 8:]],
        model_dtype=tts.model_dtype)
    full = np.asarray(ae_decode(tts.ae_params, tts.ae_cfg, tts.pca, lat))

    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=2e-5, rtol=0)


def test_first_block_steps_knob(tiny_tts):  # noqa: F811
    """Opt-in TTFA knob: first_block_steps=k samples the FIRST block with k
    Euler steps. k == num_steps is byte-identical to the exact stream (the
    field is stripped before executables, so no cache split either); k <
    num_steps yields a first chunk equal to a stream run entirely at k steps
    (same prologue executable + config), while later blocks keep num_steps."""
    import dataclasses

    exact = list(sample_pipeline_stream(
        tts := tiny_tts[2], TEXT, None, rng_seed=7, sc=SC, block_size=8,
        normalize_text=True, stop_at_flattening=False))
    noop = list(sample_pipeline_stream(
        tts, TEXT, None, rng_seed=7,
        sc=dataclasses.replace(SC, first_block_steps=SC.num_steps),
        block_size=8, normalize_text=True, stop_at_flattening=False))
    for a, b in zip(exact, noop):
        np.testing.assert_array_equal(a, b)

    sc_fast = dataclasses.replace(SC, first_block_steps=1)
    fast = np.concatenate(list(sample_pipeline_stream(
        tts, TEXT, None, rng_seed=7, sc=sc_fast, block_size=8,
        normalize_text=True, stop_at_flattening=False)), axis=-1)
    all_k = np.concatenate(list(sample_pipeline_stream(
        tts, TEXT, None, rng_seed=7,
        sc=dataclasses.replace(SC, num_steps=1), block_size=8,
        normalize_text=True, stop_at_flattening=False)), axis=-1)
    exact_cat = np.concatenate(exact, axis=-1)
    n0 = 8 * tts.ae_cfg.frame_length  # first block's sample extent
    # first block's audio: exactly the 1-step sampler's first block (same
    # prologue executable, same config)
    np.testing.assert_allclose(fast[..., :n0], all_k[..., :n0],
                               atol=2e-5, rtol=0)
    # and the knob actually changed the first block vs the exact stream
    assert not np.allclose(fast[..., :n0], exact_cat[..., :n0], atol=1e-6)
    # later blocks run at full num_steps: they differ from the all-1-step
    # stream's continuation
    assert not np.allclose(fast[..., n0:], all_k[..., n0:], atol=1e-6)


def test_block_schedule_expansion():
    from echo_tts_tpu.pipeline.pipeline import _block_schedule

    assert _block_schedule(160, 640) == [160, 160, 160, 160]
    assert _block_schedule(160, 500) == [160, 160, 160, 20]
    assert _block_schedule((64, 192), 640) == [64, 192, 192, 192]
    assert _block_schedule([4, 8, 8], 16) == [4, 8, 4]
    assert _block_schedule((8,), 4) == [4]
    with pytest.raises(ValueError):
        _block_schedule(0, 16)
    with pytest.raises(ValueError):
        _block_schedule((8, 0), 16)
    with pytest.raises(ValueError):
        _block_schedule([], 16)


def test_block_schedule_patch_rounding():
    """Requested sizes round UP to latent-patch multiples (extend_latent_kv
    appends in patches; an unaligned block would die with an opaque reshape
    error inside the fused streaming executable — ADVICE r3)."""
    from echo_tts_tpu.pipeline.pipeline import _block_schedule

    assert _block_schedule(6, 16, patch=4) == [8, 8]
    assert _block_schedule(50, 640, patch=4) == [52] * 12 + [16]
    assert _block_schedule((3, 9), 24, patch=4) == [4, 12, 8]
    # aligned schedules pass through unchanged
    assert _block_schedule((64, 192), 640, patch=4) == [64, 192, 192, 192]
    sched = _block_schedule(50, 640, patch=4)
    assert sum(sched) == 640 and all(s % 4 == 0 for s in sched)
    with pytest.raises(ValueError, match="patch"):
        _block_schedule(8, 14, patch=4)  # budget itself misaligned


def test_blockwise_stream_rejects_misaligned_blocks(tiny_tts):  # noqa: F811
    """The low-level sampler (explicit block_sizes API) raises a CLEAR error
    for patch-misaligned blocks instead of an opaque reshape failure."""
    from echo_tts_tpu.sampling.blockwise import sample_blockwise_stream

    _, _, tts = tiny_tts
    ids, text_mask, spk_lat, spk_mask = _prep(tts)
    with pytest.raises(ValueError, match="patch size"):
        next(sample_blockwise_stream(
            tts.dit_params, tts.dit_cfg, SC, jnp.asarray(spk_lat),
            jnp.asarray(spk_mask), jnp.asarray(ids), jnp.asarray(text_mask),
            (6, 10), model_dtype=tts.model_dtype))


def test_stream_unaligned_block_size_rounds(tiny_tts):  # noqa: F811
    """A client block_size that is not a patch multiple (e.g. the HTTP API
    accepts any int) is rounded up and streams successfully, matching the
    aligned schedule it rounds to."""
    _, _, tts = tiny_tts
    chunks = list(sample_pipeline_stream(
        tts, TEXT, None, rng_seed=3, sc=SC, block_size=6,
        normalize_text=True, stop_at_flattening=False))
    got = np.concatenate(chunks, axis=-1)
    ref = np.concatenate(list(sample_pipeline_stream(
        tts, TEXT, None, rng_seed=3, sc=SC, block_size=8,
        normalize_text=True, stop_at_flattening=False)), axis=-1)
    np.testing.assert_array_equal(got, ref)


def test_stream_variable_schedule_matches_blockwise(tiny_tts):  # noqa: F811
    """A (small-first-block) schedule through the streaming pipeline equals
    the non-streamed blockwise sampler with the same schedule — TTFA tuning
    must not change the audio."""
    _, _, tts = tiny_tts
    chunks = list(sample_pipeline_stream(
        tts, TEXT, None, rng_seed=3, sc=SC, block_size=(4, 12),
        normalize_text=True, stop_at_flattening=False))
    assert len(chunks) == 2
    streamed = np.concatenate(chunks, axis=-1)

    ids, text_mask, spk_lat, spk_mask = _prep(tts)
    noise = draw_noise(3, (1, SC.sequence_length, tts.dit_cfg.latent_size))
    lat = sample_blockwise_euler_cfg_independent_guidances(
        tts.dit_params, tts.dit_cfg, SC,
        jnp.asarray(spk_lat), jnp.asarray(spk_mask),
        jnp.asarray(ids), jnp.asarray(text_mask),
        (4, 12), noises=[noise[:, :4], noise[:, 4:]],
        model_dtype=tts.model_dtype)
    full = np.asarray(ae_decode(tts.ae_params, tts.ae_cfg, tts.pca, lat))

    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=2e-5, rtol=0)


def test_stream_early_stop_at_flattening(tiny_tts, monkeypatch):  # noqa: F811
    _, _, tts = tiny_tts
    from echo_tts_tpu.pipeline import flattening

    # force detection at frame 10 (inside block 2 of [8, 8])
    monkeypatch.setattr(flattening, "find_flattening_point",
                        lambda data, **kw: np.int32(min(10, data.shape[0])))
    chunks = list(sample_pipeline_stream(
        tts, TEXT, None, rng_seed=3, sc=SC, block_size=8,
        normalize_text=True, stop_at_flattening=True))
    spl = tts.ae_cfg.frame_length
    # blocks are smaller than the 20-frame detector window, so block 1 is
    # fully held back; the final block crops at frame 10 — total audio is
    # exactly 10 frames and nothing past the flattening point was emitted
    total = sum(c.shape[-1] for c in chunks)
    assert total == 10 * spl


def test_stream_requires_latent_modules(tiny_tts):  # noqa: F811
    import dataclasses

    _, _, tts = tiny_tts
    tts2 = dataclasses.replace(
        tts, dit_cfg=dataclasses.replace(tts.dit_cfg, has_latent_modules=False))
    with pytest.raises(ValueError, match="blockwise"):
        next(sample_pipeline_stream(tts2, TEXT, None, 0, sc=SC))


def test_stream_holdback_crops_before_emission(tiny_tts, monkeypatch):  # noqa: F811
    """A flattening point inside the last detector-window of a block must not
    leak audio past it: detection is deferred to the next block, but the
    holdback means those frames were never emitted."""
    import dataclasses

    _, _, tts = tiny_tts
    from echo_tts_tpu.pipeline import flattening

    sc = dataclasses.replace(SC, sequence_length=64)
    monkeypatch.setattr(flattening, "find_flattening_point",
                        lambda data, **kw: np.int32(min(30, data.shape[0])))
    chunks = list(sample_pipeline_stream(
        tts, TEXT, None, rng_seed=3, sc=sc, block_size=32,
        normalize_text=True, stop_at_flattening=True))
    spl = tts.ae_cfg.frame_length
    # block 1 (frames 0..32): cand=30 is inside its last window -> deferred;
    # emits frames [0, 12), holds [12, 32). block 2 (final): fp=30 -> emits
    # [12, 30) and stops. Total exactly 30 frames, never more.
    total = sum(c.shape[-1] for c in chunks)
    assert total == 30 * spl


def test_stream_continuation(tiny_tts):  # noqa: F811
    """Continuation mode: seed audio is AE-encoded into the blockwise prefix;
    only NEW frames are emitted, and they match the non-streamed blockwise
    continuation path decoded over the generated region."""
    _, _, tts = tiny_tts
    rng = np.random.default_rng(5)
    spl = tts.ae_cfg.frame_length
    cont_audio = (0.2 * rng.standard_normal(8 * spl)).astype(np.float32)[None]

    chunks = list(sample_pipeline_stream(
        tts, TEXT, None, rng_seed=4, sc=SC, block_size=8,
        normalize_text=True, stop_at_flattening=False,
        continuation_audio=cont_audio))
    streamed = np.concatenate(chunks, axis=-1)
    # the continuation spends its share of the sequence_length budget
    # (reference inference_blockwise.py:200: cont + sum(blocks) < max),
    # so only (sequence_length - cont_len) NEW frames are generated
    cont_len = 8  # 8*spl samples -> 8 whole frames, already a patch multiple
    budget = SC.sequence_length - cont_len
    assert streamed.shape[-1] == budget * spl  # new audio only

    # reference path: chunk-encode continuation the same way, run the
    # non-streamed blockwise sampler, full-decode, compare generated region
    from echo_tts_tpu.pipeline.speaker import get_speaker_latent_and_mask

    ids, text_mask, spk_lat, spk_mask = _prep(tts)
    cl, cm = get_speaker_latent_and_mask(
        tts.ae_params, tts.ae_cfg, tts.pca, cont_audio,
        max_speaker_latent_length=tts.pipe_cfg.max_speaker_latent_length,
        audio_chunk_latents=tts.pipe_cfg.audio_chunk_latents, pad_to_max=False)
    cont_lat = jnp.asarray(cl[:, :int(cm.sum()) - int(cm.sum()) % 4])
    assert cont_lat.shape[1] == cont_len
    noise = draw_noise(4, (1, SC.sequence_length, tts.dit_cfg.latent_size))
    lat = sample_blockwise_euler_cfg_independent_guidances(
        tts.dit_params, tts.dit_cfg, SC,
        jnp.asarray(spk_lat), jnp.asarray(spk_mask),
        jnp.asarray(ids), jnp.asarray(text_mask),
        (budget,), noises=[noise[:, :budget]],
        continuation_latent=cont_lat, model_dtype=tts.model_dtype)
    full = np.asarray(ae_decode(tts.ae_params, tts.ae_cfg, tts.pca, lat))
    np.testing.assert_allclose(streamed, full[:, :, cont_len * spl:],
                               atol=2e-5, rtol=0)


def test_stream_batch_matches_serial(tiny_tts):  # noqa: F811
    """sample_pipeline_stream_batch: two utterances through ONE device stream
    per block equal their serial B=1 streams (per-seed noise rows, inert
    bucket padding)."""
    from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream_batch

    _, _, tts = tiny_tts
    reqs = [("First stream test.", None, 3), ("Second one differs.", None, 7)]

    serial = []
    for text, spk, seed in reqs:
        chunks = list(sample_pipeline_stream(
            tts, text, spk, rng_seed=seed, sc=SC, block_size=8,
            normalize_text=True, stop_at_flattening=False))
        serial.append(np.concatenate(chunks, axis=-1))

    per_row = {0: [], 1: []}
    for out in sample_pipeline_stream_batch(
            tts, reqs, sc=SC, block_size=8, normalize_text=True,
            stop_at_flattening=False):
        for i, c in out.items():
            per_row[i].append(c)
    for i in range(2):
        got = np.concatenate(per_row[i], axis=-1)
        assert got.shape == serial[i].shape
        np.testing.assert_allclose(got, serial[i], atol=2e-5, rtol=0)


def test_stream_batch_early_stop_per_row(tiny_tts, monkeypatch):  # noqa: F811
    """Per-row flattening stop: a row that flattens early disappears from the
    emission dicts and never emits past its point; the other row streams to
    completion; the batch stops sampling once ALL rows stopped."""
    import dataclasses

    from echo_tts_tpu.pipeline import flattening
    from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream_batch

    _, _, tts = tiny_tts
    sc = dataclasses.replace(SC, sequence_length=64)
    spl = tts.ae_cfg.frame_length

    calls = {}

    def fake_fp(data, **kw):
        # row identity via id of the array is fragile; key on data length +
        # a per-call counter: row 0 flattens at 30, row 1 never
        i = calls.get(data.shape, 0)
        calls[data.shape] = i + 1
        return np.int32(min(30, data.shape[0]) if i % 2 == 0 else data.shape[0])

    monkeypatch.setattr(flattening, "find_flattening_point", fake_fp)
    reqs = [("Stops early.", None, 1), ("Runs long.", None, 2)]
    totals = {0: 0, 1: 0}
    for out in sample_pipeline_stream_batch(tts, reqs, sc=sc, block_size=32,
                                            normalize_text=True):
        for i, c in out.items():
            totals[i] += c.shape[-1]
    # row 0: exactly 30 frames; row 1: full 64 (its fake fp == length => no
    # stop until final block emits everything)
    assert totals[0] == 30 * spl
    assert totals[1] == 64 * spl
