"""Per-row foundations for continuous batching (VERDICT r3 item 4): rows of
one device batch at DIFFERENT absolute stream positions must compute exactly
what each row would compute in its own solo run — per-row RoPE gathers,
per-row latent-KV appends, per-row self-length masks in the sampler, and
per-row vocoder stream state. No reference analogue (the reference is
single-utterance, gradio_app.py:229-430); this is the serving-side design
from SURVEY.md §5.7's device-resident streaming state."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.core.config import SamplerConfig
from echo_tts_tpu.models import dit as jdit
from echo_tts_tpu.models import s1dac
from echo_tts_tpu.sampling.blockwise import sample_block_core

from test_pipeline_parity import tiny_tts  # fixture reuse  # noqa: F401

SC = SamplerConfig(num_steps=2, sequence_length=16, truncation_factor=0.8)
TOTAL = 16


def _ctx(tts, b=2, seed=0):
    rng = np.random.default_rng(seed)
    cfg = tts.dit_cfg
    ids = jnp.asarray(rng.integers(0, 256, (b, 12)))
    tmask = jnp.asarray(np.tri(1).astype(bool)[0, :1].repeat(12)[None].repeat(b, 0))
    spk = jnp.asarray(rng.standard_normal((b, 8, cfg.latent_size)), jnp.float32)
    smask = jnp.ones((b, 8), bool)
    kvt = jdit.get_kv_cache_text(tts.dit_params, cfg, ids, tmask)
    kvs = jdit.get_kv_cache_speaker(tts.dit_params, cfg,
                                    spk.astype(tts.model_dtype))
    return ids, tmask, spk, smask, kvt, kvs


def _row(tree, r, batch_axis_map):
    """Slice row r out of a state pytree whose leaves' batch axes differ."""
    return {k: jax.tree_util.tree_map(
        lambda a, ax=ax: jax.lax.slice_in_dim(a, r, r + 1, axis=ax), v)
        for (k, v), ax in zip(tree.items(), batch_axis_map)}


def test_extend_latent_kv_per_row_matches_scalar(tiny_tts):  # noqa: F811
    _, _, tts = tiny_tts
    cfg, params = tts.dit_cfg, tts.dit_params
    rng = np.random.default_rng(3)
    lat = jnp.asarray(rng.standard_normal((2, 8, cfg.latent_size)),
                      tts.model_dtype)
    st = jdit.init_latent_kv_state(params, cfg, 2, TOTAL, tts.model_dtype)
    out = jdit.extend_latent_kv(params, cfg, st, lat, jnp.array([8, 4]))

    for r, sp in enumerate([8, 4]):
        st1 = jdit.init_latent_kv_state(params, cfg, 1, TOTAL, tts.model_dtype)
        ref = jdit.extend_latent_kv(params, cfg, st1, lat[r:r + 1],
                                    jnp.int32(sp))
        for key, ax in (("enc_k", 1), ("enc_v", 1), ("k", 1), ("v", 1)):
            got = jax.lax.slice_in_dim(out[key], r, r + 1, axis=ax)
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(ref[key], np.float32),
                                       atol=2e-5, rtol=1e-4,
                                       err_msg=f"row {r} {key}")


def test_sample_block_per_row_matches_scalar(tiny_tts):  # noqa: F811
    """A B=2 block step with start_pos=[8, 4] equals each row's solo scalar
    step: per-row RoPE, per-row latent-key gating, per-row prefix write."""
    _, _, tts = tiny_tts
    cfg, params = tts.dit_cfg, tts.dit_params
    rng = np.random.default_rng(5)
    ids, tmask, spk, smask, kvt, kvs = _ctx(tts, b=2)

    # build per-row context: row 0 has 8 latents of prefix, row 1 has 4
    seed_lat = jnp.asarray(rng.standard_normal((2, 8, cfg.latent_size)),
                           jnp.float32)
    st = jdit.init_latent_kv_state(params, cfg, 2, TOTAL, tts.model_dtype)
    prefix = jnp.zeros((2, TOTAL, cfg.latent_size), jnp.float32)
    # seed row 0 with 8 latents at 0, row 1 with 4 latents at 0
    st = jdit.extend_latent_kv(
        params, cfg, st,
        jnp.where(jnp.array([True, False])[:, None, None], seed_lat,
                  jnp.pad(seed_lat[:, :4], ((0, 0), (0, 4), (0, 0)))
                  ).astype(tts.model_dtype),
        jnp.array([0, 0]))
    prefix = prefix.at[0, :8].set(seed_lat[0])
    prefix = prefix.at[1, :4].set(seed_lat[1, :4])

    noise = jnp.asarray(rng.standard_normal((2, 4, cfg.latent_size)),
                        jnp.float32)
    start = jnp.array([8, 4])
    out_prefix, out_st = sample_block_core(
        params, cfg, SC, prefix, st, start, noise, tmask, smask, kvt, kvs,
        4, TOTAL, tts.model_dtype)

    for r, sp in enumerate([8, 4]):
        st1 = jdit.init_latent_kv_state(params, cfg, 1, TOTAL, tts.model_dtype)
        n_seed = sp
        st1 = jdit.extend_latent_kv(
            params, cfg, st1,
            seed_lat[r:r + 1, :n_seed].astype(tts.model_dtype), jnp.int32(0))
        # row 1's scalar reference state must match the batched one: the
        # batched seed extended 8 latents for BOTH rows (row 1's tail 4 are
        # zeros and sit past its start_pos, gated off by the latent mask) —
        # so extend the scalar state with the same padded zeros
        if n_seed < 8:
            st1 = jdit.extend_latent_kv(
                params, cfg, st1,
                jnp.zeros((1, 8 - n_seed, cfg.latent_size), tts.model_dtype),
                jnp.int32(n_seed))
        p1 = jnp.zeros((1, TOTAL, cfg.latent_size), jnp.float32
                       ).at[0, :n_seed].set(seed_lat[r, :n_seed])
        ref_prefix, _ = sample_block_core(
            params, cfg, SC, p1, st1, jnp.int32(sp), noise[r:r + 1],
            tmask[r:r + 1], smask[r:r + 1],
            jax.tree_util.tree_map(lambda a: a[:, r:r + 1], kvt),
            jax.tree_util.tree_map(lambda a: a[:, r:r + 1], kvs),
            4, TOTAL, tts.model_dtype)
        np.testing.assert_allclose(
            np.asarray(out_prefix[r, sp:sp + 4]),
            np.asarray(ref_prefix[0, sp:sp + 4]), atol=2e-5, rtol=1e-4,
            err_msg=f"row {r}")


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_self_len_masks_partial_final_block(tiny_tts, impl):  # noqa: F811
    """valid_len masking: a row sampling an 8-block with valid_len=4 must
    produce, on its 4 valid positions, exactly the solo 4-block result —
    the in-block keys past the budget are invisible (both attention impls)."""
    _, _, tts = tiny_tts
    cfg, params = tts.dit_cfg, tts.dit_params
    rng = np.random.default_rng(7)
    ids, tmask, spk, smask, kvt, kvs = _ctx(tts, b=1)
    noise8 = jnp.asarray(rng.standard_normal((1, 8, cfg.latent_size)),
                         jnp.float32)

    jdit.set_attention_impl(impl)
    try:
        st = jdit.init_latent_kv_state(params, cfg, 1, TOTAL, tts.model_dtype)
        prefix = jnp.zeros((1, TOTAL, cfg.latent_size), jnp.float32)
        out8, _ = sample_block_core(
            params, cfg, SC, prefix, st, jnp.array([0]), noise8, tmask,
            smask, kvt, kvs, 8, TOTAL, tts.model_dtype,
            valid_len=jnp.array([4]))

        st = jdit.init_latent_kv_state(params, cfg, 1, TOTAL, tts.model_dtype)
        prefix = jnp.zeros((1, TOTAL, cfg.latent_size), jnp.float32)
        ref4, _ = sample_block_core(
            params, cfg, SC, prefix, st, jnp.int32(0), noise8[:, :4], tmask,
            smask, kvt, kvs, 4, TOTAL, tts.model_dtype)
    finally:
        jdit.set_attention_impl("auto")
    np.testing.assert_allclose(np.asarray(out8[0, :4]),
                               np.asarray(ref4[0, :4]), atol=2e-5, rtol=1e-4)


def test_stream_group_join_matches_solo(tiny_tts):  # noqa: F811
    """End-to-end device-side drill of the continuous scheduler's
    executables: request A starts a 2-slot group; request B joins at the
    next block boundary (_join_row); both finish. Every per-row audio chunk
    must equal the same request's SOLO streaming run (stream_blocks_fused
    with the same seed/schedule)."""
    from echo_tts_tpu.pipeline.pipeline import (
        _join_row,
        _stream_step_rows,
        init_stream_group,
        stream_blocks_fused,
    )
    from echo_tts_tpu.sampling.euler_cfg import draw_noise

    _, _, tts = tiny_tts
    cfg = tts.dit_cfg
    seq, bs = 16, 8
    total = seq + bs  # one block of headroom for final partial blocks
    rng = np.random.default_rng(11)
    reqs = []
    for r in range(2):
        ids = jnp.asarray(rng.integers(0, 256, (1, 12)))
        tmask = jnp.ones((1, 12), bool)
        spk = jnp.asarray(rng.standard_normal((1, 16, cfg.latent_size)),
                          jnp.float32)
        smask = jnp.ones((1, 16), bool)
        noise = np.asarray(draw_noise(20 + r, (1, seq, cfg.latent_size)))
        reqs.append((ids, tmask, spk, smask, noise))

    def step(gs, starts, valids, noise_rows):
        return _stream_step_rows(
            tts.dit_params, cfg, SC, tts.ae_params, tts.ae_cfg, tts.pca, gs,
            jnp.asarray(starts, jnp.int32), jnp.asarray(valids, jnp.int32),
            jnp.asarray(np.stack(noise_rows), jnp.float32), bs, total,
            tts.model_dtype, 64)

    z8 = np.zeros((seq // 2, cfg.latent_size), np.float32)
    gs = init_stream_group(tts, 2, total, 12, 16)
    gs = _join_row(tts.dit_params, cfg, tts.ae_params, tts.ae_cfg, gs, 0,
                   *reqs[0][:4], tts.model_dtype)
    audio = {0: [], 1: []}
    gs, a, _bl = step(gs, [0, 0], [8, 0], [reqs[0][4][0, :8], z8])
    audio[0].append(np.asarray(a[0:1], np.float32))
    # B arrives mid-stream-A: joins slot 1 at the block boundary
    gs = _join_row(tts.dit_params, cfg, tts.ae_params, tts.ae_cfg, gs, 1,
                   *reqs[1][:4], tts.model_dtype)
    gs, a, _bl = step(gs, [8, 0], [8, 8], [reqs[0][4][0, 8:], reqs[1][4][0, :8]])
    audio[0].append(np.asarray(a[0:1], np.float32))
    audio[1].append(np.asarray(a[1:2], np.float32))
    # A retired; B finishes
    gs, a, _bl = step(gs, [16, 8], [0, 8], [z8, reqs[1][4][0, 8:]])
    audio[1].append(np.asarray(a[1:2], np.float32))

    for r in range(2):
        ids, tmask, spk, smask, noise = reqs[r]
        solo = [np.asarray(chunk, np.float32)
                for _, chunk, _, _ in stream_blocks_fused(
                    tts.dit_params, cfg, SC, tts.ae_params, tts.ae_cfg,
                    tts.pca, spk, smask, ids, tmask, (8, 8),
                    [jnp.asarray(noise[:, :8]), jnp.asarray(noise[:, 8:])],
                    tts.model_dtype)]
        assert len(solo) == len(audio[r]) == 2
        for i, (got, ref) in enumerate(zip(audio[r], solo)):
            np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4,
                                       err_msg=f"row {r} chunk {i}")


def test_stream_group_partial_final_block(tiny_tts):  # noqa: F811
    """A row whose budget is not a block multiple retires on a PARTIAL final
    block: its valid positions must equal the solo run with the exact
    schedule (8, 4) — the self-length mask hides the 4 overrun positions."""
    from echo_tts_tpu.pipeline.pipeline import (
        _join_row,
        _stream_step_rows,
        init_stream_group,
        stream_blocks_fused,
    )
    from echo_tts_tpu.sampling.euler_cfg import draw_noise

    _, _, tts = tiny_tts
    cfg = tts.dit_cfg
    seq, bs = 12, 8  # 12 = 8 + partial 4
    total = seq + bs
    rng = np.random.default_rng(13)
    ids = jnp.asarray(rng.integers(0, 256, (1, 12)))
    tmask = jnp.ones((1, 12), bool)
    spk = jnp.asarray(rng.standard_normal((1, 16, cfg.latent_size)),
                      jnp.float32)
    smask = jnp.ones((1, 16), bool)
    noise = np.asarray(draw_noise(31, (1, seq, cfg.latent_size)))
    sc = SamplerConfig(num_steps=2, sequence_length=seq,
                       truncation_factor=0.8)

    gs = init_stream_group(tts, 2, total, 12, 16)
    gs = _join_row(tts.dit_params, cfg, tts.ae_params, tts.ae_cfg, gs, 0,
                   ids, tmask, spk, smask, tts.model_dtype)

    def step(gs, starts, valids, noise_rows):
        return _stream_step_rows(
            tts.dit_params, cfg, sc, tts.ae_params, tts.ae_cfg, tts.pca, gs,
            jnp.asarray(starts, jnp.int32), jnp.asarray(valids, jnp.int32),
            jnp.asarray(np.stack(noise_rows), jnp.float32), bs, total,
            tts.model_dtype, 64)

    z8 = np.zeros((8, cfg.latent_size), np.float32)
    got = []
    gs, a, _bl = step(gs, [0, 0], [8, 0], [noise[0, :8], z8])
    got.append(np.asarray(a[0:1, :, :8 * tts.ae_cfg.frame_length]))
    pad_noise = np.concatenate([noise[0, 8:], np.zeros((4, cfg.latent_size),
                                                       np.float32)])
    gs, a, _bl = step(gs, [8, 0], [4, 0], [pad_noise, z8])
    got.append(np.asarray(a[0:1, :, :4 * tts.ae_cfg.frame_length]))

    solo = [np.asarray(chunk, np.float32)
            for _, chunk, _, _ in stream_blocks_fused(
                tts.dit_params, cfg, sc, tts.ae_params, tts.ae_cfg, tts.pca,
                spk, smask, ids, tmask, (8, 4),
                [jnp.asarray(noise[:, :8]), jnp.asarray(noise[:, 8:])],
                tts.model_dtype)]
    for i, (g, r) in enumerate(zip(got, solo)):
        np.testing.assert_allclose(g, r, atol=2e-5, rtol=1e-4,
                                   err_msg=f"chunk {i}")


def test_resize_group_elastic_matches_solo(tiny_tts):  # noqa: F811
    """Elastic group sizing (pipeline._resize_group): grow 1->2 to admit a
    second stream, then shrink 2->1 with a PERMUTED compaction (survivor
    moves from slot 1 to slot 0) after the first retires. Every chunk of
    both streams must equal the solo run — the row gather preserves each
    stream's ctx KV / latent KV / prefix / vocoder state exactly."""
    from echo_tts_tpu.pipeline.pipeline import (
        _join_row,
        _resize_group,
        _stream_step_rows,
        init_stream_group,
        stream_blocks_fused,
    )
    from echo_tts_tpu.sampling.euler_cfg import draw_noise

    _, _, tts = tiny_tts
    cfg = tts.dit_cfg
    seq, bs = 16, 8
    total = seq + bs
    rng = np.random.default_rng(17)
    reqs = []
    for r in range(2):
        ids = jnp.asarray(rng.integers(0, 256, (1, 12)))
        tmask = jnp.ones((1, 12), bool)
        spk = jnp.asarray(rng.standard_normal((1, 16, cfg.latent_size)),
                          jnp.float32)
        smask = jnp.ones((1, 16), bool)
        noise = np.asarray(draw_noise(60 + r, (1, seq, cfg.latent_size)))
        reqs.append((ids, tmask, spk, smask, noise))

    def step(gs, starts, valids, noise_rows):
        b = len(starts)
        return _stream_step_rows(
            tts.dit_params, cfg, SC, tts.ae_params, tts.ae_cfg, tts.pca, gs,
            jnp.asarray(starts, jnp.int32), jnp.asarray(valids, jnp.int32),
            jnp.asarray(np.stack(noise_rows), jnp.float32), bs, total,
            tts.model_dtype, 64)

    z8 = np.zeros((seq // 2, cfg.latent_size), np.float32)
    audio = {0: [], 1: []}
    # b=1: A alone
    gs = init_stream_group(tts, 1, total, 12, 16)
    gs = _join_row(tts.dit_params, cfg, tts.ae_params, tts.ae_cfg, gs, 0,
                   *reqs[0][:4], tts.model_dtype)
    gs, a, _bl = step(gs, [0], [8], [reqs[0][4][0, :8]])
    audio[0].append(np.asarray(a[0:1], np.float32))
    # B arrives: grow 1 -> 2, admit into slot 1
    gs = _resize_group(gs, np.array([0, 0], np.int32),
                       np.array([True, False]))
    gs = _join_row(tts.dit_params, cfg, tts.ae_params, tts.ae_cfg, gs, 1,
                   *reqs[1][:4], tts.model_dtype)
    gs, a, _bl = step(gs, [8, 0], [8, 8],
                      [reqs[0][4][0, 8:], reqs[1][4][0, :8]])
    audio[0].append(np.asarray(a[0:1], np.float32))
    audio[1].append(np.asarray(a[1:2], np.float32))
    # A retired: shrink 2 -> 1, surviving B moves slot 1 -> 0
    gs = _resize_group(gs, np.array([1], np.int32), np.array([True]))
    gs, a, _bl = step(gs, [8], [8], [reqs[1][4][0, 8:]])
    audio[1].append(np.asarray(a[0:1], np.float32))

    for r in range(2):
        ids, tmask, spk, smask, noise = reqs[r]
        solo = [np.asarray(chunk, np.float32)
                for _, chunk, _, _ in stream_blocks_fused(
                    tts.dit_params, cfg, SC, tts.ae_params, tts.ae_cfg,
                    tts.pca, spk, smask, ids, tmask, (8, 8),
                    [jnp.asarray(noise[:, :8]), jnp.asarray(noise[:, 8:])],
                    tts.model_dtype)]
        assert len(solo) == len(audio[r]) == 2
        for i, (got, ref) in enumerate(zip(audio[r], solo)):
            np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4,
                                       err_msg=f"row {r} chunk {i}")


def test_engine_continuous_solo_matches_plain_stream(tiny_tts):  # noqa: F811
    """A single stream through a continuous engine equals the plain solo
    streaming pipeline with the same seed and uniform block schedule."""
    import dataclasses

    from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream
    from echo_tts_tpu.serve.engine import Engine

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts), max_batch=2, continuous=True)
    try:
        got = np.concatenate(list(eng.generate_stream(
            "Continuous solo.", None, seed=5, sc=SC, block_size=8)), axis=-1)
        h = eng.health()
        assert "continuous_groups" in h  # live-group observability surface
        for g in h["continuous_groups"]:
            assert set(g) == {"rows", "active", "joined", "max_rows",
                              "steps"}
    finally:
        eng.close()
    ref = np.concatenate(list(sample_pipeline_stream(
        tts, "Continuous solo.", None, 5, sc=SC, block_size=8,
        normalize_text=True)), axis=-1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_engine_continuous_staggered_join(tiny_tts):  # noqa: F811
    """Stream B arrives while stream A's group is RUNNING and joins it at a
    block boundary (one group serves both — engine.stats['batches'] == 1);
    each stream's audio equals its solo run."""
    import dataclasses
    import threading
    import time

    from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream
    from echo_tts_tpu.serve.engine import Engine

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts), max_batch=2, continuous=True)
    texts = {40: "Stagger A stream.", 41: "Stagger B later."}
    ref = {seed: np.concatenate(list(sample_pipeline_stream(
        tts, text, None, seed, sc=SC, block_size=4,
        normalize_text=True)), axis=-1) for seed, text in texts.items()}
    got = {}
    try:
        def run(seed):
            got[seed] = np.concatenate(list(eng.generate_stream(
                texts[seed], None, seed=seed, sc=SC, block_size=4)), axis=-1)

        ta = threading.Thread(target=run, args=(40,))
        ta.start()
        # wait until A's group is live, then send B mid-stream
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            scheds = list(eng._cont_scheds.values())
            if scheds and scheds[0].n_active >= 1:
                break
            time.sleep(0.01)
        else:
            raise AssertionError("stream A's group never went live")
        tb = threading.Thread(target=run, args=(41,))
        tb.start()
        ta.join(timeout=300)
        tb.join(timeout=300)
    finally:
        eng.close()
    assert set(got) == {40, 41}
    for seed in texts:
        assert got[seed].shape == ref[seed].shape, seed
        np.testing.assert_allclose(got[seed], ref[seed], atol=2e-5, rtol=0,
                                   err_msg=str(seed))
    sched = list(eng._cont_scheds.values())[0]
    assert sched.n_joined == 2, "B did not join A's running group"
    assert sched.max_b == 2, "the elastic group never grew to 2 rows"
    assert sched.cur_b == 1, "the group did not shrink back after retirement"
    assert eng.health()["requests"] == 2
    assert eng.health()["batches"] == 1  # ONE group served both


def test_engine_continuous_int8_matches_plain_int8_stream(tiny_tts):  # noqa: F811
    """The continuous scheduler on an int8 engine equals the plain streaming
    pipeline run on the SAME quantized params — the measured continuous+int8
    serving mode (BASELINE.md) routes through {q,s} weight leaves identically
    to the solo path."""
    import dataclasses

    from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream
    from echo_tts_tpu.serve.engine import Engine

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts), max_batch=2, continuous=True,
                 int8=True)
    try:
        got = np.concatenate(list(eng.generate_stream(
            "Continuous int8.", None, seed=6, sc=SC, block_size=8)), axis=-1)
        ref_tts = dataclasses.replace(tts, dit_params=eng.tts.dit_params)
        ref = np.concatenate(list(sample_pipeline_stream(
            ref_tts, "Continuous int8.", None, 6, sc=SC, block_size=8,
            normalize_text=True)), axis=-1)
    finally:
        eng.close()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_engine_continuous_midpoint_matches_plain_stream(tiny_tts):  # noqa: F811
    """The continuous scheduler with the opt-in midpoint solver equals the
    plain solo streaming pipeline under the same SamplerConfig — the group
    step and fast-join paths are solver-agnostic through sc, which is what
    the measured continuous midpoint-stack serving cell (BASELINE.md trace
    table) relies on."""
    import dataclasses

    from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream
    from echo_tts_tpu.serve.engine import Engine

    _, _, tts = tiny_tts
    sc_mid = dataclasses.replace(SC, solver="midpoint")
    eng = Engine(dataclasses.replace(tts), max_batch=2, continuous=True)
    try:
        got = np.concatenate(list(eng.generate_stream(
            "Continuous midpoint.", None, seed=7, sc=sc_mid, block_size=8)),
            axis=-1)
    finally:
        eng.close()
    ref = np.concatenate(list(sample_pipeline_stream(
        tts, "Continuous midpoint.", None, 7, sc=sc_mid, block_size=8,
        normalize_text=True)), axis=-1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_engine_warmup_continuous_covers_size_ladder(tiny_tts, monkeypatch):  # noqa: F811
    """A continuous engine's warmup(include_streaming=True) pre-compiles the
    group executables at EVERY elastic group size (1, 2, ..., max) — a lone
    stream and a full group both find their step executable warm."""
    import dataclasses

    from echo_tts_tpu.pipeline import pipeline as pl
    from echo_tts_tpu.serve.engine import Engine

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts), max_batch=4, continuous=True,
                 continuous_block=8)
    seen = []
    real_step = pl._stream_step_rows

    def spy(*a, **k):
        seen.append(int(a[6]["prefix"].shape[0]))  # group row count
        return real_step(*a, **k)

    monkeypatch.setattr(pl, "_stream_step_rows", spy)
    try:
        eng.warmup(SC, include_speaker_buckets=False, include_streaming=True)
    finally:
        eng.close()
    assert {1, 2, 4} <= set(seen), seen


def test_vocoder_stream_per_row_pos(tiny_tts):  # noqa: F811
    """Batched stateful decode with per-row positions: stacking two solo
    stream states at different offsets and stepping them as one batch equals
    each solo stream's next chunk."""
    _, _, tts = tiny_tts
    cfg = tts.ae_cfg
    rng = np.random.default_rng(9)
    z = jnp.asarray(0.3 * rng.standard_normal((2, cfg.latent_dim, 16)),
                    jnp.float32)

    # advance row 0 by 8 frames, row 1 by 4, as solo streams
    states, outs = [], []
    for r, adv in enumerate([8, 4]):
        st = s1dac.streaming_decode_init(tts.ae_params, cfg, 1,
                                         per_row_pos=True)
        _, st = s1dac.decode_zq_stream_step(tts.ae_params, cfg, st,
                                            z[r:r + 1, :, :adv], 64)
        states.append(st)
    stacked = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), states[0], states[1])
    assert stacked["pos"].shape == (2,) and list(stacked["pos"]) == [8, 4]

    # batched step: row 0 decodes frames 8..12, row 1 frames 4..8
    chunk = jnp.stack([z[0, :, 8:12], z[1, :, 4:8]])
    audio, _ = s1dac.decode_zq_stream_step(tts.ae_params, cfg, stacked,
                                           chunk, 64)
    for r, adv in enumerate([8, 4]):
        ref, _ = s1dac.decode_zq_stream_step(
            tts.ae_params, cfg, states[r], z[r:r + 1, :, adv:adv + 4], 64)
        np.testing.assert_allclose(np.asarray(audio[r:r + 1]),
                                   np.asarray(ref), atol=2e-5, rtol=1e-4,
                                   err_msg=f"row {r}")
