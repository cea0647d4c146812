"""Round-5 continuous-serving semantics (VERDICT r4 items 1, 2, 4, 6):

* FIFO device lock: the continuous scheduler yields the engine lock at
  every block boundary, so one-shots / other-key streams / set_lora
  interleave with a sustained stream group instead of starving.
* Fast-path admission: a joiner's FIRST block is sampled solo in the
  admission dispatch (pipeline._join_row_first_block) and emitted BEFORE
  the boundary's group step — and the audio still equals the solo stream.
* Burst-proof elastic growth: a 4-arrival burst at an idle group is
  admitted at ONE boundary via a single multi-level resize.
* Lifecycle: Engine.close() unblocks active continuous clients within a
  bounded time; set_lora under load returns promptly, live groups keep
  their snapshotted params, new groups get the swap.

No reference analogue for any of this (single-utterance Gradio serving,
gradio_app.py:229-430)."""
import dataclasses
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.core.config import SamplerConfig
from echo_tts_tpu.utils.locks import FairLock

from test_pipeline_parity import tiny_tts  # fixture reuse  # noqa: F401

SC = SamplerConfig(num_steps=2, sequence_length=16, truncation_factor=0.8)


# -- FairLock ---------------------------------------------------------------

def test_fair_lock_fifo_order():
    lock = FairLock()
    order = []
    started = []

    def worker(i):
        started.append(i)
        with lock:
            order.append(i)

    with lock:
        threads = []
        for i in range(5):
            t = threading.Thread(target=worker, args=(i,))
            t.start()
            threads.append(t)
            # wait until this waiter is queued so arrival order is fixed
            deadline = time.monotonic() + 5
            while len(lock._waiters) < i + 1 and time.monotonic() < deadline:
                time.sleep(0.001)
    for t in threads:
        t.join(timeout=10)
    assert order == [0, 1, 2, 3, 4]


def test_fair_lock_no_starvation_under_reacquire_loop():
    """A thread that releases and immediately re-acquires in a tight loop
    (the continuous scheduler's shape) must hand the lock to a waiter in
    bounded time — the exact behavior a plain threading.Lock does not
    guarantee."""
    lock = FairLock()
    stop = threading.Event()
    got_it = threading.Event()

    def hog():
        while not stop.is_set():
            with lock:
                pass  # immediately re-acquire

    t = threading.Thread(target=hog, daemon=True)
    t.start()
    try:
        def waiter():
            with lock:
                got_it.set()

        w = threading.Thread(target=waiter, daemon=True)
        w.start()
        assert got_it.wait(timeout=10), "waiter starved behind re-acquire loop"
        w.join(timeout=10)
    finally:
        stop.set()
        t.join(timeout=10)


# -- fast-path admission ----------------------------------------------------

def test_join_row_first_block_matches_solo(tiny_tts):  # noqa: F811
    """Device-level exactness of the fast-join op: admitting B into A's
    running group via _join_row_first_block must produce B's first chunk
    (from the admission dispatch itself) and later group-step chunks all
    equal to B's solo stream."""
    from echo_tts_tpu.pipeline.pipeline import (
        _join_row,
        _join_row_first_block,
        _stream_step_rows,
        init_stream_group,
        stream_blocks_fused,
    )
    from echo_tts_tpu.sampling.euler_cfg import draw_noise

    _, _, tts = tiny_tts
    cfg = tts.dit_cfg
    seq, bs = 16, 8
    total = seq + bs
    rng = np.random.default_rng(23)
    reqs = []
    for r in range(2):
        ids = jnp.asarray(rng.integers(0, 256, (1, 12)))
        tmask = jnp.ones((1, 12), bool)
        spk = jnp.asarray(rng.standard_normal((1, 16, cfg.latent_size)),
                          jnp.float32)
        smask = jnp.ones((1, 16), bool)
        noise = np.asarray(draw_noise(70 + r, (1, seq, cfg.latent_size)))
        reqs.append((ids, tmask, spk, smask, noise))

    def step(gs, starts, valids, noise_rows):
        return _stream_step_rows(
            tts.dit_params, cfg, SC, tts.ae_params, tts.ae_cfg, tts.pca, gs,
            jnp.asarray(starts, jnp.int32), jnp.asarray(valids, jnp.int32),
            jnp.asarray(np.stack(noise_rows), jnp.float32), bs, total,
            tts.model_dtype, 64)

    z8 = np.zeros((seq // 2, cfg.latent_size), np.float32)
    audio = {0: [], 1: []}
    gs = init_stream_group(tts, 2, total, 12, 16)
    gs = _join_row(tts.dit_params, cfg, tts.ae_params, tts.ae_cfg, gs, 0,
                   *reqs[0][:4], tts.model_dtype)
    gs, a, _bl = step(gs, [0, 0], [8, 0], [reqs[0][4][0, :8], z8])
    audio[0].append(np.asarray(a[0:1], np.float32))
    # B arrives: fast join samples its FIRST block solo in the admission
    # dispatch — its first chunk exists before any group step includes it
    gs, a_b, bl_b = _join_row_first_block(
        tts.dit_params, cfg, SC, tts.ae_params, tts.ae_cfg, tts.pca, gs, 1,
        *reqs[1][:4], jnp.asarray(reqs[1][4][:, :8]), bs, total,
        tts.model_dtype, 64)
    audio[1].append(np.asarray(a_b, np.float32))
    assert bl_b.shape == (1, bs, cfg.latent_size)
    # group continues: A finishes its second block, B its second (pos=8)
    gs, a, _bl = step(gs, [8, 8], [8, 8],
                      [reqs[0][4][0, 8:], reqs[1][4][0, 8:]])
    audio[0].append(np.asarray(a[0:1], np.float32))
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


def test_engine_fast_join_emits_before_group_step(tiny_tts, monkeypatch):  # noqa: F811
    """End-to-end admission latency semantics: every admission goes through
    the fast-join executable and pushes the joiner's first chunk BEFORE the
    boundary's group step (scheduler-thread event order) — admission →
    first audio never waits for a group step. Audio equals solo."""
    from echo_tts_tpu.pipeline import pipeline as pl
    from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream
    from echo_tts_tpu.serve import continuous as cont
    from echo_tts_tpu.serve.engine import Engine

    _, _, tts = tiny_tts
    events = []  # appended only from the scheduler thread: total order

    real_join = pl._join_row_first_block
    real_step = pl._stream_step_rows
    real_emit = cont.ContinuousStreamScheduler._emit

    def join_spy(*a, **k):
        events.append(("join",))
        return real_join(*a, **k)

    def step_spy(*a, **k):
        events.append(("step",))
        return real_step(*a, **k)

    def emit_spy(self, rows, slot, *a, **k):
        events.append(("emit", rows[slot].pos))
        return real_emit(self, rows, slot, *a, **k)

    monkeypatch.setattr(pl, "_join_row_first_block", join_spy)
    monkeypatch.setattr(pl, "_stream_step_rows", step_spy)
    monkeypatch.setattr(cont.ContinuousStreamScheduler, "_emit", emit_spy)

    eng = Engine(dataclasses.replace(tts), max_batch=2, continuous=True)
    texts = {80: "Fast join A.", 81: "Fast join B, later."}
    ref = {seed: np.concatenate(list(sample_pipeline_stream(
        tts, text, None, seed, sc=SC, block_size=4,
        normalize_text=True)), axis=-1) for seed, text in texts.items()}
    got = {}
    try:
        def run(seed):
            got[seed] = np.concatenate(list(eng.generate_stream(
                texts[seed], None, seed=seed, sc=SC, block_size=4)), axis=-1)

        ta = threading.Thread(target=run, args=(80,))
        ta.start()
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            scheds = list(eng._cont_scheds.values())
            if scheds and scheds[0].n_active >= 1:
                break
            time.sleep(0.01)
        else:
            raise AssertionError("stream A's group never went live")
        tb = threading.Thread(target=run, args=(81,))
        tb.start()
        ta.join(timeout=300)
        tb.join(timeout=300)
    finally:
        eng.close()
    for seed in texts:
        np.testing.assert_allclose(got[seed], ref[seed], atol=2e-5, rtol=0,
                                   err_msg=str(seed))
    joins = [i for i, e in enumerate(events) if e[0] == "join"]
    assert len(joins) == 2, events
    for j in joins:
        # the event right after each fast join must be that row's first
        # chunk (pos 0) — in particular not a group step
        assert events[j + 1] == ("emit", 0), events[j:j + 3]


def test_engine_continuous_first_block_steps(tiny_tts):  # noqa: F811
    """SamplerConfig.first_block_steps now reaches continuous mode through
    the fast join: the stream equals the SOLO pipeline with the same knob
    (first block at reduced steps, rest at full steps), and requests with
    and without the knob share one group key."""
    from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream
    from echo_tts_tpu.serve.engine import Engine

    _, _, tts = tiny_tts
    sc_fb = dataclasses.replace(SC, first_block_steps=1)
    eng = Engine(dataclasses.replace(tts), max_batch=2, continuous=True)
    try:
        got = np.concatenate(list(eng.generate_stream(
            "First block steps.", None, seed=9, sc=sc_fb, block_size=8)),
            axis=-1)
        # knob-less request joins the same compatibility key
        key = next(iter(eng._cont_scheds))
        got_plain = np.concatenate(list(eng.generate_stream(
            "First block steps.", None, seed=9, sc=SC, block_size=8)),
            axis=-1)
        assert next(iter(eng._cont_scheds)) == key
        assert len(eng._cont_scheds) == 1
    finally:
        eng.close()
    ref = np.concatenate(list(sample_pipeline_stream(
        tts, "First block steps.", None, 9, sc=sc_fb, block_size=8,
        normalize_text=True)), axis=-1)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)
    ref_plain = np.concatenate(list(sample_pipeline_stream(
        tts, "First block steps.", None, 9, sc=SC, block_size=8,
        normalize_text=True)), axis=-1)
    np.testing.assert_allclose(got_plain, ref_plain, atol=2e-5, rtol=0)
    # the knob changed the first block: outputs must differ
    n = min(got.shape[-1], got_plain.shape[-1])
    assert not np.allclose(got[..., :n], got_plain[..., :n])


# -- fairness under sustained load ------------------------------------------

def test_mixed_traffic_interleaves_with_sustained_group(tiny_tts):  # noqa: F811
    """VERDICT r4 item 1 (the round's headline directive): under SUSTAINED
    key-A streaming load, (a) a one-shot generate and (b) a stream with a
    DIFFERENT compatibility key (other block size) both complete while the
    load continues — block-boundary lock yield + FIFO lock. Pre-round-5
    behavior: both wait indefinitely. Audio of every participant still
    matches its solo run."""
    from echo_tts_tpu.pipeline.pipeline import (
        sample_pipeline,
        sample_pipeline_stream,
    )
    from echo_tts_tpu.serve.engine import Engine

    _, _, tts = tiny_tts
    eng = Engine(dataclasses.replace(tts), max_batch=2, continuous=True)
    stop_feeding = threading.Event()
    feeder_results = []
    feeder_errors = []

    def feeder(tid):
        i = 0
        while not stop_feeding.is_set():
            seed = 100 + tid * 50 + i
            try:
                out = np.concatenate(list(eng.generate_stream(
                    "Sustained load stream.", None, seed=seed, sc=SC,
                    block_size=4)), axis=-1)
                feeder_results.append((seed, out))
            except Exception as e:  # pragma: no cover
                feeder_errors.append(e)
                return
            i += 1

    feeders = [threading.Thread(target=feeder, args=(t,)) for t in range(2)]
    try:
        for t in feeders:
            t.start()
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            scheds = list(eng._cont_scheds.values())
            if scheds and scheds[0].n_active >= 1:
                break
            time.sleep(0.01)
        else:
            raise AssertionError("sustained group never went live")

        # (a) one-shot under load
        oneshot = {}

        def do_oneshot():
            oneshot["out"] = eng.generate("One shot under load.", None,
                                          seed=7, sc=SC)

        t1 = threading.Thread(target=do_oneshot)
        t1.start()
        t1.join(timeout=300)
        assert not t1.is_alive(), "one-shot starved behind continuous group"
        assert "out" in oneshot

        # (b) different-key stream (block size 8 != 4) under load
        other = {}

        def do_other():
            other["out"] = np.concatenate(list(eng.generate_stream(
                "Other key stream.", None, seed=8, sc=SC, block_size=8)),
                axis=-1)

        t2 = threading.Thread(target=do_other)
        t2.start()
        t2.join(timeout=300)
        assert not t2.is_alive(), "other-key stream starved"
        # load genuinely sustained: feeders keep completing streams after
        # the interlopers finished (an instantaneous n_active snapshot is
        # flaky — both feeders can be between streams at the sample moment)
        n_before = len(feeder_results)
        deadline = time.monotonic() + 300
        while (len(feeder_results) <= n_before
               and time.monotonic() < deadline):
            time.sleep(0.05)
        assert len(feeder_results) > n_before, \
            "feeders stopped while the interlopers ran"
    finally:
        stop_feeding.set()
        for t in feeders:
            t.join(timeout=300)
        eng.close()
    assert not feeder_errors
    assert len(feeder_results) >= 2

    # exactness spot checks against solo references
    a_ref, _, _ = sample_pipeline(tts, "One shot under load.", None, 7,
                                  sc=SC, normalize_text=True)
    np.testing.assert_allclose(oneshot["out"][0], a_ref, atol=2e-5, rtol=0)
    o_ref = np.concatenate(list(sample_pipeline_stream(
        tts, "Other key stream.", None, 8, sc=SC, block_size=8,
        normalize_text=True)), axis=-1)
    np.testing.assert_allclose(other["out"], o_ref, atol=2e-5, rtol=0)
    seed, out = feeder_results[0]
    f_ref = np.concatenate(list(sample_pipeline_stream(
        tts, "Sustained load stream.", None, seed, sc=SC, block_size=4,
        normalize_text=True)), axis=-1)
    np.testing.assert_allclose(out, f_ref, atol=2e-5, rtol=0)


def test_oneshot_interleaves_with_direct_stream(tiny_tts):  # noqa: F811
    """The dispatch/direct streaming paths take the device lock PER BLOCK
    (r5): a one-shot generate on the same engine completes while a long
    stream is still mid-flight instead of waiting for it to finish. Stream
    audio still equals the solo pipeline run."""
    from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream
    from echo_tts_tpu.serve.engine import Engine

    _, _, tts = tiny_tts
    sc_long = dataclasses.replace(SC, sequence_length=64)
    eng = Engine(dataclasses.replace(tts))  # max_batch=1: direct paths
    stream_done = threading.Event()
    chunks = []

    def run_stream():
        try:
            for c in eng.generate_stream("A long direct stream.", None,
                                         seed=21, sc=sc_long, block_size=4):
                chunks.append(c)
        finally:
            stream_done.set()

    t = threading.Thread(target=run_stream)
    t.start()
    try:
        deadline = time.monotonic() + 120
        while not chunks and time.monotonic() < deadline:
            time.sleep(0.01)
        assert chunks, "stream produced no audio"
        audio, _, _ = eng.generate("Quick one shot.", None, seed=22, sc=SC)
        assert audio.shape[-1] > 0
        assert not stream_done.is_set(), \
            "stream already finished — interleave not demonstrated " \
            "(lengthen the stream)"
    finally:
        t.join(timeout=300)
    ref = np.concatenate(list(sample_pipeline_stream(
        tts, "A long direct stream.", None, 21, sc=sc_long, block_size=4,
        normalize_text=True)), axis=-1)
    np.testing.assert_allclose(np.concatenate(chunks, axis=-1), ref,
                               atol=2e-5, rtol=0)


# -- burst-proof elastic growth ---------------------------------------------

def test_burst_admitted_at_one_boundary(tiny_tts, monkeypatch):  # noqa: F811
    """A 4-stream burst at an idle group is admitted at the FIRST boundary
    through ONE multi-level resize (1→4), not a 1→2→4 ladder across two
    boundaries (VERDICT r4 item 4)."""
    from echo_tts_tpu.pipeline import pipeline as pl
    from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream
    from echo_tts_tpu.serve.engine import Engine

    _, _, tts = tiny_tts
    resizes = []
    real_resize = pl._resize_group

    def resize_spy(gs, perm, keep):
        resizes.append((int(gs["prefix"].shape[0]), len(perm)))
        return real_resize(gs, perm, keep)

    monkeypatch.setattr(pl, "_resize_group", resize_spy)
    eng = Engine(dataclasses.replace(tts), max_batch=4, continuous=True)
    texts = {90 + i: f"Burst stream {i}." for i in range(4)}
    got = {}
    try:
        def run(seed):
            got[seed] = np.concatenate(list(eng.generate_stream(
                texts[seed], None, seed=seed, sc=SC, block_size=4)), axis=-1)

        threads = []
        # hold the device lock so the scheduler cannot reach its first
        # boundary until ALL four arrivals are queued — a deterministic
        # burst
        with eng._lock:
            for seed in texts:
                t = threading.Thread(target=run, args=(seed,))
                t.start()
                threads.append(t)
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline:
                scheds = list(eng._cont_scheds.values())
                if scheds and scheds[0].pending.qsize() == 4:
                    break
                time.sleep(0.005)
            else:
                raise AssertionError("burst never fully queued")
            sched = scheds[0]
        for t in threads:
            t.join(timeout=300)
    finally:
        eng.close()
    assert sched.n_joined == 4
    assert sched.max_b == 4
    grows = [(a, b) for a, b in resizes if b > a]
    assert grows == [(1, 4)], f"burst took multiple grow boundaries: {resizes}"
    for seed, text in texts.items():
        ref = np.concatenate(list(sample_pipeline_stream(
            tts, text, None, seed, sc=SC, block_size=4,
            normalize_text=True)), axis=-1)
        np.testing.assert_allclose(got[seed], ref, atol=2e-5, rtol=0,
                                   err_msg=str(seed))


# -- lifecycle ---------------------------------------------------------------

def test_close_with_active_group_unblocks_clients(tiny_tts):  # noqa: F811
    """Engine.close() signals live continuous schedulers: clients get END
    (or an error) within a bounded time and the scheduler thread exits —
    no drain-forever (VERDICT r4 item 6)."""
    from echo_tts_tpu.serve.engine import Engine

    _, _, tts = tiny_tts
    # long budget so the stream is reliably mid-flight at close
    sc = dataclasses.replace(SC, sequence_length=64)
    eng = Engine(dataclasses.replace(tts), max_batch=2, continuous=True)
    result = {}

    def run():
        chunks = []
        try:
            for c in eng.generate_stream("Close mid stream.", None, seed=3,
                                         sc=sc, block_size=4):
                chunks.append(c)
            result["end"] = "clean"
        except RuntimeError as e:
            result["end"] = f"error: {e}"
        result["chunks"] = len(chunks)

    t = threading.Thread(target=run)
    t.start()
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        scheds = list(eng._cont_scheds.values())
        if scheds and scheds[0].n_active >= 1:
            break
        time.sleep(0.01)
    else:
        raise AssertionError("group never went live")
    sched = scheds[0]
    eng.close()
    t.join(timeout=60)
    assert not t.is_alive(), "client still blocked after close()"
    assert "end" in result
    sched.thread.join(timeout=30)
    assert not sched.thread.is_alive(), "scheduler thread survived close()"
    # a post-close stream is refused with a clear error
    with pytest.raises(RuntimeError):
        list(eng.generate_stream("After close.", None, seed=4, sc=SC,
                                 block_size=4))


def test_set_lora_under_continuous_load(tiny_tts, tmp_path):  # noqa: F811
    """set_lora during a live group returns within a bounded time (FIFO
    lock, no drain wait); the LIVE group keeps its snapshotted params (its
    audio equals the solo run on BASE params), and a stream issued after
    the swap uses the merged params."""
    from echo_tts_tpu.pipeline.pipeline import sample_pipeline_stream
    from echo_tts_tpu.serve.engine import Engine
    from echo_tts_tpu.train.lora import (
        LoRAConfig,
        init_lora,
        save_lora_checkpoint,
    )

    _, _, tts = tiny_tts
    sc = dataclasses.replace(SC, sequence_length=64)  # long-lived group
    eng = Engine(dataclasses.replace(tts), max_batch=2, continuous=True)
    lc = LoRAConfig(rank=2)
    lora = init_lora(jax.random.PRNGKey(0), eng._base_params, lc)
    # make B nonzero so the swap changes outputs
    lora["blocks.attention.wq"]["b"] = (
        jnp.ones_like(lora["blocks.attention.wq"]["b"]) * 0.1)
    p = str(tmp_path / "lora.npz")
    save_lora_checkpoint(p, lora, lc)

    live = {}

    def run_live():
        live["out"] = np.concatenate(list(eng.generate_stream(
            "Live during swap.", None, seed=11, sc=sc, block_size=4)),
            axis=-1)

    t = threading.Thread(target=run_live)
    try:
        t.start()
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            scheds = list(eng._cont_scheds.values())
            if scheds and scheds[0].n_active >= 1:
                break
            time.sleep(0.01)
        else:
            raise AssertionError("group never went live")

        swap = threading.Thread(target=lambda: eng.set_lora(p))
        swap.start()
        swap.join(timeout=300)
        assert not swap.is_alive(), "set_lora blocked behind live group"
        t.join(timeout=300)
        assert not t.is_alive()

        # live stream finished on the snapshot (base params)
        base_ref = np.concatenate(list(sample_pipeline_stream(
            tts, "Live during swap.", None, 11, sc=sc, block_size=4,
            normalize_text=True)), axis=-1)
        np.testing.assert_allclose(live["out"], base_ref, atol=2e-5, rtol=0)

        # wait for the group to drain, then a NEW stream uses the merge
        for s in scheds:
            s.thread.join(timeout=60)
        after = np.concatenate(list(eng.generate_stream(
            "After the swap.", None, seed=12, sc=SC, block_size=4)), axis=-1)
        lora_tts = dataclasses.replace(tts, dit_params=eng.tts.dit_params)
        lora_ref = np.concatenate(list(sample_pipeline_stream(
            lora_tts, "After the swap.", None, 12, sc=SC, block_size=4,
            normalize_text=True)), axis=-1)
        np.testing.assert_allclose(after, lora_ref, atol=2e-5, rtol=0)
        plain_ref = np.concatenate(list(sample_pipeline_stream(
            tts, "After the swap.", None, 12, sc=SC, block_size=4,
            normalize_text=True)), axis=-1)
        n = min(after.shape[-1], plain_ref.shape[-1])
        assert not np.allclose(after[..., :n], plain_ref[..., :n]), \
            "swap had no effect on a post-swap stream"
    finally:
        eng.close()
