"""Real multi-process distributed tests (SURVEY.md §5.3/§5.8 prescriptions).

Round-2 gap closed here: `parallel/multihost.py`'s `process_count() > 1`
branches had only ever executed single-process. These tests spawn TWO real
`jax.distributed` CPU processes against a localhost coordinator, and a
kill-a-host fault-injection drill for the HostHealth/FleetCoordinator
recovery path (which deliberately lives OUTSIDE the collective layer — a
dead process hangs a collective, so detection cannot be a psum)."""
import os
import socket
import subprocess
import sys
import time

import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS_DIR)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_feed_barrier_identity():
    """Two jax.distributed CPU processes: make_array_from_process_local_data
    feeding, sync_global_devices barrier, and the dp=2 identity — the
    multihost branches actually execute with process_count()==2."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one local CPU device per process
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "multihost_worker.py"),
             f"127.0.0.1:{port}", "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=REPO, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, out


def test_kill_a_host_detected_and_recovered(tmp_path):
    """Fault injection (SURVEY.md §5.3): host 1 is a real subprocess that
    heartbeats through the shared filesystem, completes part of its work,
    and dies mid-assignment. The coordinator detects the stale heartbeat
    (HostHealth), reaps the orphaned utterances (FleetCoordinator), and
    resubmits them locally (run_with_retry) — pure-DP sampling is stateless
    per utterance, so recovery is resubmission."""
    from echo_tts_tpu.parallel.multihost import FleetCoordinator, run_with_retry

    beats = tmp_path / "beats"
    done_dir = tmp_path / "done"
    beats.mkdir()
    done_dir.mkdir()

    worker_code = f"""
import os, time
beats = {str(beats)!r}; done = {str(done_dir)!r}
for i in range(5):  # heartbeat; complete work 4 and 5; then die
    open(os.path.join(beats, "1"), "w").write(f"beat-{{i}}")
    if i in (1, 2):
        open(os.path.join(done, str(3 + i)), "w").write("ok")
    time.sleep(0.05)
os._exit(1)  # abrupt death mid-assignment (work 6, 7 orphaned)
"""
    fleet = FleetCoordinator(stale_after_s=0.8)
    results = {}

    def local_run(work_id):
        results[work_id] = work_id * 10  # stands in for sample_pipeline
        return results[work_id]

    # host 0 = this process; host 1 = the flaky subprocess. Its work is
    # assigned only once it is observed ALIVE (first heartbeat) — otherwise
    # a slow process start is indistinguishable from death and the test
    # races its own staleness window.
    for w in (0, 1, 2, 3):
        fleet.assign(0, w)
    proc = subprocess.Popen([sys.executable, "-c", worker_code])
    start_deadline = time.monotonic() + 20
    while not (beats / "1").exists():
        assert time.monotonic() < start_deadline, "worker never started"
        time.sleep(0.02)
    for w in (4, 5, 6, 7):
        fleet.assign(1, w)

    for w in (0, 1, 2, 3):  # host 0 does its own work
        local_run(w)
        fleet.complete(0, w)
        fleet.observe_beat(0)

    seen_done = set()
    last_beat_content = None
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        b = beats / "1"
        if b.exists():
            content = b.read_text()
            if content != last_beat_content:  # only NEW beats count
                last_beat_content = content
                fleet.observe_beat(1)
            for f in done_dir.iterdir():  # observe each completion once
                w = int(f.name)
                if w not in seen_done:
                    seen_done.add(w)
                    fleet.complete(1, w)
        fleet.observe_beat(0)
        orphans = fleet.reap()
        if orphans:
            # only the dead host 1 is reaped; host 0 keeps beating
            assert 0 in fleet.health.last_beat
            for w in orphans:  # resubmit locally
                run_with_retry(lambda w=w: local_run(w))
                fleet.complete(0, w)
        if not fleet.pending():
            break
        time.sleep(0.05)
    proc.wait(timeout=10)

    assert fleet.done == {0, 1, 2, 3, 4, 5, 6, 7}
    assert set(fleet.reassigned) == {6, 7}, fleet.reassigned
    assert results[6] == 60 and results[7] == 70
    # host 1 was forgotten after the reap; host 0 is still healthy
    assert 1 not in fleet.health.last_beat
    assert fleet.health.stale_hosts() == []
