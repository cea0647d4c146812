"""Fleet driver integration (parallel/fleet.py + batch_synthesize --workers):
REAL worker subprocesses doing real (tiny-model) synthesis, one killed
mid-run, job completes with outputs identical to a single-process run —
the executable form of SURVEY.md §5.3 (VERDICT r3 item 1). The reference
has no multi-process anything (SURVEY §2.2)."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

REQS = [
    {"id": "a", "text": "Fleet item one.", "speaker": None, "seed": 1},
    {"id": "b", "text": "Fleet item two.", "speaker": None, "seed": 2},
    {"id": "c", "text": "Fleet item three.", "speaker": None, "seed": 3},
    {"id": "d", "text": "Fleet item four.", "speaker": None, "seed": 4},
]
# max_batch=1 makes every utterance its own B=1 device call, so output bytes
# are grouping-independent — the fleet run (different per-worker batching,
# plus a reassigned utterance) must reproduce the single-process run EXACTLY
COMMON = ["--random-tiny", "--cpu", "--max-batch", "1",
          "--num-steps", "2", "--sequence-length", "16"]


def _write_reqs(tmp_path):
    inp = tmp_path / "reqs.jsonl"
    inp.write_text("\n".join(json.dumps(r) for r in REQS))
    return inp


def test_fleet_kill_a_worker_completes_identically(tmp_path, capsys):
    """Coordinator spawns 2 real worker processes; worker 1 os._exits after
    its first utterance (abrupt death, no cleanup). The coordinator must
    detect it, reassign its unfinished work to worker 0, and finish the
    JSONL->WAV job with every output byte-identical to a single-process
    run."""
    import batch_synthesize

    inp = _write_reqs(tmp_path)
    ref_dir, fleet_dir = tmp_path / "ref", tmp_path / "fleet"

    batch_synthesize.main(
        ["--input", str(inp), "--outdir", str(ref_dir)] + COMMON)
    capsys.readouterr()

    batch_synthesize.main(
        ["--input", str(inp), "--outdir", str(fleet_dir), "--workers", "2",
         "--worker-die-after", "1:1", "--stale-after-s", "120"] + COMMON)
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert summary["files"] == len(REQS)
    assert summary["dead_workers"] == [1]
    assert summary["reassigned"] >= 1  # the dead worker's unfinished work
    for r in REQS:
        ref = (ref_dir / (r["id"] + ".wav")).read_bytes()
        got = (fleet_dir / (r["id"] + ".wav")).read_bytes()
        assert got == ref, f"fleet output for {r['id']} differs from solo run"


def test_coordinator_reassigns_without_procs(tmp_path):
    """Transport-level drill (no model, no subprocesses): coordinator_loop
    driven purely by heartbeat files — a worker that stops beating with
    work pending is reaped on staleness alone (the only signal a real
    multi-host fleet has) and its work lands on the survivor."""
    import threading
    import time

    from echo_tts_tpu.parallel.fleet import (
        FleetPaths, atomic_write, coordinator_loop, read_assignments)

    fleet_dir = str(tmp_path / "fleet")
    paths = FleetPaths(fleet_dir)
    reqs = [{"id": f"w{i}"} for i in range(6)]
    stop = threading.Event()

    def fake_worker(wid, die_after=None, delay=0.05):
        n, done = 0, set()
        while not stop.is_set():
            atomic_write(paths.beat_file(wid), f"{n}\n")
            n += 1
            todo = [r for r in read_assignments(paths.assign_file(wid))
                    if r["id"] not in done]
            for r in todo:
                time.sleep(delay)
                atomic_write(paths.done_file(r["id"]), str(wid))
                done.add(r["id"])
                if die_after is not None and len(done) >= die_after:
                    return  # stops beating — looks dead to the coordinator
            if os.path.exists(paths.stop_file):
                return
            time.sleep(0.02)

    threads = [threading.Thread(target=fake_worker, args=(0,)),
               threading.Thread(target=fake_worker, args=(1, 1))]
    for t in threads:
        t.start()
    try:
        fleet = coordinator_loop(fleet_dir, reqs, [0, 1],
                                 stale_after_s=0.5, poll_s=0.02,
                                 deadline_s=60.0)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=10)
    assert fleet.done == {r["id"] for r in reqs}
    assert len(fleet.reassigned) >= 1
    done_by = {r["id"]: (paths.root and open(paths.done_file(r["id"])).read())
               for r in reqs}
    # every reassigned utterance was finished by the surviving worker 0
    for wid in fleet.reassigned:
        if wid in done_by:
            assert done_by[wid] == "0"
