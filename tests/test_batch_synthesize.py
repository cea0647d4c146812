"""Offline batch-synthesis CLI: JSONL -> WAVs through the batched pipeline
(scripts/batch_synthesize.py; bulk form of the reference's one-click
generation, gradio_app.py:229-430)."""
import json
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_batch_synthesize_smoke(tmp_path):
    import batch_synthesize

    # a small voice prompt shared by two requests
    sr = 44100
    rng = np.random.default_rng(3)
    voice = tmp_path / "voice.wav"
    with wave.open(str(voice), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((0.05 * rng.standard_normal(16 * 8) * 32767
                       ).astype("<i2").tobytes())

    reqs = [
        {"id": "a", "text": "First utterance.", "speaker": str(voice), "seed": 1},
        {"id": "b", "text": "Second one.", "speaker": str(voice), "seed": 2},
        {"id": "c", "text": "No voice.", "speaker": None, "seed": 3},
    ]
    inp = tmp_path / "reqs.jsonl"
    inp.write_text("\n".join(json.dumps(r) for r in reqs))
    outdir = tmp_path / "out"

    written = batch_synthesize.main([
        "--input", str(inp), "--outdir", str(outdir), "--random-tiny", "--cpu",
        "--max-batch", "2", "--num-steps", "2", "--sequence-length", "16"])

    assert sorted(os.path.basename(p) for p in written) == [
        "a.wav", "b.wav", "c.wav"]
    for p in written:
        with open(p, "rb") as f:
            assert f.read(4) == b"RIFF"
