"""End-to-end smoke of the LoRA finetune driver (scripts/finetune_lora.py) on
tiny checkpoints and generated WAVs — the reference ships this flow only as a
Colab notebook (echo_tts_tinydata.ipynb)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from echo_tts_tpu.core.config import AEConfig, DiTConfig
from echo_tts_tpu.pipeline.audio_io import write_wav

from ref_utils import build_torch_dit
from test_s1dac_parity import build_torch_tiny_ae

DCFG = DiTConfig().tiny()
ACFG = AEConfig().tiny()


@pytest.mark.slow
def test_finetune_script_end_to_end(tmp_path):
    from safetensors.torch import save_file
    import torch

    tm = build_torch_dit(DCFG, seed=1)
    dac = build_torch_tiny_ae(ACFG, seed=2)
    dit_p = str(tmp_path / "dit.safetensors")
    ae_p = str(tmp_path / "ae.safetensors")
    save_file({k: v.contiguous() for k, v in tm.state_dict().items()}, dit_p)
    save_file({k: v.contiguous() for k, v in dac.state_dict().items()}, ae_p)

    rng = np.random.default_rng(0)
    comp = (0.3 * rng.standard_normal((DCFG.latent_size, ACFG.latent_dim))).astype(np.float32)
    pca_p = str(tmp_path / "pca.safetensors")
    from safetensors.numpy import save_file as np_save

    np_save({"pca_components": comp,
             "pca_mean": (0.01 * rng.standard_normal(ACFG.latent_dim)).astype(np.float32),
             "latent_scale": np.asarray(2.0, np.float32)}, pca_p)

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    transcripts = {}
    for i in range(4):
        p = str(audio_dir / f"clip{i}.wav")
        n = ACFG.frame_length * 24
        write_wav(p, (0.2 * rng.standard_normal(n)).astype(np.float32)[None], 44100)
        transcripts[p] = f"[S1] tiny clip number {i}"
    tpath = str(tmp_path / "transcripts.json")
    with open(tpath, "w") as f:
        json.dump(transcripts, f)

    out = str(tmp_path / "lora.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "scripts/finetune_lora.py",
         "--audio-dir", str(audio_dir), "--transcripts", tpath,
         "--dit", dit_p, "--ae", ae_p, "--pca", pca_p,
         "--out", out, "--epochs", "1", "--batch-size", "2", "--rank", "2"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(out), res.stdout
    from echo_tts_tpu.train.lora import load_lora_checkpoint

    lora, lc = load_lora_checkpoint(out)
    assert lc.rank == 2 and len(lora) > 0
