"""Preset handling (reference: gradio_app.py:434-594, sampler_presets.json,
text_presets.txt). The JSON schema is ingested verbatim (string-valued
numbers coerced — gradio_app.py:574-578)."""
from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

from echo_tts_tpu.core.config import SamplerConfig

# Built-in default presets, mirroring the shipped sampler_presets.json values
# (reference: sampler_presets.json:1-62; written on first run like
# gradio_app.py:542-562).
DEFAULT_SAMPLER_PRESETS = {
    "Independent-High-Speaker-CFG": {
        "num_steps": "40", "cfg_scale_text": "3.0", "cfg_scale_speaker": "8.0",
        "cfg_min_t": "0.5", "cfg_max_t": "1.0", "truncation_factor": "1.",
        "rescale_k": "1.", "rescale_sigma": "3.0"},
    "Independent-High-Speaker-CFG-Flat": {
        "num_steps": "40", "cfg_scale_text": "3.0", "cfg_scale_speaker": "8.0",
        "cfg_min_t": "0.5", "cfg_max_t": "1.0", "truncation_factor": "0.8",
        "rescale_k": "1.2", "rescale_sigma": "3.0"},
    "Independent-High-CFG": {
        "num_steps": "40", "cfg_scale_text": "8.0", "cfg_scale_speaker": "8.0",
        "cfg_min_t": "0.5", "cfg_max_t": "1.0", "truncation_factor": "1.",
        "rescale_k": "1.", "rescale_sigma": "3.0"},
    "Independent-High-CFG-Flat": {
        "num_steps": "40", "cfg_scale_text": "8.0", "cfg_scale_speaker": "8.0",
        "cfg_min_t": "0.5", "cfg_max_t": "1.0", "truncation_factor": "0.8",
        "rescale_k": "1.2", "rescale_sigma": "3.0"},
    "Independent-Low-CFG": {
        "num_steps": "40", "cfg_scale_text": "3.0", "cfg_scale_speaker": "3.0",
        "cfg_min_t": "0.5", "cfg_max_t": "1.0", "truncation_factor": "1.",
        "rescale_k": "1.", "rescale_sigma": "3.0"},
    "Independent-Low-CFG-Flat": {
        "num_steps": "40", "cfg_scale_text": "3.0", "cfg_scale_speaker": "3.0",
        "cfg_min_t": "0.5", "cfg_max_t": "1.0", "truncation_factor": "0.8",
        "rescale_k": "1.2", "rescale_sigma": "3.0"},
}

# Inline "Force Speaker" / truncation presets (reference: gradio_app.py:483-539)
FORCE_SPEAKER_PRESETS = {
    "higher speaker": {"cfg_scale_text": 3.0, "cfg_scale_speaker": 8.0},
    "large guidances": {"cfg_scale_text": 8.0, "cfg_scale_speaker": 8.0},
}
TRUNCATION_PRESETS = {
    "flat": {"truncation_factor": 0.8, "rescale_k": 1.2, "rescale_sigma": 3.0},
    "sharp": {"truncation_factor": 0.9, "rescale_k": 0.96, "rescale_sigma": 3.0},
    "baseline": {"truncation_factor": 1.0, "rescale_k": 1.0, "rescale_sigma": 3.0},
}


def load_sampler_presets(path: str, write_default: bool = True
                         ) -> Dict[str, SamplerConfig]:
    if not os.path.exists(path) and write_default:
        with open(path, "w") as f:
            json.dump(DEFAULT_SAMPLER_PRESETS, f, indent=2)
    with open(path) as f:
        raw = json.load(f)
    return {name: SamplerConfig.from_preset(d) for name, d in raw.items()}


def load_text_presets(path: str) -> List[List[str]]:
    """Text-preset table rows [category, word_count, text] from
    'Category | text' lines — exact reference parsing (gradio_app.py:434-454):
    split on ' | ' (one space each side), lines without the separator fall
    back to category 'Uncategorized', word count is len(text.split())."""
    if not os.path.exists(path):
        return []
    with open(path, encoding="utf-8") as f:
        lines = [line.strip() for line in f if line.strip()]
    result = []
    for line in lines:
        if " | " in line:
            category, text = line.split(" | ", 1)
        else:
            category, text = "Uncategorized", line
        result.append([category, str(len(text.split())), text])
    return result
