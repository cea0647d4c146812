"""Byte-level tokenizer with the reference's normalization table
(reference: inference.py:152-217). Host-side, pure Python."""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

BOS = 0
VOCAB_SIZE = 256

# normalization table, in the reference's application order
# (reference: inference.py:159-166); note the duplicated right-double-quote
# replacement in the reference is a no-op second time.
_REPLACEMENTS = [
    ("…", "..."),
    ("’", "'"),
    ("”", '"'),
    ("\n", " "),
    (":", ","),
    (";", ","),
    ("—", ", "),
]


def normalize_text(text: str) -> str:
    for a, b in _REPLACEMENTS:
        text = text.replace(a, b)
    # auto speaker tag only when no bracket/paren/speaker marker present
    # (reference: inference.py:166-173)
    if (not text.startswith("[") and not text.startswith("(")
            and "S1" not in text and "S2" not in text):
        text = "[S1] " + text
    return text


def tokenizer_encode(
    text: str,
    append_bos: bool = True,
    normalize: bool = True,
) -> Tuple[np.ndarray, str]:
    """UTF-8 bytes + BOS=0 prefix. Returns (ids int32, normalized_text)."""
    if normalize:
        text = normalize_text(text)
    b = list(text.encode("utf-8"))
    if append_bos:
        b.insert(0, BOS)
    return np.asarray(b, dtype=np.int32), text


def get_text_input_ids_and_mask(
    texts: List[str],
    max_length: Optional[int],
    normalize: bool = True,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Batch pad + boolean mask, truncating at max_length
    (reference: inference.py:185-217). Returns (ids, mask, normalized)."""
    encoded = [tokenizer_encode(t, normalize=normalize) for t in texts]
    if max_length is None:
        max_length = max(len(e) for e, _ in encoded)
    ids = np.zeros((len(texts), max_length), dtype=np.int32)
    mask = np.zeros((len(texts), max_length), dtype=bool)
    for i, (e, _) in enumerate(encoded):
        n = min(len(e), max_length)
        ids[i, :n] = e[:n]
        mask[i, :n] = True
    return ids, mask, [t for _, t in encoded]
