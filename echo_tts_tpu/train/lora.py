"""Functional LoRA for EchoDiT (reference: lora.py).

The reference wraps nn.Linear modules in-place (lora.py:17-82). Here LoRA is
a *side-car pytree* mirroring the targeted leaves of the stacked parameter
tree: for a base weight (L, in, out) the adapter is a: (L, in, r), b: (L, r,
out) and the effective weight is w + (alpha/r) * a @ b, applied functionally
(SURVEY.md §5.4). One batched einsum merges all layers at once.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Default targets mirror reference lora.py:140-154: decoder attention + text
# cross-attention + MLP; the speaker path is excluded to preserve cloning.
DEFAULT_TARGETS = (
    "blocks.attention.wq", "blocks.attention.wk", "blocks.attention.wv",
    "blocks.attention.wo",
    "blocks.attention.wk_text", "blocks.attention.wv_text",
    "blocks.mlp.w1", "blocks.mlp.w2", "blocks.mlp.w3",
)


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 16
    alpha: float = 16.0
    targets: Tuple[str, ...] = DEFAULT_TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def _get(tree: dict, dotted: str):
    node = tree
    for part in dotted.split("."):
        node = node[part]
    return node


def _set(tree: dict, dotted: str, value):
    parts = dotted.split(".")
    node = tree
    for part in parts[:-1]:
        node = node[part]
    node[parts[-1]] = value


def init_lora(key, params: dict, lc: LoRAConfig, dtype=jnp.float32) -> dict:
    """A ~ kaiming-uniform (+-1/sqrt(in), matching torch kaiming_uniform_
    a=sqrt(5); reference lora.py:48), B = 0 -> identity at start."""
    lora: Dict[str, dict] = {}
    keys = jax.random.split(key, len(lc.targets))
    for k, tgt in zip(keys, lc.targets):
        w = _get(params, tgt)
        l, d_in, d_out = w.shape
        bound = 1.0 / np.sqrt(d_in)
        lora[tgt] = {
            "a": jax.random.uniform(k, (l, d_in, lc.rank), jnp.float32,
                                    -bound, bound).astype(dtype),
            "b": jnp.zeros((l, lc.rank, d_out), dtype),
        }
    return lora


def apply_lora(params: dict, lora: dict, lc: LoRAConfig) -> dict:
    """Return params with effective weights w + scaling * a@b (functional;
    base untouched). Cheap: one batched matmul per target."""
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for tgt, ab in lora.items():
        w = _get(out, tgt)
        delta = jnp.einsum("lir,lro->lio", ab["a"].astype(jnp.float32),
                           ab["b"].astype(jnp.float32))
        _set(out, tgt, (w.astype(jnp.float32) + lc.scaling * delta).astype(w.dtype))
    return out


def merge_lora(params: dict, lora: dict, lc: LoRAConfig) -> dict:
    """Permanently bake adapters into the base weights
    (reference: lora.py:254-272)."""
    return apply_lora(params, lora, lc)


def count_lora_params(lora: dict) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(lora))


def save_lora_checkpoint(path: str, lora: dict, lc: LoRAConfig,
                         extra: Optional[dict] = None) -> None:
    """npz side-car checkpoint (reference saves torch .pt dicts,
    lora.py:194-219)."""
    flat = {}
    for tgt, ab in lora.items():
        flat[f"{tgt}.a"] = np.asarray(ab["a"], dtype=np.float32)
        flat[f"{tgt}.b"] = np.asarray(ab["b"], dtype=np.float32)
    flat["__rank__"] = np.asarray(lc.rank)
    flat["__alpha__"] = np.asarray(lc.alpha)
    np.savez(path, **flat)


def load_lora_checkpoint(path: str) -> Tuple[dict, LoRAConfig]:
    z = np.load(path)
    rank = int(z["__rank__"])
    alpha = float(z["__alpha__"])
    lora: Dict[str, dict] = {}
    targets: List[str] = []
    for k in z.files:
        if k.endswith(".a"):
            tgt = k[:-2]
            targets.append(tgt)
            lora[tgt] = {"a": jnp.asarray(z[f"{tgt}.a"]),
                         "b": jnp.asarray(z[f"{tgt}.b"])}
    return lora, LoRAConfig(rank=rank, alpha=alpha, targets=tuple(sorted(targets)))
