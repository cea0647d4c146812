"""Sharding specs for EchoDiT parameter pytrees and activations.

Megatron-style TP over the stacked (L, in, out) layer arrays:
column-shard the head/MLP up-projections, row-shard the down-projections, so
each attention/MLP pair needs exactly one all-reduce (inserted by GSPMD from
these annotations — no hand-written collectives, per the scaling-book recipe).
DP shards the batch axis of activations and KV caches; parameters are
replicated across dp.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# leaf-name -> spec for the 3-D stacked layer params (L, d_in, d_out)
_COL = {"wq", "wk", "wv", "gate", "wk_text", "wv_text", "wk_speaker",
        "wv_speaker", "wk_latent", "wv_latent", "w1", "w3"}
_ROW = {"wo", "w2"}
_HEAD_NORM = {"q_norm", "k_norm"}  # (L, H, Dh): shard heads


def _path_leaf_name(path) -> str:
    last = path[-1]
    return getattr(last, "key", getattr(last, "name", str(last)))


def param_pspecs(params: Any) -> Any:
    """PartitionSpec pytree matching a DiT (or encoder) param pytree."""

    def spec(path, leaf):
        name = _path_leaf_name(path)
        names = [_path_leaf_name((p,)) for p in path]
        if name in ("q", "s") and len(path) >= 2:
            # int8-quantized leaf (models/quant.py {"q","s"} dict): shard by
            # the ORIGINAL weight's name one level up. q keeps the weight's
            # (L, K, N) shape; s is the per-output-channel scale (L, N)
            # specs are written for the stacked convention only: q is
            # (L, K, N), s is (L, N) — guard rank exactly so a hypothetical
            # unstacked 2-D quantized weight falls through to replicate
            # instead of getting a rank-mismatched spec
            wname = _path_leaf_name(path[:-1])
            if wname in _COL:
                if name == "q" and leaf.ndim == 3:
                    return P(None, None, "tp")
                if name == "s" and leaf.ndim == 2:
                    return P(None, "tp")          # s follows the N split
            if wname in _ROW:
                if name == "q" and leaf.ndim == 3:
                    return P(None, "tp", None)
                # s is over N: replicate
            return P()
        if name in _COL and leaf.ndim == 3:
            return P(None, None, "tp")
        if name in _ROW and leaf.ndim == 3:
            return P(None, "tp", None)
        if name in _HEAD_NORM and leaf.ndim == 3 and "attention" in names:
            return P(None, "tp", None)
        return P()  # replicate (norms, adaln, embeddings, projections)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put the params with TP sharding (replicated over dp)."""
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_pspec(ndim: int) -> P:
    """Activations/batches: shard axis 0 over dp."""
    return P("dp", *([None] * (ndim - 1)))


def kv_cache_pspec() -> P:
    """Stacked KV caches (L, B, T, H, Dh): batch over dp, heads over tp."""
    return P(None, "dp", None, "tp", None)


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, batch_pspec(getattr(x, "ndim", 0)))), tree)
