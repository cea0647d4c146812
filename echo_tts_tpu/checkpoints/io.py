"""Checkpoint I/O: native pytree save/load plus reference-checkpoint loaders.

Formats:
  * .npz flat-key pytrees (dependency-free, used for LoRA and converted
    weights) — dotted paths, lists encoded as numeric path components.
  * Orbax (optional) for sharded multi-host checkpoints.
  * Reference safetensors ingestion (reference: inference.py:14-135):
    `pytorch_model.safetensors` for the DiT and the Fish S1-DAC, and
    `pca_state.safetensors`, converted via checkpoints/convert.py with
    weight-norm folding and optional blockwise-module stripping.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from echo_tts_tpu.core.config import AEConfig, DiTConfig
from echo_tts_tpu.checkpoints import convert as cv

SEP = "//"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{SEP}{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{SEP}{i}" if prefix else str(i)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: dict = {}
    for key, val in flat.items():
        parts = key.split(SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_pytree(path: str, tree: Any) -> None:
    np.savez(path, **_flatten(jax.tree_util.tree_map(np.asarray, tree)))


def load_pytree(path: str, dtype=None) -> Any:
    z = np.load(path)
    flat = {k: z[k] for k in z.files}
    tree = _unflatten(flat)
    if dtype is not None:
        tree = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), tree)
    return tree


def save_tree_leaves(path: str, tree: Any) -> None:
    """Serialize a pytree by canonical jax leaf order — structure-agnostic,
    so optax optimizer states (NamedTuples, empty subtrees) round-trip."""
    leaves = jax.tree_util.tree_leaves(tree)
    np.savez(path, **{f"leaf_{i:06d}": np.asarray(l)
                      for i, l in enumerate(leaves)})


def load_pytree_like(path: str, like: Any) -> Any:
    """Restore a `save_tree_leaves` checkpoint into the exact pytree
    structure (and dtypes) of `like`. Enables full train resume
    (params + opt_state), which the reference lacks (SURVEY.md §5.4)."""
    z = np.load(path)
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    assert len(z.files) == len(like_leaves), (
        f"checkpoint has {len(z.files)} leaves, template {len(like_leaves)}")
    leaves = []
    for i, b in enumerate(like_leaves):
        arr = z[f"leaf_{i:06d}"]
        want = getattr(b, "dtype", None)
        if want is not None and arr.dtype.kind == "V":
            # npz stores ml_dtypes leaves (bf16, fp8) as raw void bytes —
            # numpy has no cast from void, so reinterpret via the template
            arr = arr.view(np.dtype(want))
        leaves.append(jnp.asarray(arr, want))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_train_state(path_prefix: str, params: Any, opt_state: Any,
                     step: int = 0) -> None:
    """Full training checkpoint: params + optimizer state + step counter."""
    save_tree_leaves(path_prefix + ".params.npz", params)
    save_tree_leaves(path_prefix + ".opt.npz", opt_state)
    np.savez(path_prefix + ".meta.npz", step=np.asarray(step))


def load_train_state(path_prefix: str, params_like: Any, opt_state_like: Any):
    params = load_pytree_like(path_prefix + ".params.npz", params_like)
    opt_state = load_pytree_like(path_prefix + ".opt.npz", opt_state_like)
    step = int(np.load(path_prefix + ".meta.npz")["step"])
    return params, opt_state, step


# ---------------------------------------------------------------------------
# Reference-format loaders (mirror inference.py:14-135 entry points)
# ---------------------------------------------------------------------------


def load_dit_from_safetensors(
    path: str,
    cfg: Optional[DiTConfig] = None,
    dtype=jnp.bfloat16,
    delete_blockwise_modules: bool = False,
) -> Tuple[dict, DiTConfig]:
    """reference: inference.py:14-69 `load_model_from_hf` (file already
    downloaded; this env has no egress)."""
    import dataclasses

    state = cv.load_safetensors(path)
    if cfg is None:
        cfg = cv.infer_dit_config(state)
    cfg = dataclasses.replace(
        cfg, has_latent_modules=cfg.has_latent_modules and not delete_blockwise_modules)
    params = cv.convert_dit_state(state, cfg)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
    return params, cfg


def load_ae_from_safetensors(
    path: str,
    cfg: Optional[AEConfig] = None,
    dtype=jnp.float32,
) -> Tuple[dict, AEConfig]:
    """reference: inference.py:80-105 `load_fish_ae_from_hf`; folds
    weight-norm parametrizations at conversion (SURVEY.md §5.4)."""
    state = cv.fold_weight_norm(cv.load_safetensors(path))
    if cfg is None:
        cfg = cv.infer_ae_config(state)
    params = cv.convert_ae_state(state, cfg)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
    return params, cfg


def maybe_hf_download(repo_id: str, filename: str, token: Optional[str] = None) -> str:
    """HF hub fetch when network + huggingface_hub are available; raises a
    clear error otherwise (this build environment is zero-egress)."""
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "huggingface_hub is not installed — install it, or download the "
            "safetensors manually and use load_dit_from_safetensors / "
            "load_ae_from_safetensors") from e
    return hf_hub_download(repo_id, filename, token=token)


def load_model_from_hf(
    repo_id: str = "jordand/echo-tts-base",
    dtype=jnp.bfloat16,
    token: Optional[str] = None,
    delete_blockwise_modules: bool = False,
) -> Tuple[dict, DiTConfig]:
    """Hub entry point mirroring the reference's `load_model_from_hf`
    (inference.py:14-69): repo id -> cached `pytorch_model.safetensors`
    download -> converter with blockwise strip + dtype policy (default bf16,
    matching the reference default). Returns (params, cfg)."""
    path = maybe_hf_download(repo_id, "pytorch_model.safetensors", token=token)
    return load_dit_from_safetensors(
        path, dtype=dtype, delete_blockwise_modules=delete_blockwise_modules)


def load_fish_ae_from_hf(
    repo_id: str = "jordand/fish-s1-dac-min",
    dtype=jnp.float32,
    token: Optional[str] = None,
) -> Tuple[dict, AEConfig]:
    """reference: inference.py:80-105 (default fp32; pass bf16 for the
    reference's low-VRAM mode, gradio_app.py:36-38). Weight-norm is folded
    at conversion."""
    path = maybe_hf_download(repo_id, "pytorch_model.safetensors", token=token)
    return load_ae_from_safetensors(path, dtype=dtype)


def load_pca_state_from_hf(
    repo_id: str = "jordand/echo-tts-base",
    filename: str = "pca_state.safetensors",
    token: Optional[str] = None,
):
    """reference: inference.py:123-135. Returns a models.pca.PCAState."""
    from echo_tts_tpu.models.pca import PCAState

    return PCAState.from_safetensors(
        maybe_hf_download(repo_id, filename, token=token))


def load_tts_from_hf(
    model_repo: str = "jordand/echo-tts-base",
    ae_repo: str = "jordand/fish-s1-dac-min",
    dit_dtype=jnp.bfloat16,
    ae_dtype=jnp.float32,
    token: Optional[str] = None,
    delete_blockwise_modules: bool = False,
):
    """One-call deployment loader: the three reference HF entry points
    (inference.py:14-135) composed into a ready pipeline.EchoTTS."""
    from echo_tts_tpu.pipeline.pipeline import EchoTTS

    dit_params, dit_cfg = load_model_from_hf(
        model_repo, dtype=dit_dtype, token=token,
        delete_blockwise_modules=delete_blockwise_modules)
    ae_params, ae_cfg = load_fish_ae_from_hf(ae_repo, dtype=ae_dtype, token=token)
    pca = load_pca_state_from_hf(model_repo, token=token)
    return EchoTTS(dit_params, dit_cfg, ae_params, ae_cfg, pca,
                   model_dtype=dit_dtype)


def load_pytree_sharded(path: str, mesh, dtype=None) -> Any:
    """Load a params pytree and place it straight onto a device mesh with the
    TP sharding from parallel.sharding.param_pspecs (replicated over dp) —
    the SURVEY §5.4 "sharded load across the mesh" path. Each leaf is
    device_put once, so no full replicated copy materializes per device."""
    from jax.sharding import NamedSharding

    from echo_tts_tpu.parallel.sharding import param_pspecs

    tree = load_pytree(path, dtype=dtype)
    specs = param_pspecs(tree)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def save_orbax(path: str, tree: Any) -> None:
    """Orbax StandardCheckpointer save. The checkpointer must be closed —
    finalization (tmp-dir rename) is asynchronous and a dropped instance
    leaves no visible checkpoint behind."""
    import orbax.checkpoint as ocp

    ck = ocp.StandardCheckpointer()
    try:
        ck.save(path, tree, force=True)
    finally:
        ck.close()


def load_orbax(path: str, like: Any = None) -> Any:
    """Restore an Orbax StandardCheckpointer checkpoint; `like` supplies the
    target structure (and shardings, when its leaves are sharded jax arrays —
    Orbax then restores each shard directly onto its device)."""
    import orbax.checkpoint as ocp

    ck = ocp.StandardCheckpointer()
    try:
        return ck.restore(path, target=like)
    finally:
        ck.close()
