"""Opt-in W8A8 int8 quantization for the DiT trunk GEMMs.

The v5e MXU runs int8 x int8 -> int32 at ~1.6x the measured bf16 rate (212
TOP/s vs 132 TFLOP/s on trunk-shaped GEMM chains — BASELINE.md). The Euler
hot loop is MXU-bound on the trunk's eight per-layer projections
(wq/wk/wv/gate/wo and MLP w1/w3/w2 — reference model.py:341-390), so
quantizing exactly those buys most of that on the GEMM share of every step.

Scheme — dynamic symmetric W8A8, no calibration data needed:

* weights: per-output-channel int8, ``scale = amax_K |w| / 127`` folded at
  quantization time (`quantize_dit_params`);
* activations: per-token int8, ``scale = amax_D |h| / 127`` computed on the
  fly (one VPU row-reduce; the trunk pre-projection activations are
  RMS-normalized by AdaLN so rows are well-conditioned);
* matmul: int8 x int8 -> int32 on the MXU, dequantized as
  ``acc * (a_scale ⊗ w_scale)`` into the model dtype.

Everything else keeps the reference dtype policy (fp32 islands in
models/dit.py): encoders run once per utterance, attention math, RMSNorm /
AdaLN, residual stream, in/out projections all stay bf16/fp32. Quantization
is strictly opt-in and detected structurally: `quantize_dit_params` swaps
each targeted weight leaf for a ``{"q": int8, "s": fp32}`` dict and the
forward dispatches on that — no API change in samplers, serving, or
checkpoints. Apply it AFTER any LoRA merge (train/lora.py merge-back): the
sidecar targets bf16 leaves.

Inference-only by design (`jnp.round` has no useful gradient); training and
parity tests always run the bf16/fp32 paths.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# trunk projections to quantize (reference model.py:341-390); AdaLN rank-256
# refinements, q/k norms, and biases are untouched
_ATTN_KEYS = ("wq", "wk", "wv", "gate", "wo")
_MLP_KEYS = ("w1", "w3", "w2")


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w


def out_dim(w) -> int:
    """Last-axis (output) dimension of a plain or quantized weight leaf."""
    return (w["q"] if is_quantized(w) else w).shape[-1]


def quantize_weight(w: jnp.ndarray) -> dict:
    """(…, K, N) weight -> {"q": int8 (…, K, N), "s": fp32 (…, N)} with
    symmetric per-output-channel scales."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": jnp.squeeze(s, axis=-2)}


def _quantize_blocks(blocks: dict) -> dict:
    blocks = dict(blocks)
    attn = dict(blocks["attention"])
    mlp = dict(blocks["mlp"])
    for k in _ATTN_KEYS:
        attn[k] = quantize_weight(attn[k])
    for k in _MLP_KEYS:
        mlp[k] = quantize_weight(mlp[k])
    blocks["attention"] = attn
    blocks["mlp"] = mlp
    return blocks


def quantize_dit_params(params: dict, encoders: bool = False) -> dict:
    """Quantize the trunk GEMM weight stacks in a DiT params pytree.

    Returns a new pytree (shallow copies along the touched path); the
    original is unmodified. Halves trunk-weight HBM too (int8 vs bf16), on
    top of the MXU-rate win.

    encoders=True additionally quantizes the text/speaker/latent encoder
    block GEMMs and the per-layer context-KV projections (wk/wv_text,
    wk/wv_speaker, wk/wv_latent). Encoders run ONCE per utterance, so their
    quantization noise is frozen into the KV caches for all 40 steps rather
    than averaged across them — check scripts/quant_snr.py --encoders before
    enabling in quality-sensitive serving.
    """
    params = dict(params)
    params["blocks"] = _quantize_blocks(params["blocks"])
    if encoders:
        attn = dict(params["blocks"]["attention"])
        for k in ("wk_text", "wv_text", "wk_speaker", "wv_speaker",
                  "wk_latent", "wv_latent"):
            if k in attn:
                attn[k] = quantize_weight(attn[k])
        params["blocks"] = {**params["blocks"], "attention": attn}
        for enc in ("text_encoder", "speaker_encoder", "latent_encoder"):
            if enc in params:
                e = dict(params[enc])
                e["blocks"] = _quantize_blocks(e["blocks"])
                params[enc] = e
    return params


def quant_rows(h: jnp.ndarray):
    """Dynamic per-token activation quantization: (…, D) -> (int8 (…, D),
    fp32 scale (…, 1))."""
    hf = h.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(hf / s), -127, 127).astype(jnp.int8)
    return q, s


def qdot(q: jnp.ndarray, s_row: jnp.ndarray, w: dict, out_dtype) -> jnp.ndarray:
    """int8 activation rows x quantized weight -> dequantized out_dtype.

    q: (…, K) int8; s_row: (…, 1) fp32; w: {"q": (K, N) int8, "s": (N,) fp32}.
    """
    acc = jax.lax.dot_general(
        q, w["q"], (((q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (s_row * w["s"])).astype(out_dtype)


def mm(h: jnp.ndarray, w) -> jnp.ndarray:
    """Transparent matmul: quantized {"q","s"} leaf or plain array."""
    if is_quantized(w):
        q, s = quant_rows(h)
        return qdot(q, s, w, h.dtype)
    return h @ w


def proj_shared(h: jnp.ndarray, ws: list):
    """Several projections of the SAME activation (q/k/v/gate share h;
    mlp w1/w3 share h): quantize h once, run one int8 dot per weight.
    Output dtype is h.dtype on both dispatch branches."""
    if is_quantized(ws[0]):
        q, s = quant_rows(h)
        return [qdot(q, s, w, h.dtype) for w in ws]
    return [h @ w for w in ws]


def swiglu_mlp_q(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Quantized SwiGLU: w2(silu(w1 x) * w3 x) with shared input quant for
    w1/w3 and a re-quantization of the gated intermediate for w2
    (reference math: model.py:296-308)."""
    u, g = proj_shared(x, [p["w1"], p["w3"]])
    h = jax.nn.silu(u) * g
    return mm(h, p["w2"])
