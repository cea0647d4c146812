"""EchoDiT — TPU-native functional re-architecture of the reference DiT
(reference: model.py:472-642).

Design departures from the PyTorch reference, deliberate and TPU-first:

* Pure functions over explicit parameter pytrees — no modules, no in-place
  state. KV caches are stacked arrays of shape (L, B, T, H, Dh) instead of
  Python lists of per-layer tuples (reference: model.py:606-636), so they are
  single device buffers that can be donated/sharded.
* Layer parameters are stacked on a leading axis and the trunk runs as one
  `lax.scan` — O(1) HLO size in depth, fast compiles, and XLA pipelines the
  per-layer DMAs.
* RoPE tables are (cos, sin) fp32 pairs (no complex dtypes on TPU).
* The speaker-KV "force speaker" scale is an input (per-layer vector), applied
  at use-site — replacing the reference's in-place cache mutation
  (reference: inference.py:420-428) with a functional, branchless equivalent.

fp32 islands replicate the reference cast sites exactly: RMSNorm/AdaLN
internals, timestep embedding, and the fp32 final output (model.py:604).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from echo_tts_tpu.core.config import DiTConfig
from echo_tts_tpu.core.layers import (
    modulate_rms,
    precompute_adaln,
    rms_norm,
    timestep_embedding,
)
from echo_tts_tpu.core.rope import apply_rope, apply_rope_half_heads, precompute_rope
from echo_tts_tpu.models import quant
from echo_tts_tpu.ops.attention import sdpa

# ---------------------------------------------------------------------------
# Encoder (shared by text / speaker / latent encoders)
# ---------------------------------------------------------------------------


def encoder_forward(
    blocks: dict,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    num_heads: int,
    is_causal: bool,
    eps: float,
) -> jnp.ndarray:
    """Stack of EncoderTransformerBlocks under one lax.scan
    (reference: model.py:311-339). blocks: params stacked over layers."""
    b, s, d = x.shape
    hd = d // num_heads

    def body(x, p):
        a = p["attention"]
        h = rms_norm(x, p["attention_norm"], eps)
        # quant.proj_shared/mm dispatch bf16 vs opt-in W8A8 int8 leaves
        # (models/quant.py quantize_dit_params(encoders=True))
        q, k, v, gate = quant.proj_shared(h, [a["wq"], a["wk"], a["wv"], a["gate"]])
        q = q.reshape(b, s, num_heads, hd)
        k = k.reshape(b, s, num_heads, hd)
        v = v.reshape(b, s, num_heads, hd)
        q = rms_norm(q, a["q_norm"], eps)
        k = rms_norm(k, a["k_norm"], eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        o = sdpa(q, k, v, mask=mask, is_causal=is_causal).reshape(b, s, d)
        o = o * jax.nn.sigmoid(gate)
        x = x + quant.mm(o, a["wo"])
        h = rms_norm(x, p["mlp_norm"], eps)
        x = x + quant.swiglu_mlp_q(h, p["mlp"])
        return x, None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def text_encoder_forward(params: dict, cfg: DiTConfig, input_ids, mask):
    """Byte-embed + bidirectional blocks (reference: model.py:392-427)."""
    enc = params["text_encoder"]
    x = enc["embedding"][input_ids]
    cos, sin = precompute_rope(cfg.text_head_dim, input_ids.shape[1])
    return encoder_forward(
        enc["blocks"], x, mask, cos, sin,
        num_heads=cfg.text_num_heads, is_causal=False, eps=cfg.norm_eps,
    )


def _patch_encoder_forward(enc: dict, cfg: DiTConfig, latent):
    """SpeakerEncoder / latent_encoder: patchify-4, in_proj, x/6 activation
    scale, causal blocks (reference: model.py:429-469, incl. the x/6 quirk at
    model.py:462)."""
    p = cfg.speaker_patch_size
    b, s, d_lat = latent.shape
    x = latent.reshape(b, s // p, d_lat * p)
    x = x @ enc["in_proj"]["w"] + enc["in_proj"]["b"]
    x = x / 6.0
    cos, sin = precompute_rope(cfg.speaker_head_dim, x.shape[1])
    return encoder_forward(
        enc["blocks"], x, None, cos, sin,
        num_heads=cfg.speaker_num_heads, is_causal=True, eps=cfg.norm_eps,
    )


# ---------------------------------------------------------------------------
# KV-cache builders
# ---------------------------------------------------------------------------


def _project_kv(blocks_attn: dict, state, wk_name: str, wv_name: str,
                num_heads: int, eps: float):
    """Per-layer KV projections of an encoder state, stacked to
    (L, B, H, S, Dh) — head-major so the attention kernel reads (T, D) tiles
    with no per-step transpose. k_norm is applied to keys, matching reference
    model.py:270-282 (no RoPE on text/speaker keys)."""
    b, s, _ = state.shape

    def proj(_, a):
        hd = quant.out_dim(a[wk_name]) // num_heads
        k, v = quant.proj_shared(state, [a[wk_name], a[wv_name]])
        k = k.reshape(b, s, num_heads, hd)
        v = v.reshape(b, s, num_heads, hd)
        k = rms_norm(k, a["k_norm"], eps)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        return None, (k, v)

    sub = {wk_name: blocks_attn[wk_name], wv_name: blocks_attn[wv_name],
           "k_norm": blocks_attn["k_norm"]}
    _, (ks, vs) = jax.lax.scan(proj, None, sub)
    return ks, vs


def get_kv_cache_text(params: dict, cfg: DiTConfig, input_ids, mask):
    """reference: model.py:606-613."""
    state = text_encoder_forward(params, cfg, input_ids, mask)
    state = rms_norm(state, params["text_norm"], cfg.norm_eps)
    return _project_kv(params["blocks"]["attention"], state, "wk_text", "wv_text",
                       cfg.num_heads, cfg.norm_eps)


def get_kv_cache_speaker(params: dict, cfg: DiTConfig, speaker_latent):
    """reference: model.py:615-621."""
    state = _patch_encoder_forward(params["speaker_encoder"], cfg, speaker_latent)
    state = rms_norm(state, params["speaker_norm"], cfg.norm_eps)
    return _project_kv(params["blocks"]["attention"], state, "wk_speaker", "wv_speaker",
                       cfg.num_heads, cfg.norm_eps)


def get_kv_cache_latent(params: dict, cfg: DiTConfig, prefix_latent):
    """Blockwise latent-prefix cache; keys get half-head RoPE at positions
    i*patch_size (reference: model.py:623-636)."""
    state = _patch_encoder_forward(params["latent_encoder"], cfg, prefix_latent)
    state = rms_norm(state, params["latent_norm"], cfg.norm_eps)
    b, s, _ = state.shape
    # rope at positions arange(s) * patch_size
    cos_full, sin_full = precompute_rope(cfg.head_dim, s * cfg.speaker_patch_size)
    idx = jnp.arange(s) * cfg.speaker_patch_size
    cos, sin = cos_full[idx], sin_full[idx]
    attn = params["blocks"]["attention"]

    def proj(_, a):
        k, v = quant.proj_shared(state, [a["wk_latent"], a["wv_latent"]])
        k = k.reshape(b, s, cfg.num_heads, cfg.head_dim)
        v = v.reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = rms_norm(k, a["k_norm"], cfg.norm_eps)
        k = apply_rope_half_heads(k, cos, sin)
        return None, (k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))

    sub = {"wk_latent": attn["wk_latent"], "wv_latent": attn["wv_latent"],
           "k_norm": attn["k_norm"]}
    _, (ks, vs) = jax.lax.scan(proj, None, sub)
    return ks, vs


# ---------------------------------------------------------------------------
# Incremental latent-prefix KV (blockwise streaming)
# ---------------------------------------------------------------------------
#
# The latent encoder is CAUSAL (a second SpeakerEncoder instance,
# reference model.py:429-469), so the blockwise sampler does not need to
# re-encode the whole prefix per block (the reference does:
# inference_blockwise.py:72-74). Instead: preallocated device-resident
# buffers — per-encoder-layer self-attention KV plus the trunk's per-layer
# cross KV — are appended into with dynamic_update_slice as blocks complete.
# Per-block cost is O(block), not O(prefix); not-yet-written positions hold
# zeros and are inert via the `latent_pos < start_pos` mask
# (reference model.py:243-244) in the sampler and the `kv <= q` mask here.


def init_latent_kv_state(params: dict, cfg: DiTConfig, batch: int,
                         total_len: int, dtype) -> dict:
    """Zero incremental-KV state for a blockwise run of `total_len` latents.

    enc_kv: the latent ENCODER's per-layer self-attention KV over patch
    positions — (L_enc, B, T_pat, H_enc, Dh_enc) stacked for lax.scan.
    kv: the TRUNK's latent cross-attention cache — (L, B, H, T_pat, Dh),
    the same head-major layout get_kv_cache_latent returns."""
    n_pat = total_len // cfg.speaker_patch_size
    le = cfg.speaker_num_layers
    he, dhe = cfg.speaker_num_heads, cfg.speaker_head_dim
    return {
        "enc_k": jnp.zeros((le, batch, n_pat, he, dhe), dtype),
        "enc_v": jnp.zeros((le, batch, n_pat, he, dhe), dtype),
        "k": jnp.zeros((cfg.num_layers, batch, cfg.num_heads, n_pat,
                        cfg.head_dim), dtype),
        "v": jnp.zeros((cfg.num_layers, batch, cfg.num_heads, n_pat,
                        cfg.head_dim), dtype),
    }


def extend_latent_kv(params: dict, cfg: DiTConfig, state: dict,
                     new_latent: jnp.ndarray, start_pos) -> dict:
    """Append `new_latent` (B, n*patch, latent_size — latents
    [start_pos, start_pos + n*patch), model dtype) into the incremental KV
    state. Exact vs a full re-encode: the encoder is causal and attention
    over the zero-masked tail adds exact zeros.

    start_pos: scalar int32, or a (B,) vector for the continuous-batching
    path where concurrent streams in one device batch sit at different
    absolute positions (per-row RoPE gathers, causal masks, and vmapped
    buffer writes)."""
    enc = params["latent_encoder"]
    p = cfg.speaker_patch_size
    b, s_lat, d_lat = new_latent.shape
    n = s_lat // p
    eps = cfg.norm_eps
    heads, hd = cfg.speaker_num_heads, cfg.speaker_head_dim
    d = cfg.speaker_model_size
    t_pat = state["enc_k"].shape[2]
    per_row = jnp.ndim(start_pos) == 1
    pos_pat = jnp.asarray(start_pos, jnp.int32) // p

    x = new_latent.reshape(b, n, d_lat * p) @ enc["in_proj"]["w"] + enc["in_proj"]["b"]
    x = x / 6.0

    cos_full, sin_full = precompute_rope(hd, t_pat)
    kv_pos = jnp.arange(t_pat)[None, :]
    if per_row:
        idx = pos_pat[:, None] + jnp.arange(n)[None, :]        # (B, n)
        cos = jnp.take(cos_full, idx, axis=0)                  # (B, n, hd/2)
        sin = jnp.take(sin_full, idx, axis=0)
        # (B, n, t_pat): query at absolute patch idx[b, i] sees kv <= it
        mask = kv_pos[None] <= idx[:, :, None]
    else:
        cos = jax.lax.dynamic_slice_in_dim(cos_full, pos_pat, n, axis=0)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, pos_pat, n, axis=0)
        # causal mask over the full buffer: query at absolute patch
        # pos_pat + i sees kv positions <= it; unwritten tail (zeros) is
        # masked out
        q_pos = pos_pat + jnp.arange(n)[:, None]
        mask = jnp.broadcast_to(kv_pos <= q_pos, (n, t_pat))
        mask = jnp.broadcast_to(mask[None], (b, n, t_pat))

    def upd_rows(buf, new):
        """Write `new` (B, n, ...) into buf (B, t_pat, ...) at each row's own
        patch offset (vmapped dynamic_update_slice ≡ one slice-write when
        start_pos is scalar)."""
        new = new.astype(buf.dtype)
        if per_row:
            return jax.vmap(
                lambda bb, nn, pp: jax.lax.dynamic_update_slice(
                    bb, nn, (pp,) + (0,) * (bb.ndim - 1)))(buf, new, pos_pat)
        return jax.lax.dynamic_update_slice(
            buf, new, (0, pos_pat) + (0,) * (buf.ndim - 2))

    def body(x, per):
        a = per["p"]["attention"]
        h = rms_norm(x, per["p"]["attention_norm"], eps)
        q, k, v, gate = quant.proj_shared(h, [a["wq"], a["wk"], a["wv"], a["gate"]])
        q = rms_norm(q.reshape(b, n, heads, hd), a["q_norm"], eps)
        k = rms_norm(k.reshape(b, n, heads, hd), a["k_norm"], eps)
        v = v.reshape(b, n, heads, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kbuf = upd_rows(per["k"], k)
        vbuf = upd_rows(per["v"], v)
        logits = jnp.einsum("bnhd,bthd->bhnt", q, kbuf,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(hd))
        logits = jnp.where(mask[:, None], logits, jnp.float32(-1e30))
        w = jax.nn.softmax(logits, axis=-1).astype(vbuf.dtype)
        o = jnp.einsum("bhnt,bthd->bnhd", w, vbuf,
                       preferred_element_type=jnp.float32).astype(vbuf.dtype)
        o = o.reshape(b, n, d) * jax.nn.sigmoid(gate)
        x = x + quant.mm(o, a["wo"])
        h = rms_norm(x, per["p"]["mlp_norm"], eps)
        x = x + quant.swiglu_mlp_q(h, per["p"]["mlp"])
        return x, (kbuf, vbuf)

    per = {"p": enc["blocks"], "k": state["enc_k"], "v": state["enc_v"]}
    x, (enc_k, enc_v) = jax.lax.scan(body, x, per)

    # trunk cross-KV for the new positions (get_kv_cache_latent semantics:
    # latent_norm, per-layer wk/wv_latent + k_norm, half-head RoPE at
    # positions (pos_pat + i) * patch_size — reference model.py:623-636)
    x = rms_norm(x, params["latent_norm"], eps)
    cos_q, sin_q = precompute_rope(cfg.head_dim, t_pat * p)
    if per_row:
        idx_l = (pos_pat[:, None] + jnp.arange(n)[None, :]) * p  # (B, n)
    else:
        idx_l = (pos_pat + jnp.arange(n)) * p
    cos_l = jnp.take(cos_q, idx_l, axis=0)
    sin_l = jnp.take(sin_q, idx_l, axis=0)
    attn = params["blocks"]["attention"]

    def proj(_, a):
        k, v = quant.proj_shared(x, [a["wk_latent"], a["wv_latent"]])
        k = k.reshape(b, n, cfg.num_heads, cfg.head_dim)
        v = v.reshape(b, n, cfg.num_heads, cfg.head_dim)
        k = rms_norm(k, a["k_norm"], cfg.norm_eps)
        k = apply_rope_half_heads(k, cos_l, sin_l)
        return None, (k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))

    sub = {"wk_latent": attn["wk_latent"], "wv_latent": attn["wv_latent"],
           "k_norm": attn["k_norm"]}
    _, (ks, vs) = jax.lax.scan(proj, None, sub)

    def upd_cache(buf, new):
        """(L, B, H, T, Dh) caches, written at each row's patch offset."""
        new = new.astype(buf.dtype)
        if per_row:
            return jax.vmap(
                lambda bb, nn, pp: jax.lax.dynamic_update_slice(
                    bb, nn, (0, 0, pp, 0)),
                in_axes=(1, 1, 0), out_axes=1)(buf, new, pos_pat)
        return jax.lax.dynamic_update_slice(buf, new, (0, 0, 0, pos_pat, 0))

    return {"enc_k": enc_k, "enc_v": enc_v,
            "k": upd_cache(state["k"], ks), "v": upd_cache(state["v"], vs)}


# module-level jitted form for standalone (continuation-seeding) callers: a
# fresh jax.jit per call would retrace/recompile every request
extend_latent_kv_jit = jax.jit(extend_latent_kv, static_argnames=("cfg",))


# ---------------------------------------------------------------------------
# DiT trunk forward
# ---------------------------------------------------------------------------
#
# The internal layout is *grouped*: queries carry a CFG-group axis G while the
# text/speaker/latent KV caches stay at batch B and broadcast across groups.
# The reference instead triples the caches along batch for the 3 guidance
# branches (reference: inference.py:489-497) — identical math (the branches
# differ only in masks; cache values are the conditional ones), but sharing
# the caches cuts KV HBM traffic 3x in the hot loop.


# Joint-attention implementation selector:
#   "auto"             — Pallas fused kernel on TPU when shapes align, else XLA
#   "xla"              — einsum softmax (reference semantics, autodiff-friendly)
#   "pallas"           — force the Pallas kernel (compiled)
#   "pallas_interpret" — Pallas in interpreter mode (CPU kernel tests)
#   "pallas_vjp"       — differentiable: Pallas kernels in both directions
#                        (training on TPU; custom VJP)
#   "pallas_vjp_interpret" — same, interpreter mode (CPU tests)
_ATTN_IMPL = "auto"
_ATTN_TP = None  # (Mesh, head-axis name): shard_map the Pallas kernel


def set_attention_impl(impl: str) -> None:
    global _ATTN_IMPL
    assert impl in ("auto", "xla", "pallas", "pallas_interpret",
                    "pallas_vjp", "pallas_vjp_interpret"), impl
    _ATTN_IMPL = impl


def set_attention_tp(mesh, axis: str = "tp") -> None:
    """Enable tensor-parallel execution of the Pallas attention kernel.

    GSPMD partitions the annotated einsums/GEMMs (parallel/sharding.py) but
    CANNOT partition a pallas_call — under a tp>1 mesh the kernel's operands
    would be all-gathered onto every device, forfeiting the TP split exactly
    on the op the kernel exists to accelerate. This registers a shard_map
    wrapper: one kernel instance per tp shard over its LOCAL heads.
    Attention is head-parallel (per-head softmax), so the wrapper needs zero
    collectives; the attention-output all-reduce still comes from the
    row-sharded wo annotation outside. Call with mesh=None to disable.
    Heads (16) must divide by the tp axis size."""
    global _ATTN_TP
    _ATTN_TP = None if mesh is None else (mesh, axis)


def _pallas_call_maybe_tp(q, k_self, v_self, segments, interpret: bool,
                          layout: str, self_len=None):
    """Route a Pallas attention call through shard_map when a TP mesh is
    registered (set_attention_tp), else call directly."""
    from echo_tts_tpu.ops.pallas_attention import joint_attention_grouped_pallas

    if _ATTN_TP is None:
        return joint_attention_grouped_pallas(
            q, k_self, v_self, segments, interpret=interpret, layout=layout,
            self_len=self_len)

    from jax import shard_map  # jax >= 0.8 API (check_vma, not check_rep)
    from jax.sharding import PartitionSpec as P

    mesh, axis = _ATTN_TP
    h_ax = 2 if layout == "hm" else 3

    def hspec(ndim, ax):
        return P(*[axis if i == ax else None for i in range(ndim)])

    q_spec = hspec(5, h_ax)
    flat, seg_specs = [], []
    for k, v, m, s in segments:
        # scale must be a concrete operand for shard_map's pytree specs
        flat += [k, v, m, jnp.asarray(1.0 if s is None else s, jnp.float32)]
        seg_specs += [hspec(4, 1), hspec(4, 1), P(), P()]
    nseg = len(segments)

    sl = (jnp.zeros((q.shape[1],), jnp.int32) if self_len is None
          else jnp.asarray(self_len, jnp.int32))

    def local(q_, ks_, vs_, sl_, *fl):
        segs = [(fl[4 * i], fl[4 * i + 1], fl[4 * i + 2], fl[4 * i + 3])
                for i in range(nseg)]
        return joint_attention_grouped_pallas(
            q_, ks_, vs_, segs, interpret=interpret, layout=layout,
            self_len=None if self_len is None else sl_)

    return shard_map(
        local, mesh=mesh,
        in_specs=(q_spec, q_spec, q_spec, P(), *seg_specs),
        out_specs=q_spec, check_vma=False,
    )(q, k_self, v_self, sl, *flat)


def _pick_attention_impl(d: int) -> str:
    if _ATTN_IMPL != "auto":
        return _ATTN_IMPL
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    return "pallas" if (on_tpu and d % 128 == 0) else "xla"


def _joint_attention_grouped(q, k_self, v_self, segments, layout: str = "hm",
                             attn_impl: Optional[str] = None, self_len=None):
    """Segmented joint attention.

    q, k_self, v_self: (G, B, H, S, Dh) head-major (layout="hm") or
    (G, B, S, H, Dh) seq-major (layout="sm", Pallas path only — avoids the
    XLA transpose copies around the kernel). Self keys are per-group (x
    diverges across CFG branches after layer 0). segments: list of
    (k (B, H, T, Dh), v (B, H, T, Dh), mask (G, B, T) bool, scale) where
    scale is a traced scalar or None — the "force speaker" KV multiplier
    applied at use-site: logits*s and value-contribution*s are exactly
    K*s / V*s (reference: inference.py:420-428). Segments stay separate all
    the way into the kernel: no concatenated-context materialization per
    layer, and the ctx KV reads broadcast across the CFG group axis.
    Self keys are always visible (reference: model.py:249) unless `self_len`
    (B,) int32 bounds each row's visible self extent — the continuous-
    batching final-partial-block mask. fp32 softmax.
    Returns the same layout as q.
    """
    impl = attn_impl or _pick_attention_impl(q.shape[-1])
    if impl in ("pallas_vjp", "pallas_vjp_interpret"):
        from echo_tts_tpu.ops.pallas_attention import (
            joint_attention_grouped_trainable,
        )

        assert layout == "hm", "trainable path is head-major"
        assert self_len is None, "self_len is inference-only"
        return joint_attention_grouped_trainable(
            q, k_self, v_self, [s[:4] for s in segments],
            interpret=(impl == "pallas_vjp_interpret"))
    if impl in ("pallas", "pallas_interpret"):
        interp = impl == "pallas_interpret"
        g = q.shape[0]
        skips = [tuple(s[4]) if len(s) > 4 else () for s in segments]
        if g > 1 and any(skips):
            # Static per-branch segment filtering: a CFG uncond branch whose
            # mask zeroes a whole segment (reference inference.py:489-497)
            # gets its own pallas_call WITHOUT that segment — the dots for
            # fully-masked keys are dead work (26% of attention FLOPs in the
            # 3-branch window). Equivalent by construction: a fully-masked
            # segment contributes exp(-1e30)=0 to softmax and output. An
            # in-kernel lax.cond skip was tried and measured SLOWER (50.7 vs
            # 44.8 ms CFG forward — predication defeats the MXU pipeline).
            visible = [tuple(i for i, sk in enumerate(skips) if gi not in sk)
                       for gi in range(g)]
            outs = []
            gi = 0
            while gi < g:  # contiguous branches with equal signatures share a call
                gj = gi + 1
                while gj < g and visible[gj] == visible[gi]:
                    gj += 1
                segs = [(segments[i][0], segments[i][1],
                         segments[i][2][gi:gj], segments[i][3])
                        for i in visible[gi]]
                outs.append(_pallas_call_maybe_tp(
                    q[gi:gj], k_self[gi:gj], v_self[gi:gj], segs,
                    interpret=interp, layout=layout, self_len=self_len))
                gi = gj
            return jnp.concatenate(outs, axis=0)
        return _pallas_call_maybe_tp(
            q, k_self, v_self, [s[:4] for s in segments], interpret=interp,
            layout=layout, self_len=self_len)
    if layout == "sm":  # XLA path computes head-major
        q = q.transpose(0, 1, 3, 2, 4)
        k_self = k_self.transpose(0, 1, 3, 2, 4)
        v_self = v_self.transpose(0, 1, 3, 2, 4)
        out = _joint_attention_grouped(q, k_self, v_self, segments, "hm",
                                       attn_impl=attn_impl, self_len=self_len)
        return out.transpose(0, 1, 3, 2, 4)
    g, b, h, s, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    l_self = jnp.einsum("gbhsd,gbhtd->gbhst", q, k_self,
                        preferred_element_type=jnp.float32) * scale
    if self_len is not None:
        t_self = k_self.shape[3]
        sb = jnp.where(jnp.arange(t_self)[None, :]
                       < jnp.asarray(self_len, jnp.int32)[:, None],
                       jnp.float32(0.0), jnp.float32(-1e30))  # (B, T)
        l_self = l_self + sb[None, :, None, None, :]
    logits = [l_self]
    for seg in segments:
        k, v, mask, s_kv = seg[:4]  # optional 5th (branch skips) is a
        #                              Pallas-only fast path; masks subsume it
        l = jnp.einsum("gbhsd,bhtd->gbhst", q, k,
                       preferred_element_type=jnp.float32) * scale
        if s_kv is not None:
            l = l * s_kv
        l = jnp.where(mask[:, :, None, None, :], l, jnp.float32(-1e30))
        logits.append(l)
    w = jax.nn.softmax(jnp.concatenate(logits, axis=-1), axis=-1
                       ).astype(v_self.dtype)
    out = jnp.einsum("gbhst,gbhtd->gbhsd", w[..., :s], v_self,
                     preferred_element_type=jnp.float32)
    off = s
    for seg in segments:
        k, v, mask, s_kv = seg[:4]
        t = k.shape[2]
        o = jnp.einsum("gbhst,bhtd->gbhsd", w[..., off:off + t], v,
                       preferred_element_type=jnp.float32)
        if s_kv is not None:
            o = o * s_kv
        out = out + o
        off += t
    return out.astype(v_self.dtype)


def _dit_forward_grouped(
    params: dict,
    cfg: DiTConfig,
    x: jnp.ndarray,                     # (G, B, S, latent_size), model dtype
    t: jnp.ndarray,                     # (B,), model dtype (same t across groups)
    text_mask: jnp.ndarray,             # (G, B, T_text) bool
    spk_mask: jnp.ndarray,              # (G, B, T_spk_patches) bool (post-stride)
    kv_text: Tuple[jnp.ndarray, jnp.ndarray],     # each (L, B, H, T_text, Dh)
    kv_speaker: Tuple[jnp.ndarray, jnp.ndarray],  # each (L, B, H, T_spk, Dh)
    rope_q: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    kv_latent: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    latent_mask: Optional[jnp.ndarray],           # (G, B, T_lat) bool
    speaker_kv_scale: Optional[jnp.ndarray],      # (L,) use-site scale or None
    branch_skips: Tuple[tuple, tuple] = ((), ()), # static: CFG branches whose
    #   mask fully zeroes (text, speaker) — lets the Pallas kernel skip dots
    remat: bool = False,   # rematerialize the trunk body (training: without
    #   it the scan saves every layer's intermediates and full-size
    #   finetuning OOMs; ~1/3 extra fwd FLOPs in the bwd pass)
    attn_impl: Optional[str] = None,  # explicit impl override (training picks
    #   a differentiable one); None = module-level dispatch
    self_len=None,         # (B,) int32: per-row visible self extent
    #   (continuous-batching final-partial-block mask)
) -> jnp.ndarray:
    """Core trunk (reference: model.py:563-604). Returns fp32 (G, B, S, D_lat)."""
    g, b, s, _ = x.shape
    h_, dh = cfg.num_heads, cfg.head_dim
    eps = cfg.norm_eps

    if rope_q is None:
        cos_q, sin_q = precompute_rope(dh, s)
    else:
        cos_q, sin_q = rope_q

    cond = timestep_embedding(t, cfg.timestep_embed_size)
    cm = params["cond_module"]
    cond = jax.nn.silu(cond @ cm["w0"])
    cond = jax.nn.silu(cond @ cm["w1"])
    cond = cond @ cm["w2"]
    cond = cond[:, None]  # (B, 1, 3D) — broadcasts over the group axis

    x = x @ params["in_proj"]["w"] + params["in_proj"]["b"]

    kt_k, kt_v = kv_text
    ks_k, ks_v = kv_speaker
    has_latent = kv_latent is not None and kv_latent[0].shape[3] > 0

    # all-layer AdaLN refinements batched once per forward (the rank-r GEMMs
    # are latency-bound at B~1 inside the scan body; see core/layers.py)
    a_shift, a_scale, a_gate = precompute_adaln(
        cond, params["blocks"]["attention_adaln"])
    m_shift, m_scale, m_gate = precompute_adaln(
        cond, params["blocks"]["mlp_adaln"])

    # scan only what the body consumes (the raw adaln stacks are folded into
    # the precomputed shift/scale/gate above)
    blocks = {"attention": params["blocks"]["attention"],
              "mlp": params["blocks"]["mlp"]}
    per = {"p": blocks, "kt_k": kt_k, "kt_v": kt_v,
           "ks_k": ks_k, "ks_v": ks_v,
           "a_shift": a_shift, "a_scale": a_scale, "a_gate": a_gate,
           "m_shift": m_shift, "m_scale": m_scale, "m_gate": m_gate}
    if speaker_kv_scale is not None:
        per["s_scale"] = speaker_kv_scale
    if has_latent:
        per["kl_k"], per["kl_v"] = kv_latent

    def body(x, per):
        p = per["p"]
        a = p["attention"]
        skv = per["s_scale"] if "s_scale" in per else None

        h = modulate_rms(x, per["a_shift"], per["a_scale"], eps)
        attn_gate = per["a_gate"]
        # proj_shared dispatches bf16 vs opt-in W8A8 int8 (models/quant.py):
        # one activation quant shared by the four projections of h
        q, k_self, v_self, gate = quant.proj_shared(
            h, [a["wq"], a["wk"], a["wv"], a["gate"]])
        q = q.reshape(g, b, s, h_, dh)
        k_self = k_self.reshape(g, b, s, h_, dh)
        v_self = v_self.reshape(g, b, s, h_, dh)
        q = rms_norm(q, a["q_norm"], eps)
        k_self = rms_norm(k_self, a["k_norm"], eps)
        q = apply_rope_half_heads(q, cos_q, sin_q)
        k_self = apply_rope_half_heads(k_self, cos_q, sin_q)
        # the Pallas kernel reads the projections' natural seq-major
        # (G, B, S, H, Dh) layout directly (lane-aligned head blocks); only
        # the XLA einsum path wants head-major
        impl_here = attn_impl or _pick_attention_impl(dh)
        seq_major = impl_here in ("pallas", "pallas_interpret")
        if not seq_major:
            q = q.transpose(0, 1, 3, 2, 4)
            k_self = k_self.transpose(0, 1, 3, 2, 4)
            v_self = v_self.transpose(0, 1, 3, 2, 4)

        # segment order matches reference concat [latent|text|speaker]
        # (model.py:246-253)
        segments = []
        if has_latent:
            segments.append((per["kl_k"], per["kl_v"], latent_mask, None, ()))
        segments.append((per["kt_k"], per["kt_v"], text_mask, None,
                         branch_skips[0]))
        segments.append((per["ks_k"], per["ks_v"], spk_mask, skv,
                         branch_skips[1]))

        o = _joint_attention_grouped(q, k_self, v_self, segments,
                                     layout="sm" if seq_major else "hm",
                                     attn_impl=attn_impl, self_len=self_len)
        if not seq_major:
            o = o.transpose(0, 1, 3, 2, 4)
        o = o.reshape(g, b, s, cfg.model_size)
        o = o * jax.nn.sigmoid(gate)
        x = x + attn_gate * quant.mm(o, a["wo"])

        h = modulate_rms(x, per["m_shift"], per["m_scale"], eps)
        x = x + per["m_gate"] * quant.swiglu_mlp_q(h, p["mlp"])
        return x, None

    x, _ = jax.lax.scan(jax.checkpoint(body) if remat else body, x, per)

    x = rms_norm(x, params["out_norm"], eps)
    x = x @ params["out_proj"]["w"] + params["out_proj"]["b"]
    return x.astype(jnp.float32)


def dit_forward(
    params: dict,
    cfg: DiTConfig,
    x: jnp.ndarray,                     # (B, S, latent_size)
    t: jnp.ndarray,                     # (B,)
    text_mask: jnp.ndarray,             # (B, T_text) bool
    speaker_mask: jnp.ndarray,          # (B, S_spk_latents) bool (pre-stride)
    kv_text, kv_speaker,
    rope_q=None, kv_latent=None, latent_mask=None, speaker_kv_scale=None,
    remat: bool = False, attn_impl: Optional[str] = None, self_len=None,
) -> jnp.ndarray:
    """Single-branch forward (reference: model.py:563-604), fp32 output.

    rope_q defaults to positions [0, S); blockwise callers pass tables sliced
    at start_pos (reference: model.py:229). latent_mask encodes the
    reference's `latent_pos < start_pos` key gating (model.py:243-244).
    """
    has_latent = kv_latent is not None and kv_latent[0].shape[3] > 0
    if has_latent and latent_mask is None:
        latent_mask = jnp.ones((x.shape[0], kv_latent[0].shape[3]), dtype=jnp.bool_)
    spk_mask = speaker_mask[..., :: cfg.speaker_patch_size]  # model.py:581
    out = _dit_forward_grouped(
        params, cfg, x[None], t, text_mask[None], spk_mask[None],
        kv_text, kv_speaker, rope_q,
        kv_latent if has_latent else None,
        latent_mask[None] if has_latent else None, speaker_kv_scale,
        remat=remat, attn_impl=attn_impl, self_len=self_len)
    return out[0]


def dit_forward_cfg(
    params: dict,
    cfg: DiTConfig,
    x: jnp.ndarray,                     # (B, S, latent_size) — shared across branches
    t: jnp.ndarray,                     # (B,)
    text_mask, speaker_mask,            # (B, T) bool, conditional masks
    kv_text, kv_speaker,
    rope_q=None, kv_latent=None, latent_mask=None, speaker_kv_scale=None,
    joint_uncond: bool = False, self_len=None,
) -> jnp.ndarray:
    """CFG forward: [cond, text-uncond, speaker-uncond] (3 branches), or
    [cond, joint-uncond] (2 branches) when joint_uncond.

    Branch masks follow reference inference.py:479-497: unconds attend to
    nothing in their ablated segment but the caches carry conditional values.
    Returns fp32 (n_groups, B, S, latent_size).
    """
    has_latent = kv_latent is not None and kv_latent[0].shape[3] > 0
    spk = speaker_mask[..., :: cfg.speaker_patch_size]  # model.py:581
    n_groups = 2 if joint_uncond else 3
    lm = None
    if has_latent:
        if latent_mask is None:
            latent_mask = jnp.ones((x.shape[0], kv_latent[0].shape[3]), dtype=jnp.bool_)
        lm = jnp.broadcast_to(latent_mask[None], (n_groups,) + latent_mask.shape)
    if joint_uncond:
        # one shared unconditional: both text and speaker masked
        # (reference comment at inference.py:530)
        text_m = jnp.stack([text_mask, jnp.zeros_like(text_mask)])
        spk_m = jnp.stack([spk, jnp.zeros_like(spk)])
        branch_skips = ((1,), (1,))
    else:
        text_m = jnp.stack([text_mask, jnp.zeros_like(text_mask), text_mask])
        spk_m = jnp.stack([spk, spk, jnp.zeros_like(spk)])
        branch_skips = ((1,), (2,))
    xg = jnp.broadcast_to(x[None], (n_groups,) + x.shape)
    return _dit_forward_grouped(
        params, cfg, xg, t, text_m, spk_m, kv_text, kv_speaker,
        rope_q, kv_latent if has_latent else None, lm, speaker_kv_scale,
        branch_skips=branch_skips, self_len=self_len)


# ---------------------------------------------------------------------------
# Initialization (for from-scratch training / benches; checkpoints come from
# the converter in echo_tts_tpu/checkpoints/convert.py)
# ---------------------------------------------------------------------------


def _linear_init(key, fan_in, shape, dtype):
    bound = 1.0 / jnp.sqrt(jnp.float32(fan_in))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound).astype(dtype)


def _init_encoder_blocks(key, n_layers, d, n_heads, ffn, dtype):
    ks = jax.random.split(key, 8)
    hd = d // n_heads
    return {
        "attention": {
            "wq": _linear_init(ks[0], d, (n_layers, d, d), dtype),
            "wk": _linear_init(ks[1], d, (n_layers, d, d), dtype),
            "wv": _linear_init(ks[2], d, (n_layers, d, d), dtype),
            "wo": _linear_init(ks[3], d, (n_layers, d, d), dtype),
            "gate": _linear_init(ks[4], d, (n_layers, d, d), dtype),
            "q_norm": jnp.ones((n_layers, n_heads, hd), dtype),
            "k_norm": jnp.ones((n_layers, n_heads, hd), dtype),
        },
        "mlp": {
            "w1": _linear_init(ks[5], d, (n_layers, d, ffn), dtype),
            "w3": _linear_init(ks[6], d, (n_layers, d, ffn), dtype),
            "w2": _linear_init(ks[7], ffn, (n_layers, ffn, d), dtype),
        },
        "attention_norm": jnp.ones((n_layers, d), dtype),
        "mlp_norm": jnp.ones((n_layers, d), dtype),
    }


def init_dit_params(key, cfg: DiTConfig, dtype=jnp.bfloat16) -> dict:
    keys = jax.random.split(key, 24)
    d, l, h = cfg.model_size, cfg.num_layers, cfg.num_heads
    hd = cfg.head_dim
    dt, ds = cfg.text_model_size, cfg.speaker_model_size
    r = cfg.adaln_rank

    def adaln(key):
        ks = jax.random.split(key, 6)
        return {
            "shift_down": _linear_init(ks[0], d, (l, d, r), dtype),
            "scale_down": _linear_init(ks[1], d, (l, d, r), dtype),
            "gate_down": _linear_init(ks[2], d, (l, d, r), dtype),
            "shift_up": {"w": _linear_init(ks[3], r, (l, r, d), dtype),
                         "b": jnp.zeros((l, d), dtype)},
            "scale_up": {"w": _linear_init(ks[4], r, (l, r, d), dtype),
                         "b": jnp.zeros((l, d), dtype)},
            "gate_up": {"w": _linear_init(ks[5], r, (l, r, d), dtype),
                        "b": jnp.zeros((l, d), dtype)},
        }

    def patch_encoder(key):
        k1, k2 = jax.random.split(key)
        in_dim = cfg.latent_size * cfg.speaker_patch_size
        return {
            "in_proj": {"w": _linear_init(k1, in_dim, (in_dim, ds), dtype),
                        "b": jnp.zeros((ds,), dtype)},
            "blocks": _init_encoder_blocks(
                k2, cfg.speaker_num_layers, ds, cfg.speaker_num_heads,
                cfg.speaker_intermediate_size, dtype),
        }

    attn = {
        "wq": _linear_init(keys[0], d, (l, d, d), dtype),
        "wk": _linear_init(keys[1], d, (l, d, d), dtype),
        "wv": _linear_init(keys[2], d, (l, d, d), dtype),
        "wo": _linear_init(keys[3], d, (l, d, d), dtype),
        "gate": _linear_init(keys[4], d, (l, d, d), dtype),
        "wk_text": _linear_init(keys[5], dt, (l, dt, d), dtype),
        "wv_text": _linear_init(keys[6], dt, (l, dt, d), dtype),
        "wk_speaker": _linear_init(keys[7], ds, (l, ds, d), dtype),
        "wv_speaker": _linear_init(keys[8], ds, (l, ds, d), dtype),
        "q_norm": jnp.ones((l, h, hd), dtype),
        "k_norm": jnp.ones((l, h, hd), dtype),
    }
    if cfg.has_latent_modules:
        attn["wk_latent"] = _linear_init(keys[9], ds, (l, ds, d), dtype)
        attn["wv_latent"] = _linear_init(keys[10], ds, (l, ds, d), dtype)

    params = {
        "text_encoder": {
            "embedding": jax.random.normal(keys[11], (cfg.text_vocab_size, dt)).astype(dtype),
            "blocks": _init_encoder_blocks(
                keys[12], cfg.text_num_layers, dt, cfg.text_num_heads,
                cfg.text_intermediate_size, dtype),
        },
        "speaker_encoder": patch_encoder(keys[13]),
        "text_norm": jnp.ones((dt,), dtype),
        "speaker_norm": jnp.ones((ds,), dtype),
        "cond_module": {
            "w0": _linear_init(keys[14], cfg.timestep_embed_size,
                               (cfg.timestep_embed_size, d), dtype),
            "w1": _linear_init(keys[15], d, (d, d), dtype),
            "w2": _linear_init(keys[16], d, (d, 3 * d), dtype),
        },
        "in_proj": {"w": _linear_init(keys[17], cfg.latent_size, (cfg.latent_size, d), dtype),
                    "b": jnp.zeros((d,), dtype)},
        "blocks": {
            "attention": attn,
            "mlp": {
                "w1": _linear_init(keys[18], d, (l, d, cfg.intermediate_size), dtype),
                "w3": _linear_init(keys[19], d, (l, d, cfg.intermediate_size), dtype),
                "w2": _linear_init(keys[20], cfg.intermediate_size,
                                   (l, cfg.intermediate_size, d), dtype),
            },
            "attention_adaln": adaln(keys[21]),
            "mlp_adaln": adaln(keys[22]),
        },
        "out_norm": jnp.ones((d,), dtype),
        "out_proj": {"w": _linear_init(keys[23], d, (d, cfg.latent_size), dtype),
                     "b": jnp.zeros((cfg.latent_size,), dtype)},
    }
    if cfg.has_latent_modules:
        params["latent_encoder"] = patch_encoder(jax.random.fold_in(key, 99))
        params["latent_norm"] = jnp.ones((ds,), dtype)
    return params
