"""Fish S1-DAC audio codec in JAX (reference: autoencoder.py).

TPU-native re-architecture of the reference's torch module tree:

* Pure functions over parameter pytrees; weight-norm parametrizations are
  folded into plain weights at conversion time (reference keeps runtime
  g·v/||v|| recompute, autoencoder.py:90-94) — inference-only, so the
  parametrization machinery is dead weight.
* Causal convs use `lax.conv_general_dilated` with the reference's exact
  left-pad/extra-right-pad arithmetic (autoencoder.py:49-81, 285-289)
  computed at trace time from static shapes.
* Transposed convs via `lax.conv_transpose(transpose_kernel=True)` matching
  torch ConvTranspose1d, with the causal right-unpad (autoencoder.py:310-316).
* The RVQ encode path computes code indices with one batched MXU matmul per
  codebook (L2-normalized ViT-VQGAN lookup, autoencoder.py:145-157).

Quirk preserved (do not "fix"): the reference's DecoderBlock constructs its
transformer but never adds it to the module (autoencoder.py:944-965), so the
decoder has NO transformer layers — we match that; only the encoder's last
block and the quantizer pre/post modules carry transformers.

Layout note: like the reference, time-domain tensors are channels-first
(B, C, T) through the conv stack and transposed to (B, T, C) inside
transformer/ConvNeXt MLP segments.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from echo_tts_tpu.core.config import AEConfig

# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def conv1d(x, w, b=None, *, stride=1, dilation=1, groups=1, pad=(0, 0)):
    """torch Conv1d semantics on (B, C, T); w: (out, in/groups, k)."""
    if pad != (0, 0):
        x = jnp.pad(x, ((0, 0), (0, 0), pad))
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        precision=jax.lax.Precision.HIGHEST,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def conv_transpose1d(x, w, b=None, *, stride=1):
    """torch ConvTranspose1d (no padding) on (B, C, T); w: (in, out, k).

    With transpose_kernel=True, lax swaps the kernel's I/O identifiers, so the
    torch (in, out, k) layout is declared as "OIH" (verified bit-exact vs
    torch in tests/test_s1dac_parity.py)."""
    out = jax.lax.conv_transpose(
        x, w,
        strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        transpose_kernel=True,
        precision=jax.lax.Precision.HIGHEST,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def get_extra_padding_for_conv1d(length: int, kernel_size: int, stride: int,
                                 padding_total: int) -> int:
    """reference: autoencoder.py:49-56 — right pad so striding covers length."""
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


def causal_conv(x, p: dict, *, kernel_size: int, stride=1, dilation=1, groups=1):
    """CausalConvNet (reference: autoencoder.py:264-289): left-pad k_eff-s,
    plus extra right pad for stride coverage."""
    k_eff = (kernel_size - 1) * dilation + 1
    pad = k_eff - stride
    extra = get_extra_padding_for_conv1d(x.shape[-1], k_eff, stride, pad)
    return conv1d(x, p["w"], p.get("b"), stride=stride, dilation=dilation,
                  groups=groups, pad=(pad, extra))


def causal_tconv(x, p: dict, *, kernel_size: int, stride=1):
    """CausalTransConvNet (reference: autoencoder.py:300-316): transposed conv
    then right-unpad k-s."""
    out = conv_transpose1d(x, p["w"], p.get("b"), stride=stride)
    pad = kernel_size - stride
    if pad > 0:
        out = out[..., :-pad]
    return out


def snake(x, alpha):
    """x + sin^2(alpha x)/(alpha+1e-9), per-channel alpha (1, C, 1)
    (reference: autoencoder.py:96-109). Pure VPU; XLA fuses it into the
    surrounding convs.

    sin² is computed with the same range-reduced degree-6 polynomial as the
    Pallas res-chain kernel (ops/pallas_conv.py:_sin2, max |err| 2.3e-10 —
    four orders below the 2e-5 parity tolerances): TPU `sin` costs ~40 VPU
    ops and dominated the decoder tail (BASELINE.md 2026-08-19).

    The polynomial runs in fp32 (range reduction needs the mantissa) but the
    result is cast BACK to x's dtype: the poly's fp32 constants otherwise
    silently promote the whole bf16 decoder to fp32 downstream — fp32 MXU
    GEMMs in the tconvs and double-VMEM Pallas chain inputs (measured as a
    VMEM OOM at C=768 and a slower vocoder)."""
    from echo_tts_tpu.ops.pallas_conv import _sin2

    xf = x.astype(jnp.float32)
    af = alpha.astype(jnp.float32)
    return (xf + (1.0 / (af + 1e-9)) * _sin2(af * xf)).astype(x.dtype)


def _layer_norm(x, w, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def convnext_block(x, p: dict, *, kernel_size=7, dilation=1):
    """ConvNeXt 1D block (reference: autoencoder.py:333-373): depthwise causal
    conv -> LN -> pw MLP (GELU exact) -> layer-scale gamma, residual."""
    dim = x.shape[1]
    inp = x
    x = causal_conv(x, p["dwconv"], kernel_size=kernel_size, dilation=dilation,
                    groups=dim)
    x = x.transpose(0, 2, 1)
    x = _layer_norm(x, p["norm"]["w"], p["norm"]["b"], eps=1e-6)
    x = x @ p["pwconv1"]["w"] + p["pwconv1"]["b"]
    x = jax.nn.gelu(x, approximate=False)
    x = x @ p["pwconv2"]["w"] + p["pwconv2"]["b"]
    x = p["gamma"] * x
    x = x.transpose(0, 2, 1)
    return inp + x


# ---------------------------------------------------------------------------
# Quantizer-internal transformer (reference: autoencoder.py:503-826)
# ---------------------------------------------------------------------------


def _ae_rope_tables(seq_len: int, head_dim: int, base: float = 10000.0):
    """The AE's rope cache is stored in bf16 (reference: autoencoder.py:805-813
    `precompute_freqs_cis(..., dtype=bf16)`); we replicate the quantization
    then upcast, for bit-comparable angles."""
    freqs = 1.0 / (base ** (np.arange(0, head_dim, 2)[: head_dim // 2].astype(np.float64) / head_dim))
    t = np.arange(seq_len, dtype=np.float64)
    angles = np.outer(t, freqs)
    cos = jnp.asarray(np.cos(angles), jnp.float32).astype(jnp.bfloat16).astype(jnp.float32)
    sin = jnp.asarray(np.sin(angles), jnp.float32).astype(jnp.bfloat16).astype(jnp.float32)
    return cos, sin


def _ae_apply_rope(x, cos, sin):
    """reference: autoencoder.py:815-826 — adjacent-pair rotation, fp32.
    Tables are (S, D/2), or (B, S, D/2) per-row (continuous batching: rows
    of one device batch at different absolute stream positions)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xr, xi = xf[..., 0::2], xf[..., 1::2]
    if cos.ndim == 2:
        c = cos[:, None, :]
        s = sin[:, None, :]
    else:
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    out = jnp.stack([xr * c - xi * s, xi * c + xr * s], axis=-1).reshape(x.shape)
    return out.astype(dtype)


def _ae_rms_norm(x, w, eps=1e-5):
    """AE RMSNorm casts back BEFORE the weight multiply
    (reference: autoencoder.py:720-731) — opposite order to the DiT's."""
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return xf.astype(x.dtype) * w


def window_transformer(x, p: dict, *, n_head: int, head_dim: int,
                       window_size: Optional[int], norm_eps: float = 1e-5):
    """WindowLimitedTransformer, causal, channels-first I/O
    (reference: autoencoder.py:554-608, 744-802). x: (B, C, T)."""
    x = x.transpose(0, 2, 1)  # (B, T, C)
    b, s, d = x.shape
    cos, sin = _ae_rope_tables(s, head_dim)

    # causal window mask (reference: autoencoder.py:762-773)
    rows = jnp.arange(s)[:, None]
    cols = jnp.arange(s)[None, :]
    mask = cols <= rows
    if window_size is not None:
        mask = jnp.logical_and(mask, cols >= jnp.maximum(rows - window_size + 1, 0))

    for layer in p["layers"]:
        h = _ae_rms_norm(x, layer["attention_norm"]["w"], norm_eps)
        qkv = h @ layer["attention"]["wqkv"]["w"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, n_head, head_dim)
        k = k.reshape(b, s, n_head, head_dim)
        v = v.reshape(b, s, n_head, head_dim)
        q = _ae_apply_rope(q, cos, sin)
        k = _ae_apply_rope(k, cos, sin)
        scale = 1.0 / jnp.sqrt(jnp.float32(head_dim))
        logits = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mask[None, None], logits, jnp.float32(-1e30))
        w_ = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhst,bthd->bshd", w_, v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        o = o.reshape(b, s, n_head * head_dim) @ layer["attention"]["wo"]["w"]
        x = x + layer["attention_layer_scale"] * o

        h = _ae_rms_norm(x, layer["ffn_norm"]["w"], norm_eps)
        ff = layer["feed_forward"]
        h = (jax.nn.silu(h @ ff["w1"]["w"]) * (h @ ff["w3"]["w"])) @ ff["w2"]["w"]
        x = x + layer["ffn_layer_scale"] * h

    x = _ae_rms_norm(x, p["norm"]["w"], norm_eps)
    return x.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# Vector quantization (reference: autoencoder.py:117-247)
# ---------------------------------------------------------------------------


def vq_encode_indices(z: jnp.ndarray, q: dict) -> jnp.ndarray:
    """Nearest L2-normalized code (reference: autoencoder.py:145-157).
    z: (B, D, T) -> indices (B, T)."""
    z_e = conv1d(z, q["in_proj"]["w"], q["in_proj"]["b"])  # (B, Dc, T)
    enc = z_e.transpose(0, 2, 1)  # (B, T, Dc)
    enc = enc * jax.lax.rsqrt(jnp.sum(enc * enc, axis=-1, keepdims=True) + 1e-24)
    cb = q["codebook"]
    cb = cb * jax.lax.rsqrt(jnp.sum(cb * cb, axis=-1, keepdims=True) + 1e-24)
    # dist = |e|^2 - 2 e.c + |c|^2 ; argmax(-dist) == argmax(e.c) after norm
    sim = jnp.einsum("btd,kd->btk", enc, cb, preferred_element_type=jnp.float32)
    return jnp.argmax(sim, axis=-1).astype(jnp.int32)


def vq_decode_from_indices(indices: jnp.ndarray, q: dict) -> jnp.ndarray:
    """codes -> out_proj(codebook[codes]) (reference: autoencoder.py:139-143,
    223-232). indices (B, T) -> (B, D, T)."""
    z_p = q["codebook"][indices]  # (B, T, Dc)
    return conv1d(z_p.transpose(0, 2, 1), q["out_proj"]["w"], q["out_proj"]["b"])


def rvq_encode(z: jnp.ndarray, quantizers: list) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Residual VQ stack at eval (reference: autoencoder.py:184-221).
    Returns (codes (B, N, T), z_q (B, D, T))."""
    residual = z
    z_q = jnp.zeros_like(z)
    codes = []
    for q in quantizers:
        idx = vq_encode_indices(residual, q)
        z_q_i = vq_decode_from_indices(idx, q)
        residual = residual - z_q_i
        z_q = z_q + z_q_i
        codes.append(idx)
    return jnp.stack(codes, axis=1), z_q


def rvq_decode(codes: jnp.ndarray, quantizers: list) -> jnp.ndarray:
    """reference: autoencoder.py:223-232. codes (B, N, T) -> (B, D, T)."""
    z_q = None
    for i, q in enumerate(quantizers):
        z_q_i = vq_decode_from_indices(codes[:, i], q)
        z_q = z_q_i if z_q is None else z_q + z_q_i
    return z_q


def vq_decode_latents(z_e: jnp.ndarray, q: dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest code for ALREADY-projected codebook latents (B, Dc, T) — no
    in_proj (reference: VectorQuantize.decode_latents,
    autoencoder.py:145-157). Returns (z_p (B, Dc, T) embedded codes,
    indices (B, T))."""
    enc = z_e.transpose(0, 2, 1)  # (B, T, Dc)
    enc = enc * jax.lax.rsqrt(jnp.sum(enc * enc, axis=-1, keepdims=True) + 1e-24)
    cb = q["codebook"]
    cb = cb * jax.lax.rsqrt(jnp.sum(cb * cb, axis=-1, keepdims=True) + 1e-24)
    sim = jnp.einsum("btd,kd->btk", enc, cb, preferred_element_type=jnp.float32)
    idx = jnp.argmax(sim, axis=-1).astype(jnp.int32)
    z_p = q["codebook"][idx].transpose(0, 2, 1)
    return z_p, idx


def rvq_from_latents(latents: jnp.ndarray, quantizers: list
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode from concatenated projected latents (B, sum(Dc), T) — the
    reference's third RVQ decode path (autoencoder.py:234-247): each
    codebook's channel slice is nearest-neighbor quantized (no in_proj) and
    out_proj'd into the running sum. Channels beyond the last whole codebook
    slice are ignored, as in the reference's cumsum gating. Returns
    (z_q (B, D, T), z_p (B, sum(Dc), T), codes (B, N, T))."""
    dims = [0]
    for q in quantizers:
        dims.append(dims[-1] + q["codebook"].shape[1])
    n_codebooks = max(i for i in range(len(dims)) if dims[i] <= latents.shape[1])
    z_q = None
    z_ps, codes = [], []
    for i in range(n_codebooks):
        z_p_i, idx = vq_decode_latents(latents[:, dims[i]:dims[i + 1]],
                                       quantizers[i])
        z_ps.append(z_p_i)
        codes.append(idx)
        z_q_i = conv1d(z_p_i, quantizers[i]["out_proj"]["w"],
                       quantizers[i]["out_proj"]["b"])
        z_q = z_q_i if z_q is None else z_q + z_q_i
    return z_q, jnp.concatenate(z_ps, axis=1), jnp.stack(codes, axis=1)


# ---------------------------------------------------------------------------
# Encoder / Decoder stacks (reference: autoencoder.py:839-998)
# ---------------------------------------------------------------------------


def _residual_unit(x, p, *, dilation):
    """reference: autoencoder.py:879-900 (causal: stride-1 convs keep length,
    so the residual crop is a no-op)."""
    y = snake(x, p["snake1"])
    y = causal_conv(y, p["conv1"], kernel_size=7, dilation=dilation)
    y = snake(y, p["snake2"])
    y = causal_conv(y, p["conv2"], kernel_size=1)
    return x + y


# Below ~192 channels XLA's 1-D conv lowering runs at <8 TFLOP/s on v5e while
# the same math as K accumulated shifted matmuls (channels-last) doubles that
# (measured; BASELINE.md). The decoder's low-channel tail dominates vocoder
# time, so its residual units dispatch to this formulation.
_SHIFTED_MATMUL_MAX_CH = 192

# Residual-unit conv implementation:
#   "auto"             — fused Pallas chain kernel on TPU, else XLA
#   "xla"              — shifted-matmul / lax.conv formulations (autodiff-safe)
#   "pallas"           — force the Pallas kernel (compiled)
#   "pallas_interpret" — Pallas interpreter mode (CPU kernel tests)
_CONV_IMPL = "auto"


def set_conv_impl(impl: str) -> None:
    global _CONV_IMPL
    assert impl in ("auto", "xla", "pallas", "pallas_interpret"), impl
    _CONV_IMPL = impl


def _pick_conv_impl() -> str:
    if _CONV_IMPL != "auto":
        return _CONV_IMPL
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    return "pallas" if on_tpu else "xla"


def _res_chain_cl(x_cl, units, dilations=(1, 3, 9)):
    """Residual-unit chain on channels-last x, dispatched to the fused Pallas
    kernel (one HBM round-trip per chain) or the XLA shifted-matmul path."""
    impl = _pick_conv_impl()
    if impl in ("pallas", "pallas_interpret"):
        from echo_tts_tpu.ops.pallas_conv import res_units_cl

        return res_units_cl(x_cl, units, dilations,
                            interpret=(impl == "pallas_interpret"))
    for u, d in zip(units, dilations):
        x_cl = _residual_unit_cl(x_cl, u, dilation=d)
    return x_cl


def _causal_conv_shifted_cl(x_cl, w, b, *, kernel_size: int, dilation: int):
    """Stride-1 causal conv on channels-last (B, T, C) as kernel_size
    accumulated shifted matmuls. w: (O, I, K) torch layout."""
    k_eff = (kernel_size - 1) * dilation + 1
    xp = jnp.pad(x_cl, ((0, 0), (k_eff - 1, 0), (0, 0)))
    wt = jnp.transpose(w, (2, 1, 0))  # (K, I, O)
    t = x_cl.shape[1]
    out = None
    for j in range(kernel_size):
        xi = jax.lax.dynamic_slice_in_dim(xp, j * dilation, t, axis=1)
        o = xi @ wt[j]
        out = o if out is None else out + o
    if b is not None:
        out = out + b
    return out


def _causal_tconv_phase_cl(x_cl, w, b, *, kernel_size: int, stride: int):
    """Causal transposed conv as ceil(k/s) phase-grouped matmuls,
    channels-last. w: (I, O, K) torch layout.

    torch tconv: y[t] = sum_i x[i] W[..., t - i*s]; writing t = s*i' + po the
    taps j = m*s + po give y[s*i'+po] = sum_m x[i'-m] @ W[..., m*s+po] — each
    m is ONE matmul (T, I) @ (I, s*O) with po-major output lanes, then an
    interleaving reshape. s*O lanes instead of O: MXU-efficient where the
    direct lowering starves (O=96..192). Includes the causal right-unpad k-s
    (reference: autoencoder.py:310-316), so output length is T*s."""
    t_in, i_ch = x_cl.shape[1], x_cl.shape[2]
    o_ch = w.shape[1]
    s = stride
    m_taps = -(-kernel_size // s)
    k_pad = m_taps * s
    if k_pad != kernel_size:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, k_pad - kernel_size)))
    w2 = w.reshape(i_ch, o_ch, m_taps, s)
    out = None
    for m in range(m_taps):
        wm = w2[:, :, m, :].transpose(0, 2, 1).reshape(i_ch, s * o_ch)
        xm = x_cl if m == 0 else jnp.pad(x_cl, ((0, 0), (m, 0), (0, 0)))[:, :t_in]
        o = xm @ wm
        out = o if out is None else out + o
    y = out.reshape(x_cl.shape[0], t_in * s, o_ch)
    if b is not None:
        y = y + b
    return y


def _snake_cl(x_cl, alpha_flat):
    """Channels-last snake with the polynomial sin² (see `snake` — fp32
    internally, result cast back to x's dtype)."""
    from echo_tts_tpu.ops.pallas_conv import _sin2

    xf = x_cl.astype(jnp.float32)
    af = alpha_flat.astype(jnp.float32)
    return (xf + (1.0 / (af + 1e-9)) * _sin2(af * xf)).astype(x_cl.dtype)


def _residual_unit_cl(x_cl, p, *, dilation):
    """Channels-last residual unit (same math as _residual_unit)."""
    y = _snake_cl(x_cl, p["snake1"].reshape(-1))
    y = _causal_conv_shifted_cl(y, p["conv1"]["w"], p["conv1"].get("b"),
                                kernel_size=7, dilation=dilation)
    y = _snake_cl(y, p["snake2"].reshape(-1))
    y = _causal_conv_shifted_cl(y, p["conv2"]["w"], p["conv2"].get("b"),
                                kernel_size=1, dilation=1)
    return x_cl + y


def encoder_forward(params: dict, cfg: AEConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """Audio (B, 1, T) -> latents (B, latent_dim, T/hop)
    (reference: autoencoder.py:903-929)."""
    p = params["encoder"]
    x = causal_conv(audio, p["stem"], kernel_size=7)
    d_model = cfg.encoder_dim
    for i, (stride, n_t) in enumerate(zip(cfg.encoder_rates,
                                          cfg.encoder_transformer_layers)):
        d_model *= 2
        blk = p["blocks"][i]
        use_pallas = _pick_conv_impl() in ("pallas", "pallas_interpret")
        if use_pallas or x.shape[1] <= _SHIFTED_MATMUL_MAX_CH:
            x = x.transpose(0, 2, 1)
            x = _res_chain_cl(x, blk["res_units"])
            x = x.transpose(0, 2, 1)
        else:
            for j, dil in enumerate((1, 3, 9)):
                x = _residual_unit(x, blk["res_units"][j], dilation=dil)
        x = snake(x, blk["snake"])
        x = causal_conv(x, blk["down"], kernel_size=2 * stride, stride=stride)
        if n_t > 0:
            x = window_transformer(
                x, blk["transformer"], n_head=d_model // 64, head_dim=64,
                window_size=cfg.enc_window_size)
    x = snake(x, p["head_snake"])
    x = causal_conv(x, p["head"], kernel_size=3)
    return x


def decoder_forward(params: dict, cfg: AEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Latents (B, latent_dim, T) -> waveform (B, 1, T*hop)
    (reference: autoencoder.py:932-998; decoder transformers are absent — see
    module docstring quirk note)."""
    p = params["decoder"]
    x = causal_conv(z, p["stem"], kernel_size=7)
    use_pallas = _pick_conv_impl() in ("pallas", "pallas_interpret")
    cl = False  # channels-last mode
    for i, stride in enumerate(cfg.decoder_rates):
        blk = p["blocks"][i]
        out_ch = blk["up"]["w"].shape[1]
        if not cl and (use_pallas or out_ch <= _SHIFTED_MATMUL_MAX_CH):
            # switch to channels-last: with the fused Pallas res-chain kernel
            # the whole decoder runs CL (one HBM round-trip per chain); on the
            # XLA path only the low-channel tail benefits from the
            # shifted-matmul formulation (see _SHIFTED_MATMUL_MAX_CH note)
            x = x.transpose(0, 2, 1)
            cl = True
        if cl:
            x = _snake_cl(x, blk["snake"].reshape(-1))
            x = _causal_tconv_phase_cl(x, blk["up"]["w"], blk["up"].get("b"),
                                       kernel_size=2 * stride, stride=stride)
            x = _res_chain_cl(x, blk["res_units"])
        else:
            x = snake(x, blk["snake"])
            # phase-matmul tconv beats the direct lowering at every decoder
            # width (s*O output lanes); two cheap layout flips around it
            x = _causal_tconv_phase_cl(
                x.transpose(0, 2, 1), blk["up"]["w"], blk["up"].get("b"),
                kernel_size=2 * stride, stride=stride).transpose(0, 2, 1)
            for j, dil in enumerate((1, 3, 9)):
                x = _residual_unit(x, blk["res_units"][j], dilation=dil)
    if cl:
        x = _snake_cl(x, p["head_snake"].reshape(-1))
        x = _causal_conv_shifted_cl(x, p["head"]["w"], p["head"].get("b"),
                                    kernel_size=7, dilation=1)
        return jnp.tanh(x).transpose(0, 2, 1)
    x = snake(x, p["head_snake"])
    x = causal_conv(x, p["head"], kernel_size=7)
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# Quantizer top (reference: autoencoder.py:376-496) and DAC entry points
# ---------------------------------------------------------------------------


def _downsample(params, cfg: AEConfig, z):
    for i, factor in enumerate(cfg.downsample_factor):
        st = params["quantizer"]["downsample"][i]
        z = causal_conv(z, st["conv"], kernel_size=factor, stride=factor)
        z = convnext_block(z, st["convnext"])
    return z


def _upsample(params, cfg: AEConfig, z):
    for i, factor in enumerate(reversed(cfg.downsample_factor)):
        st = params["quantizer"]["upsample"][i]
        z = causal_tconv(z, st["conv"], kernel_size=factor, stride=factor)
        z = convnext_block(z, st["convnext"])
    return z


def _q_transformer(params, cfg: AEConfig, which: str, z):
    return window_transformer(
        z, params["quantizer"][which], n_head=cfg.q_n_head,
        head_dim=cfg.q_head_dim, window_size=cfg.q_window_size,
        norm_eps=cfg.norm_eps)


def encode_codes(params: dict, cfg: AEConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """Audio (B, 1, T) -> code indices (B, 1+n_codebooks, T/frame)
    (reference: autoencoder.py:1080-1100, 451-468)."""
    length = audio.shape[-1]
    right_pad = -length % cfg.frame_length
    if right_pad:
        audio = jnp.pad(audio, ((0, 0), (0, 0), (0, right_pad)))
    # run the encoder in the params' dtype: with the bf16 low-VRAM AE
    # (reference gradio_app.py:36-38) fp32 request audio would otherwise
    # die in conv_general_dilated on a dtype mismatch (caught by the r5
    # cold bring-up run — the speaker-prompt path had only ever run fp32)
    audio = audio.astype(jax.tree_util.tree_leaves(params)[0].dtype)
    z = encoder_forward(params, cfg, audio)
    z = _downsample(params, cfg, z)
    z = _q_transformer(params, cfg, "pre_module", z)
    sem_codes, sem_zq = rvq_encode(z, params["quantizer"]["semantic"])
    res_codes, _ = rvq_encode(z - sem_zq, params["quantizer"]["residual"])
    return jnp.concatenate([sem_codes, res_codes], axis=1)


def codes_to_zq(params: dict, cfg: AEConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """codes -> summed semantic+residual z_q, BEFORE post/upsample — the
    latent the TTS pipeline uses (reference: autoencoder.py:1116-1126)."""
    zq_sem = rvq_decode(codes[:, :1], params["quantizer"]["semantic"])
    zq_res = rvq_decode(codes[:, 1:], params["quantizer"]["residual"])
    return zq_sem + zq_res


def encode_zq(params: dict, cfg: AEConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """reference: autoencoder.py:1116-1126."""
    return codes_to_zq(params, cfg, encode_codes(params, cfg, audio))


def decode_codes(params: dict, cfg: AEConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """Full codec decode: code indices -> waveform
    (reference: autoencoder.py:1102-1114, 486-496)."""
    return decode_zq(params, cfg, codes_to_zq(params, cfg, codes))


def get_output_length(cfg: AEConfig, input_length: int) -> int:
    """Encoder frame count before quantizer downsample
    (reference: autoencoder.py:1046-1050)."""
    length = input_length
    for stride in cfg.encoder_rates:
        length = -(-length // stride)
    return length


def get_delay(cfg: AEConfig) -> int:
    """Analytic codec latency in samples (reference: autoencoder.py:1052-1068).

    Walks the conv stack in reverse accumulating receptive extent, exactly
    the reference's formula over (kernel, stride, dilation) triples."""
    import math as _math

    # (kind, k, s, d) in module order: encoder then decoder, as
    # nn.Module.modules() traverses them in the reference DAC
    layers = []

    def conv(k, s=1, d=1):
        layers.append(("conv", k, s, d))

    def tconv(k, s):
        layers.append(("tconv", k, s, 1))

    conv(7)  # encoder stem
    for stride in cfg.encoder_rates:
        for dil in (1, 3, 9):
            conv(7, 1, dil)
            conv(1)
        conv(2 * stride, stride)
    conv(3)  # encoder head
    # quantizer convs, in torch modules() registration order
    # (semantic VQ, residual VQs, downsample, upsample)
    conv(1)  # semantic in_proj
    conv(1)  # semantic out_proj
    for _ in range(cfg.n_codebooks):
        conv(1)
        conv(1)
    for f in cfg.downsample_factor:
        conv(f, f)
        conv(7)  # convnext dwconv
    for f in reversed(cfg.downsample_factor):
        tconv(f, f)
        conv(7)  # convnext dwconv
    conv(7)  # decoder stem
    for i, stride in enumerate(cfg.decoder_rates):
        tconv(2 * stride, stride)
        for dil in (1, 3, 9):
            conv(7, 1, dil)
            conv(1)
    conv(7)  # decoder head

    l_out = get_output_length(cfg, 0)
    L = l_out
    for kind, k, s, d in reversed(layers):
        if kind == "tconv":
            L = (L - d * (k - 1) - 1) / s + 1
        else:
            L = (L - 1) * s + d * (k - 1) + 1
        L = _math.ceil(L)
    return (L - l_out) // 2


def decode_zq(params: dict, cfg: AEConfig, z_q: jnp.ndarray) -> jnp.ndarray:
    """z_q (B, latent_dim, T) -> waveform (reference: autoencoder.py:1128-1132):
    post_module -> upsample -> decoder."""
    z = _q_transformer(params, cfg, "post_module", z_q)
    z = _upsample(params, cfg, z)
    return decoder_forward(params, cfg, z)


def decode_receptive_frames(cfg: AEConfig) -> int:
    """Left-context extent (in z_q frames) of the decode path: the
    post_module stacks q_n_layer causal window-limited attention layers, each
    adding up to (window-1) frames of reach — the STACK's receptive field is
    q_n_layer*(window-1), not one window (a window transformer is not a
    sliding-window truncation of the full context) — plus the conv tail
    (stem/ConvNeXt/res-unit dilations, < 64 frames mapped back to z_q rate)."""
    n_layers = cfg.q_n_layer
    win = cfg.q_window_size
    return n_layers * (win - 1) + 64


# jitted decode entry for the streaming paths: per-window shapes are constant
# in steady state so this compiles a handful of times, instead of dispatching
# the whole decoder op-by-op per chunk (slow through the axon relay)
decode_zq_jit = jax.jit(decode_zq, static_argnames=("cfg",))


def decode_zq_window(params: dict, cfg: AEConfig, z_q: jnp.ndarray,
                     start: int, end: int,
                     context_frames: Optional[int] = None) -> jnp.ndarray:
    """Decode frames [start, end) of z_q (B, D, T>=end) with enough left
    context to match the full decode exactly; returns (B, 1, (end-start)*
    frame_length). Shared by decode_zq_streaming and the serving stream."""
    if context_frames is None:
        context_frames = decode_receptive_frames(cfg)
    lo = max(0, start - context_frames)
    audio = decode_zq_jit(params, cfg, z_q[:, :, lo:end])
    return audio[:, :, -(end - start) * cfg.frame_length:]


# ---------------------------------------------------------------------------
# Stateful streaming decode (carried per-stage state)
# ---------------------------------------------------------------------------
#
# decode_zq_window re-decodes the full receptive field (~q_n_layer*(window-1)
# + conv-tail ≈ 1080 z_q frames) per chunk — ~17x redundant vocoder work per
# 64-frame chunk, the dominant streaming inefficiency. The stateful path
# instead carries:
#   * a sliding KV window (window-1 positions, per post_module layer) — the
#     transformer's entire reach, exact by causality (per-position activations
#     of a causal stack never change once computed);
#   * per-stage INPUT tails for every conv/ConvNeXt/tconv stage, each sized
#     to that stage's own receptive extent. Zero-initialized tails reproduce
#     each stage's causal left-pad bit-for-bit at the stream start, because a
#     single conv's pre-sequence contribution is exactly zeros;
#   * per-chain tails for the residual-unit chains (multi-conv stages):
#     [tail | chunk] is processed with rows-below-ctx re-zeroed after every
#     unit when the stream starts (each conv's OWN input is zero-padded in
#     the reference, autoencoder.py:285-289) and left live mid-stream —
#     the same first-tile trick the fused Pallas kernel already uses
#     (ops/pallas_conv.py:_res_chain_kernel).
# Each step's outputs equal the corresponding slice of the full decode; the
# per-chunk cost is O(chunk), not O(receptive field).


def _conv_stream_cl(x_cl, tail_cl, w, b, *, kernel_size: int, dilation: int = 1):
    """Stride-1 causal conv (channels-last) with a carried input tail of
    (k-1)*dilation rows. Processes [tail | x] with the standard internal
    left-pad and crops — the crop absorbs the pad, kept rows are exact."""
    ctx = (kernel_size - 1) * dilation
    xw = jnp.concatenate([tail_cl, x_cl], axis=1)
    y = _causal_conv_shifted_cl(xw, w, b, kernel_size=kernel_size,
                                dilation=dilation)
    return y[:, ctx:], xw[:, -ctx:]


def _tconv_stream_cl(x_cl, tail_cl, w, b, *, kernel_size: int, stride: int):
    """Causal transposed conv (channels-last) with a carried input tail of
    ceil(k/s)-1 frames. Output rows [j*s, (j+1)*s) depend only on inputs
    {j - m, ..., j} (m = ceil(k/s) - 1), so the window covers them exactly;
    a zero tail contributes exact zeros (tconv taps are linear, bias is
    per-output), matching the absent pre-sequence inputs."""
    m = -(-kernel_size // stride)
    ctx = m - 1
    if ctx == 0:
        return (_causal_tconv_phase_cl(x_cl, w, b, kernel_size=kernel_size,
                                       stride=stride), tail_cl)
    xw = jnp.concatenate([tail_cl, x_cl], axis=1)
    y = _causal_tconv_phase_cl(xw, w, b, kernel_size=kernel_size, stride=stride)
    return y[:, ctx * stride:], xw[:, -ctx:]


def _res_chain_stream_cl(x_cl, tail_cl, units, dilations, pad_rows):
    """Residual-unit chain with a carried chain-input tail (ctx =
    ops.pallas_conv.chain_ctx rows). pad_rows (traced int32): how many
    LEADING tail rows still stand for the pre-sequence causal pad — they are
    re-zeroed after every unit (unit outputs are nonzero on zero input —
    biases — but the reference zero-pads each conv's OWN input). This is
    clamp(ctx - rows_consumed, 0, ctx), NOT a seq-start boolean: when early
    chunks are shorter than ctx, part of the tail remains pad for several
    chunks (a seq-start-only re-zero corrupted the second chunk of short
    streams — caught by the perturbed-bias tests)."""
    from echo_tts_tpu.ops.pallas_conv import res_units_cl

    ctx = tail_cl.shape[1]
    xw = jnp.concatenate([tail_cl, x_cl], axis=1)
    # scalar or (B,) per-row (continuous batching: rows at different stream
    # positions have different residual pad extents)
    pr = jnp.broadcast_to(jnp.asarray(pad_rows, jnp.int32).reshape(-1),
                          (xw.shape[0],))
    impl = _pick_conv_impl()
    if impl in ("pallas", "pallas_interpret"):
        y = res_units_cl(xw, units, dilations,
                         interpret=(impl == "pallas_interpret"),
                         zero_below=pr)
    else:
        y = xw
        dead = (jnp.arange(xw.shape[1])[None, :, None] < pr[:, None, None])
        for u, d in zip(units, dilations):
            y = _residual_unit_cl(y, u, dilation=d)
            y = jnp.where(dead, jnp.zeros_like(y), y)
    return y[:, ctx:], xw[:, -ctx:]


def _window_transformer_stream(x, p: dict, kv, pos0, *, n_head: int,
                               head_dim: int, window: int,
                               norm_eps: float = 1e-5,
                               max_positions: int = 1024):
    """Streaming WindowLimitedTransformer step (channels-first x (B, C, S) at
    absolute frame offset pos0). kv: per layer {"k","v"} (B, window-1, H, Dh)
    holding the previous window-1 positions (zeros before the sequence start,
    inert via position masking). Returns (y (B, C, S), new_kv).

    Exact vs the full window_transformer: queries see exactly the same
    positions (the window reaches window-1 back), softmax over the masked
    extras adds exact zeros, RoPE uses absolute positions from the shared
    bf16-quantized tables.

    pos0: scalar int32, or (B,) per-row offsets (continuous batching — each
    row of the device batch is its own stream at its own position)."""
    x = x.transpose(0, 2, 1)  # (B, S, C)
    b, s, d = x.shape
    n_cache = window - 1
    per_row = jnp.ndim(pos0) == 1
    pos0 = jnp.asarray(pos0, jnp.int32)
    cos_full, sin_full = _ae_rope_tables(max_positions, head_dim)
    # kv slot j holds absolute position pos0 - n_cache + j; query i is at
    # pos0 + i. Causal+window: j in [i, i + n_cache]; validity: abs >= 0.
    i = jnp.arange(s)[:, None]
    j = jnp.arange(n_cache + s)[None, :]
    if per_row:
        idx = pos0[:, None] + jnp.arange(s)[None, :]           # (B, s)
        cos = jnp.take(cos_full, idx, axis=0)                  # (B, s, D/2)
        sin = jnp.take(sin_full, idx, axis=0)
        mask = ((j >= i) & (j <= i + n_cache))[None] \
            & (j[None] >= n_cache - pos0[:, None, None])       # (B, s, t)
    else:
        cos = jax.lax.dynamic_slice_in_dim(cos_full, pos0, s, axis=0)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, pos0, s, axis=0)
        mask = jnp.broadcast_to(
            (j >= i) & (j <= i + n_cache) & (j >= n_cache - pos0),
            (b, s, n_cache + s))

    new_kv = []
    for layer, lkv in zip(p["layers"], kv):
        h = _ae_rms_norm(x, layer["attention_norm"]["w"], norm_eps)
        qkv = h @ layer["attention"]["wqkv"]["w"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _ae_apply_rope(q.reshape(b, s, n_head, head_dim), cos, sin)
        k = _ae_apply_rope(k.reshape(b, s, n_head, head_dim), cos, sin)
        v = v.reshape(b, s, n_head, head_dim)
        kc = jnp.concatenate([lkv["k"], k.astype(lkv["k"].dtype)], axis=1)
        vc = jnp.concatenate([lkv["v"], v.astype(lkv["v"].dtype)], axis=1)
        new_kv.append({"k": kc[:, -n_cache:], "v": vc[:, -n_cache:]})
        scale = 1.0 / jnp.sqrt(jnp.float32(head_dim))
        logits = jnp.einsum("bshd,bthd->bhst", q, kc.astype(q.dtype),
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mask[:, None], logits, jnp.float32(-1e30))
        w_ = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhst,bthd->bshd", w_, vc.astype(v.dtype),
                       preferred_element_type=jnp.float32).astype(v.dtype)
        o = o.reshape(b, s, n_head * head_dim) @ layer["attention"]["wo"]["w"]
        x = x + layer["attention_layer_scale"] * o

        h = _ae_rms_norm(x, layer["ffn_norm"]["w"], norm_eps)
        ff = layer["feed_forward"]
        h = (jax.nn.silu(h @ ff["w1"]["w"]) * (h @ ff["w3"]["w"])) @ ff["w2"]["w"]
        x = x + layer["ffn_layer_scale"] * h

    x = _ae_rms_norm(x, p["norm"]["w"], norm_eps)
    return x.transpose(0, 2, 1), new_kv


def streaming_decode_init(params: dict, cfg: AEConfig, batch: int,
                          dtype=None, per_row_pos: bool = False) -> dict:
    """Zero state for decode_zq_stream_step. dtype defaults to the AE params'
    dtype (the computation dtype of every carried activation).

    per_row_pos: store the stream position as a (B,) vector — the
    continuous-batching state form, where each row of the device batch is an
    independent stream at its own position (decode_zq_stream_step handles
    both forms)."""
    from echo_tts_tpu.ops.pallas_conv import chain_ctx

    if dtype is None:
        dtype = jax.tree_util.tree_leaves(params)[0].dtype

    def z(*shape):
        return jnp.zeros(shape, dtype)

    n_cache = cfg.q_window_size - 1
    kv = [{"k": z(batch, n_cache, cfg.q_n_head, cfg.q_head_dim),
           "v": z(batch, n_cache, cfg.q_n_head, cfg.q_head_dim)}
          for _ in range(cfg.q_n_layer)]
    up = [z(batch, cfg.latent_dim, 6) for _ in cfg.downsample_factor]
    blocks = []
    ch = cfg.decoder_dim
    for i, _stride in enumerate(cfg.decoder_rates):
        out_ch = params["decoder"]["blocks"][i]["up"]["w"].shape[1]
        blocks.append({"tconv": z(batch, 1, ch),
                       "chain": z(batch, chain_ctx((1, 3, 9), 7), out_ch)})
        ch = out_ch
    return {
        "pos": jnp.zeros((batch,) if per_row_pos else (), jnp.int32),
        "kv": kv,
        "up": up,                               # ConvNeXt dw-conv tails (NCH)
        "stem": z(batch, 6, cfg.latent_dim),    # channels-last tails below
        "blocks": blocks,
        "head": z(batch, 6, ch),
    }


def decode_zq_stream_step(params: dict, cfg: AEConfig, state: dict,
                          z_chunk: jnp.ndarray,
                          max_positions: int = 1024):
    """One streaming decode step: z_chunk (B, D, S) holds z_q frames
    [state.pos, state.pos + S). Returns (audio (B, 1, S*frame_length),
    new_state). Chunk outputs equal the same slice of the full decode_zq
    (tests/test_streaming_decode.py); per-step cost is O(S). Jit with static
    (cfg, max_positions) and donate the state (decode_zq_stream_step_jit)."""
    pos = state["pos"]

    y, kv = _window_transformer_stream(
        z_chunk, params["quantizer"]["post_module"], state["kv"], pos,
        n_head=cfg.q_n_head, head_dim=cfg.q_head_dim,
        window=cfg.q_window_size, norm_eps=cfg.norm_eps,
        max_positions=max_positions)

    up_tails = []
    for i, factor in enumerate(reversed(cfg.downsample_factor)):
        st = params["quantizer"]["upsample"][i]
        y = causal_tconv(y, st["conv"], kernel_size=factor, stride=factor)
        # upsample tconv has k == s (no cross-chunk reach); the ConvNeXt
        # depthwise k=7 conv carries a 6-frame input tail
        yw = jnp.concatenate([state["up"][i], y], axis=-1)
        up_tails.append(yw[..., -6:])
        y = convnext_block(yw, st["convnext"])[..., 6:]

    dec = params["decoder"]
    x = y.transpose(0, 2, 1)  # channels-last through the decoder
    x, stem_tail = _conv_stream_cl(x, state["stem"], dec["stem"]["w"],
                                   dec["stem"].get("b"), kernel_size=7)
    up_rate = 1
    for f in cfg.downsample_factor:
        up_rate *= f
    block_tails = []
    rate = up_rate
    for i, stride in enumerate(cfg.decoder_rates):
        blk = dec["blocks"][i]
        rate *= stride  # chain i runs at rate z_q-frames * rate rows
        x = _snake_cl(x, blk["snake"].reshape(-1))
        x, t_tail = _tconv_stream_cl(x, state["blocks"][i]["tconv"],
                                     blk["up"]["w"], blk["up"].get("b"),
                                     kernel_size=2 * stride, stride=stride)
        ctx_i = state["blocks"][i]["chain"].shape[1]
        pad_rows = jnp.clip(ctx_i - pos * rate, 0, ctx_i).astype(jnp.int32)
        x, c_tail = _res_chain_stream_cl(x, state["blocks"][i]["chain"],
                                         blk["res_units"], (1, 3, 9), pad_rows)
        block_tails.append({"tconv": t_tail, "chain": c_tail})
    x = _snake_cl(x, dec["head_snake"].reshape(-1))
    x, head_tail = _conv_stream_cl(x, state["head"], dec["head"]["w"],
                                   dec["head"].get("b"), kernel_size=7)
    audio = jnp.tanh(x).transpose(0, 2, 1)

    new_state = {"pos": pos + z_chunk.shape[-1], "kv": kv, "up": up_tails,
                 "stem": stem_tail, "blocks": block_tails, "head": head_tail}
    return audio, new_state


decode_zq_stream_step_jit = jax.jit(
    decode_zq_stream_step, static_argnames=("cfg", "max_positions"),
    donate_argnums=(2,))


def decode_zq_streaming_stateful(params: dict, cfg: AEConfig,
                                 z_q: jnp.ndarray, chunk_frames: int = 64,
                                 max_positions: Optional[int] = None):
    """Streamed causal decode with carried state: yields waveform chunks
    (B, 1, <=chunk_frames*frame_length) matching the full decode. Unlike
    decode_zq_streaming (receptive-field re-decode), each chunk costs
    O(chunk). The final partial chunk is zero-padded on the right for compile
    stability (padding is future context — causality keeps the kept samples
    exact) and cropped."""
    b, d, t = z_q.shape
    if max_positions is None:
        max_positions = max(1024, t)
    state = streaming_decode_init(params, cfg, b, dtype=z_q.dtype)
    spl = cfg.frame_length
    for start in range(0, t, chunk_frames):
        n = min(chunk_frames, t - start)
        chunk = z_q[:, :, start:start + n]
        if n < chunk_frames:
            chunk = jnp.pad(chunk, ((0, 0), (0, 0), (0, chunk_frames - n)))
        audio, state = decode_zq_stream_step_jit(params, cfg, state, chunk,
                                                 max_positions)
        yield audio[:, :, : n * spl]


def decode_zq_streaming(params: dict, cfg: AEConfig, z_q: jnp.ndarray,
                        chunk_frames: int = 64,
                        context_frames: Optional[int] = None):
    """Streamed causal decode: yields waveform chunks as z_q frames arrive.

    The whole decode path is causal (reference: autoencoder.py:1187
    causal=True; README:122-124 cites streaming as the purpose), so a chunk's
    samples depend only on LEFT context. Each chunk is decoded from a window
    [start-context, start+chunk) and the last chunk*frame_length samples are
    emitted — identical to the full decode when `context_frames` covers the
    receptive field (default: `decode_receptive_frames`, the stacked
    post-transformer reach q_n_layer*(q_window_size-1) + conv tail; verified
    vs full decode in tests).

    After the first ~context/chunk chunks the window size is constant, so one
    compiled executable serves the steady state (a handful of smaller shapes
    compile during ramp-up; left-padding with zero FRAMES instead would not
    be exact — zero frames still attend/convolve, unlike each causal layer's
    internal left-pad). This is the blockwise/continuation streaming path
    (BASELINE config 4).
    """
    b, d, t = z_q.shape
    for start in range(0, t, chunk_frames):
        end = min(start + chunk_frames, t)
        yield decode_zq_window(params, cfg, z_q, start, end, context_frames)
