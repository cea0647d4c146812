"""Random initialization of an S1-DAC parameter pytree (converter-compatible
structure) for benchmarks and tests without checkpoint access. Magnitudes
follow the reference's trunc-normal(0.02)/zeros scheme
(reference: autoencoder.py:444-449, 829-832)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from echo_tts_tpu.core.config import AEConfig


class _K:
    def __init__(self, key):
        self.key = key

    def __call__(self):
        self.key, sub = jax.random.split(self.key)
        return sub


def _conv(k, out_ch, in_ch, ks, dtype, bias=True):
    p = {"w": (0.02 * jax.random.truncated_normal(
        k(), -2, 2, (out_ch, in_ch, ks))).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype)
    return p


def _tconv(k, in_ch, out_ch, ks, dtype):
    return {"w": (0.02 * jax.random.truncated_normal(
        k(), -2, 2, (in_ch, out_ch, ks))).astype(dtype),
        "b": jnp.zeros((out_ch,), dtype)}


def _snake(ch, dtype):
    return jnp.ones((1, ch, 1), dtype)


def _ru(k, ch, dtype):
    return {"snake1": _snake(ch, dtype), "conv1": _conv(k, ch, ch, 7, dtype),
            "snake2": _snake(ch, dtype), "conv2": _conv(k, ch, ch, 1, dtype)}


def _convnext(k, ch, dtype):
    return {
        "dwconv": _conv(k, ch, 1, 7, dtype),  # depthwise: (C, 1, 7)
        "norm": {"w": jnp.ones((ch,), dtype), "b": jnp.zeros((ch,), dtype)},
        "pwconv1": {"w": (0.02 * jax.random.truncated_normal(
            k(), -2, 2, (ch, 4 * ch))).astype(dtype),
            "b": jnp.zeros((4 * ch,), dtype)},
        "pwconv2": {"w": (0.02 * jax.random.truncated_normal(
            k(), -2, 2, (4 * ch, ch))).astype(dtype),
            "b": jnp.zeros((ch,), dtype)},
        "gamma": jnp.full((ch,), 1e-6, dtype),
    }


def _lin(k, d_in, d_out, dtype):
    return {"w": (0.02 * jax.random.truncated_normal(
        k(), -2, 2, (d_in, d_out))).astype(dtype)}


def _transformer(k, n_layers, dim, ffn, dtype):
    layers = []
    for _ in range(n_layers):
        layers.append({
            "attention": {"wqkv": _lin(k, dim, 3 * dim, dtype),
                          "wo": _lin(k, dim, dim, dtype)},
            "feed_forward": {"w1": _lin(k, dim, ffn, dtype),
                             "w3": _lin(k, dim, ffn, dtype),
                             "w2": _lin(k, ffn, dim, dtype)},
            "attention_norm": {"w": jnp.ones((dim,), dtype)},
            "ffn_norm": {"w": jnp.ones((dim,), dtype)},
            "attention_layer_scale": jnp.full((dim,), 1e-2, dtype),
            "ffn_layer_scale": jnp.full((dim,), 1e-2, dtype),
        })
    return {"layers": layers, "norm": {"w": jnp.ones((dim,), dtype)}}


def _vq(k, input_dim, codebook_size, codebook_dim, dtype):
    return {
        "in_proj": _conv(k, codebook_dim, input_dim, 1, dtype),
        "out_proj": _conv(k, input_dim, codebook_dim, 1, dtype),
        "codebook": jax.random.normal(k(), (codebook_size, codebook_dim)).astype(dtype),
    }


def init_ae_params(key, cfg: AEConfig, dtype=jnp.float32) -> dict:
    k = _K(key)
    d = cfg.latent_dim

    enc_blocks = []
    dim = cfg.encoder_dim
    for i, stride in enumerate(cfg.encoder_rates):
        dim *= 2
        blk = {
            "res_units": [_ru(k, dim // 2, dtype) for _ in range(3)],
            "snake": _snake(dim // 2, dtype),
            "down": _conv(k, dim, dim // 2, 2 * stride, dtype),
        }
        n_t = cfg.encoder_transformer_layers[i]
        if n_t > 0:
            blk["transformer"] = _transformer(k, n_t, dim, dim * 3, dtype)
        enc_blocks.append(blk)

    dec_blocks = []
    ch = cfg.decoder_dim
    for i, stride in enumerate(cfg.decoder_rates):
        in_ch, out_ch = ch // (2 ** i), ch // (2 ** (i + 1))
        dec_blocks.append({
            "snake": _snake(in_ch, dtype),
            "up": _tconv(k, in_ch, out_ch, 2 * stride, dtype),
            "res_units": [_ru(k, out_ch, dtype) for _ in range(3)],
        })
    out_ch = cfg.decoder_dim // (2 ** len(cfg.decoder_rates))

    return {
        "encoder": {
            "stem": _conv(k, cfg.encoder_dim, 1, 7, dtype),
            "blocks": enc_blocks,
            "head_snake": _snake(dim, dtype),
            "head": _conv(k, d, dim, 3, dtype),
        },
        "decoder": {
            "stem": _conv(k, cfg.decoder_dim, d, 7, dtype),
            "blocks": dec_blocks,
            "head_snake": _snake(out_ch, dtype),
            "head": _conv(k, 1, out_ch, 7, dtype),
        },
        "quantizer": {
            "semantic": [_vq(k, d, cfg.semantic_codebook_size, cfg.codebook_dim, dtype)],
            "residual": [_vq(k, d, cfg.codebook_size, cfg.codebook_dim, dtype)
                         for _ in range(cfg.n_codebooks)],
            "downsample": [{"conv": _conv(k, d, d, f, dtype),
                            "convnext": _convnext(k, d, dtype)}
                           for f in cfg.downsample_factor],
            "upsample": [{"conv": _tconv(k, d, d, f, dtype),
                          "convnext": _convnext(k, d, dtype)}
                         for f in cfg.downsample_factor],
            "pre_module": _transformer(k, cfg.q_n_layer, cfg.q_dim,
                                       cfg.q_intermediate_size, dtype),
            "post_module": _transformer(k, cfg.q_n_layer, cfg.q_dim,
                                        cfg.q_intermediate_size, dtype),
        },
    }
