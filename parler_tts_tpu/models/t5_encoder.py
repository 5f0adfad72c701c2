"""Flan-T5 text encoder, TPU-native.

The reference consumes any HF ``AutoModelForTextEncoding`` (in practice
``google/flan-t5-base``) as a frozen description encoder
(``/root/reference/parler_tts/modeling_parler_tts.py:1595-1598``;
``training/README.md:85``).  This is a from-scratch JAX implementation of the
T5 encoder stack: relative-position-bucket attention bias, RMSNorm, gated
FFN, no absolute positions, no q-scaling (folded into init per the T5 paper).

Functional API: ``init(key, cfg) -> params``; ``encode(params, cfg, ids,
mask) -> (B, T, d_model)``.  Golden-tested allclose against HF torch
``T5EncoderModel`` (tests/test_t5_encoder.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from parler_tts_tpu.core.config import T5EncoderConfig
from parler_tts_tpu.ops.nn import (
    ACTIVATIONS,
    Params,
    attention_scores,
    dense,
    embed,
    merge_heads,
    normal_init,
    rms_norm,
    split_heads,
)


def relative_position_bucket(
    relative_position: jnp.ndarray,
    *,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """Bidirectional T5 bucket function (HF ``T5Attention._relative_position_bucket``)."""
    num_buckets //= 2
    ret = jnp.where(relative_position > 0, num_buckets, 0)
    n = jnp.abs(relative_position)

    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def compute_position_bias(params: Params, cfg: T5EncoderConfig, q_len: int, k_len: int) -> jnp.ndarray:
    """(1, heads, q_len, k_len) additive attention bias from the shared
    relative-attention embedding (lives in layer 0, shared by all layers)."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance,
    )
    bias = jnp.take(params["rel_attn_bias"]["embedding"], buckets, axis=0)  # (q,k,heads)
    return bias.transpose(2, 0, 1)[None]


def _attn(params: Params, cfg: T5EncoderConfig, x: jnp.ndarray, bias: jnp.ndarray, mask) -> jnp.ndarray:
    q = split_heads(dense(params["q"], x), cfg.num_heads)
    k = split_heads(dense(params["k"], x), cfg.num_heads)
    v = split_heads(dense(params["v"], x), cfg.num_heads)
    # T5 does not scale q — scaling is folded into initialization.
    out = attention_scores(q, k, v, bias=bias, mask=mask)
    return dense(params["o"], merge_heads(out))


def _ffn(params: Params, cfg: T5EncoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    act = ACTIVATIONS[cfg.dense_act_fn]
    if cfg.is_gated_act:
        h = act(dense(params["wi_0"], x)) * dense(params["wi_1"], x)
    else:
        h = act(dense(params["wi"], x))
    return dense(params["wo"], h)


def encode(
    params: Params,
    cfg: T5EncoderConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
    *,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Run the encoder. input_ids (B, T) int; attention_mask (B, T) {0,1}.
    Returns last_hidden_state (B, T, d_model), final-layernormed."""
    b, t = input_ids.shape
    x = embed(params["token_embed"], input_ids, dtype=dtype)

    bias = compute_position_bias(params, cfg, t, t).astype(dtype)
    mask = None
    if attention_mask is not None:
        mask = attention_mask[:, None, None, :].astype(bool)  # (B,1,1,Tk)

    for layer in params["layers"]:
        h = rms_norm(layer["ln_attn"], x, eps=cfg.layer_norm_epsilon)
        x = x + _attn(layer["attn"], cfg, h, bias, mask)
        h = rms_norm(layer["ln_ffn"], x, eps=cfg.layer_norm_epsilon)
        x = x + _ffn(layer["ffn"], cfg, h)

    return rms_norm(params["final_ln"], x, eps=cfg.layer_norm_epsilon)


def init(key, cfg: T5EncoderConfig, factor: float = 1.0) -> Params:
    """Random init following HF T5's fan-in-scaled normals."""
    keys = jax.random.split(key, 4 + cfg.num_layers)
    d, dkv, dff, h = cfg.d_model, cfg.d_kv, cfg.d_ff, cfg.num_heads
    inner = h * dkv

    def lin(k, nin, nout, std):
        return {"kernel": normal_init(k, (nin, nout), std)}

    layers = []
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[4 + i], 8)
        layers.append(
            {
                "attn": {
                    "q": lin(lk[0], d, inner, factor * (d * dkv) ** -0.5),
                    "k": lin(lk[1], d, inner, factor * d**-0.5),
                    "v": lin(lk[2], d, inner, factor * d**-0.5),
                    "o": lin(lk[3], inner, d, factor * inner**-0.5),
                },
                "ln_attn": {"scale": jnp.ones((d,))},
                "ffn": {
                    "wi_0": lin(lk[4], d, dff, factor * d**-0.5),
                    "wi_1": lin(lk[5], d, dff, factor * d**-0.5),
                    "wo": lin(lk[6], dff, d, factor * dff**-0.5),
                },
                "ln_ffn": {"scale": jnp.ones((d,))},
            }
        )
    return {
        "token_embed": {"embedding": normal_init(keys[0], (cfg.vocab_size, d), factor)},
        "rel_attn_bias": {
            "embedding": normal_init(keys[1], (cfg.relative_attention_num_buckets, h), factor * (d * dkv) ** -0.5)
        },
        "layers": layers,
        "final_ln": {"scale": jnp.ones((d,))},
    }
