"""Shared neural-net ops for the TPU-native Parler-TTS framework.

Pure-functional building blocks over parameter pytrees (nested dicts of
``jnp.ndarray``).  Layout conventions (chosen for TPU/MXU, NOT torch's):

* dense kernels are ``(in_features, out_features)`` — activations stay
  ``(..., features)`` and matmuls map directly onto the MXU;
* embeddings are ``(vocab, features)``;
* 1-D convs operate on ``(batch, time, channels)`` (NWC) with kernels
  ``(width, in_channels, out_channels)`` (WIO).

The torch importer (`parler_tts_tpu.core.torch_import`) transposes from
torch layouts.  Computation dtype is controlled by the caller: params are
kept fp32 and cast at use via :func:`astype_tree` or per-op ``dtype=``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """fp32 params / bf16 compute is the TPU sweet spot (MXU native bf16)."""

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16

    def cast(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.astype(self.compute_dtype)


FP32 = DTypePolicy(jnp.float32, jnp.float32)
BF16 = DTypePolicy(jnp.float32, jnp.bfloat16)


def dropout(key: jnp.ndarray | None, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout (torch ``nn.functional.dropout`` semantics, as used
    throughout the reference decoder — ``modeling_parler_tts.py:363, 459-491,
    888``).  ``rate`` is a static Python float; ``key is None`` or rate 0
    is the identity (eval mode compiles dropout away entirely)."""
    if key is None or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


def _precision(x: jnp.ndarray):
    """fp32 activations get exact matmuls (XLA's default is fast-math and
    loses ~3 decimal digits, breaking the allclose quality gate); bf16 paths
    keep the fast default — bf16 is already the MXU-native precision."""
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def dense(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ kernel (+ bias).  kernel: (in, out).

    Transparently accepts int8 weight-only kernels (``kernel_q`` + per-output
    ``scale``, see ``ops/quantization.quantize_dense``): the scale is constant
    over the contraction dim so ``(x @ w_int8) * scale`` is exact, and the
    int8->compute convert fuses into the matmul's operand load — only int8
    bytes stream from HBM (the dominant cost of small-batch decode)."""
    if "kernel_q" in params:
        y = jnp.dot(
            x,
            params["kernel_q"].astype(x.dtype),
            preferred_element_type=x.dtype,
            precision=_precision(x),
        ) * params["scale"].astype(x.dtype)
    else:
        y = jnp.dot(
            x,
            params["kernel"].astype(x.dtype),
            preferred_element_type=x.dtype,
            precision=_precision(x),
        )
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def embed(params: Params, ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Token embedding lookup.  table: (vocab, dim).  ``dtype`` casts the
    table BEFORE the gather (this TPU stack miscompiles fused
    gather->convert; see models/decoder.embed_codebooks)."""
    table = params["embedding"]
    if dtype is not None:
        table = table.astype(dtype)
    return jnp.take(table, ids, axis=0)


def layer_norm(params: Params, x: jnp.ndarray, *, eps: float = 1e-5) -> jnp.ndarray:
    """Standard LayerNorm with scale+bias (torch ``nn.LayerNorm`` semantics,
    used by the decoder — reference ``modeling_parler_tts.py:403-413``).
    Statistics in fp32 for bf16 stability."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(params: Params, x: jnp.ndarray, *, eps: float = 1e-6) -> jnp.ndarray:
    """T5-style RMSNorm: no mean subtraction, no bias (HF ``T5LayerNorm``)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * lax.rsqrt(var + eps)
    return (y * params["scale"].astype(jnp.float32)).astype(dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch ``nn.functional.gelu`` default, used by the
    decoder's ACT2FN['gelu'] (reference ``modeling_parler_tts.py:399``)."""
    return jax.nn.gelu(x, approximate=False)


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximated GELU (HF ACT2FN['gelu_new'], flan-T5's FFN act)."""
    x32 = x.astype(jnp.float32)
    y = 0.5 * x32 * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x32 + 0.044715 * jnp.power(x32, 3.0)))
    )
    return y.astype(x.dtype)


ACTIVATIONS = {
    "gelu": gelu,
    "gelu_new": gelu_new,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, T, H*D) -> (B, num_heads, T, D)"""
    b, t, _ = x.shape
    return x.reshape(b, t, num_heads, -1).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, D) -> (B, T, H*D)"""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


NEG_INF = -1e9  # large-negative additive mask (finite: avoids NaN softmax rows)


def attention_scores(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Plain softmax attention over (B, H, T, D) tensors.

    ``bias`` is added to the logits (T5 relative-position bias); ``mask`` is a
    boolean array broadcastable to (B, H, Tq, Tk), True = attend.  Softmax in
    fp32.  Scaling is the caller's responsibility (T5 doesn't scale; the
    decoder scales q by head_dim**-0.5 — reference ``modeling_parler_tts.py:252``).
    """
    dtype = q.dtype
    prec = _precision(q)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32, precision=prec)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=dtype, precision=prec)


def make_causal_mask(t: int, dtype=jnp.bool_) -> jnp.ndarray:
    """(1, 1, T, T) lower-triangular True-=-attend mask."""
    return jnp.tril(jnp.ones((t, t), dtype=dtype))[None, None]


def normal_init(key, shape, std: float, dtype=jnp.float32) -> jnp.ndarray:
    return std * jax.random.normal(key, shape, dtype)


def astype_tree(tree, dtype):
    return jax.tree.map(lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))
