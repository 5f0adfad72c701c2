"""Symmetric int8 quantization for the decode hot path.

Two independent uses, both exploiting the same exactness property — a scale
that is constant over a dot's contraction dimension folds out of the dot:

* **KV cache** (``quantize_kv``): K/V rows are quantized per
  ``(layer, batch, head, position)`` — the scale is constant over the head
  dim ``D``, so attention computes ``(q . k_int8) * k_scale`` for scores and
  ``(probs * v_scale) . v_int8`` for outputs.  The int8->bf16 convert fuses
  into the dot; HBM attention traffic halves vs bf16 with zero extra
  materialization.  (The reference keeps fp16/fp32 torch KV caches —
  ``modeling_parler_tts.py`` has no quantization at all; this is TPU headroom
  the torch stack leaves on the table.)

* **Weights** (``quantize_dense``): per-output-channel scales over the input
  (contraction) dim, ``y = (x @ w_int8) * scale[out]``.  Decode at small
  batch is weight-streaming-bound (~770 MB of bf16 decoder weights per step
  on Mini), so int8 storage directly halves step latency's dominant term.

Both are *storage* formats: the MXU/VPU math runs in the compute dtype.
"""

from __future__ import annotations

import jax.numpy as jnp

INT8_MAX = 127.0


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize KV rows per-position: ``x (..., T, D)`` -> ``(q (..., T, D)
    int8, scale (..., T) f32)`` with ``x ~= q * scale[..., None]``."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # (..., T)
    scale = jnp.maximum(amax, 1e-8) / INT8_MAX
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -INT8_MAX, INT8_MAX
    ).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Reference-exactness helper (tests / non-folded paths)."""
    return (q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)).astype(dtype)


def quantize_dense(kernel: jnp.ndarray) -> dict:
    """Per-output-channel weight quantization: ``kernel (..., In, Out)`` ->
    ``{"kernel_q": int8 same shape, "scale": (..., Out) f32}`` with
    ``kernel ~= kernel_q * scale[..., None, :]``.  Leading axes (e.g. the
    stacked-layer ``L`` or codebook ``K``) each get their own scales."""
    amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=-2)  # (..., Out)
    scale = jnp.maximum(amax, 1e-8) / INT8_MAX
    q = jnp.clip(
        jnp.round(kernel.astype(jnp.float32) / scale[..., None, :]), -INT8_MAX, INT8_MAX
    ).astype(jnp.int8)
    return {"kernel_q": q, "scale": scale}


def quantize_lm_heads(kernel: jnp.ndarray) -> dict:
    """Fused LM heads ``(K, H, V)`` -> int8 + per-(codebook, vocab) scales;
    consumed by ``models.decoder.logits``."""
    return quantize_dense(kernel)  # amax over H (axis -2) -> scale (K, V)
