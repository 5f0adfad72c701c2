"""Pallas TPU kernel: single-query cached attention for the decode loop.

The XLA fallback attends over the FULL static KV buffer every step
(``models/decoder.py`` masks invalid positions but still streams them from
HBM).  At 30 s utterances the cache is (24L, B, 16H, ~2600, 64) — reading the
dead tail dominates HBM traffic early in generation.  This kernel uses
scalar-prefetched ``length`` so the block index_map *clamps* out-of-range
blocks to the last valid one — Mosaic skips the DMA when the block index
repeats, so only ``ceil(length/block_k)`` KV blocks are ever fetched.

Grid layout (v2): ``(batch, kv_blocks)`` with ALL heads folded into each
program's block — one program streams a ``(H, block_k, D)`` KV tile and
computes ``H`` head-batched dots on it.  Round 1's ``(batch*heads, kv_blocks)``
grid ran 16× more programs doing (1, D)-sized work each and lost to XLA on
grid overhead (13.7 vs 5.6 ms/step at batch 32); folding heads puts
``16×`` more bytes and FLOPs behind each grid step.

Prompt left-padding is expressed as a per-row ``start`` index (first valid
KV position) instead of a dense mask: padding in this framework is always a
contiguous left prefix (reference left-pads prompts,
``training/run_parler_tts_training.py:910-917``), and a scalar start avoids
mask operands that violate TPU (8, 128) tiling.

Semantics match ``ops/nn.attention_scores`` for a single query position:
out = softmax(q·K^T * scale + mask) · V, fp32 accumulation, finite
``NEG_INF`` masking.  (Degenerate fully-masked rows — impossible in decode
self-attention, where the current position is always valid — give uniform
attention over the valid-length prefix.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(len_ref, start_ref, q_ref, k_ref, v_ref, kn_ref, vn_ref, ks_ref,
            vs_ref, o_ref, acc_ref, m_ref, l_ref, *, block_k: int, scale: float,
            t_total: int, include_self: bool, quantized: bool):
    b, j = pl.program_id(0), pl.program_id(1)
    limit = pl.cdiv(len_ref[0], block_k)  # valid kv blocks

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(j < limit)
    def _():
        q = q_ref[0].astype(jnp.float32)  # (H, D)
        k = k_ref[0].astype(jnp.float32)  # (H, bk, D)
        # head-batched q·K^T as a VPU multiply-reduce (Mosaic's dot_general
        # does not lower batch dimensions): (H, 1, D) * (H, bk, D) -> (H, bk)
        s = jnp.sum(q[:, None, :] * k, axis=-1) * scale
        if quantized:
            # int8 cache: per-position scale is constant over D, so it folds
            # out of the dot — dequantize the *scores*, not the K tile
            s = s * ks_ref[0]  # (H, bk)
        kv_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        valid = (kv_pos < len_ref[0]) & (kv_pos >= start_ref[b])  # (1, bk)
        s = jnp.where(valid, s, NEG_INF)  # broadcast over H

        m_prev = m_ref[...]  # (H, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)  # (H, bk); explicit 0:
        # OOB-padded V rows may hold NaN and 0*NaN would poison the dot
        l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=1, keepdims=True)
        # zero OOB rows of the ragged tail block: memory there may be NaN
        row_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k, 1), 1)
        v = jnp.where(row_pos < t_total, v_ref[0].astype(jnp.float32), 0.0)  # (H, bk, D)
        # head-batched p·V as a VPU multiply-reduce: (H, bk, 1) * (H, bk, D)
        # summed over bk -> (H, D).  For int8 V the per-position scale folds
        # into p for the PV product only (NOT into l — l is the softmax mass)
        pv_p = p * vs_ref[0] if quantized else p
        pv = jnp.sum(pv_p[:, :, None] * v, axis=1)
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        if include_self:
            # merge the current token's own K/V (not yet in the cache — the
            # caller batches cache writes) as a final attention column
            q = q_ref[0].astype(jnp.float32)  # (H, D)
            kn = kn_ref[0].astype(jnp.float32)  # (H, D)
            s_self = jnp.sum(q * kn, axis=1, keepdims=True) * scale  # (H, 1)
            m_prev = m_ref[...]
            m_new = jnp.maximum(m_prev, s_self)
            corr = jnp.exp(m_prev - m_new)
            p_self = jnp.exp(s_self - m_new)
            l = l_ref[...] * corr + p_self
            acc = acc_ref[...] * corr + p_self * vn_ref[0].astype(jnp.float32)
        else:
            l = l_ref[...]
            acc = acc_ref[...]
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_k", "interpret"))
def decode_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    length: jnp.ndarray,
    start: jnp.ndarray | None = None,
    *,
    k_new: jnp.ndarray | None = None,
    v_new: jnp.ndarray | None = None,
    k_scale: jnp.ndarray | None = None,
    v_scale: jnp.ndarray | None = None,
    scale: float = 1.0,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """q: (B, H, D) single query per (row, head); k/v: (B, H, T, D) read-only
    PAST buffers; length: scalar int32 count of valid past positions; start:
    (B,) int32 first valid position per row (contiguous left padding);
    k_new/v_new: (B, H, D) the current token's K/V (compute dtype), merged as
    a final attention column.  ``k_scale``/``v_scale`` (B, H, T) f32 declare
    k/v as int8 with per-position symmetric scales — the kernel dequantizes
    scores/probs (never the tiles), so int8 halves the HBM bytes per block.
    Returns (B, H, D).  Only ``ceil(length/block_k)`` past KV blocks are read
    from HBM."""
    b, h, t, d = k.shape
    nk = pl.cdiv(t, block_k)
    if start is None:
        start = jnp.zeros((b,), jnp.int32)
    start = start.astype(jnp.int32)
    length = jnp.reshape(length, (1,)).astype(jnp.int32)
    include_self = k_new is not None
    if k_new is None:
        k_new = jnp.zeros((b, h, d), q.dtype)
    if v_new is None:
        v_new = jnp.zeros((b, h, d), q.dtype)
    quantized = k_scale is not None
    if quantized:
        k_scale = k_scale.astype(jnp.float32)
        v_scale = v_scale.astype(jnp.float32)
    else:
        # 1-element placeholders (constant index_map -> DMA'd once, never read)
        k_scale = jnp.zeros((1, 1, block_k), jnp.float32)
        v_scale = jnp.zeros((1, 1, block_k), jnp.float32)

    def clamp_map(b_i, j, lens, starts):
        limit = (lens[0] + block_k - 1) // block_k
        return (b_i, 0, jnp.minimum(j, jnp.maximum(limit - 1, 0)), 0)

    def scale_map(b_i, j, lens, starts):
        if not quantized:
            return (0, 0, 0)
        limit = (lens[0] + block_k - 1) // block_k
        return (b_i, 0, jnp.minimum(j, jnp.maximum(limit - 1, 0)))

    sh, sbk = (h, block_k) if quantized else (1, block_k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nk),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda b_i, j, lens, starts: (b_i, 0, 0)),
            pl.BlockSpec((1, h, block_k, d), clamp_map),
            pl.BlockSpec((1, h, block_k, d), clamp_map),
            pl.BlockSpec((1, h, d), lambda b_i, j, lens, starts: (b_i, 0, 0)),
            pl.BlockSpec((1, h, d), lambda b_i, j, lens, starts: (b_i, 0, 0)),
            pl.BlockSpec((1, sh, sbk), scale_map),
            pl.BlockSpec((1, sh, sbk), scale_map),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda b_i, j, lens, starts: (b_i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, d), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, scale=scale, t_total=t,
                          include_self=include_self, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=interpret,
    )(length, start, q, k, v, k_new, v_new, k_scale, v_scale)


def decode_attention_reference(q, k, v, length, start=None, *, k_new=None,
                               v_new=None, k_scale=None, v_scale=None, scale=1.0):
    """XLA reference implementation (same semantics) for parity tests.
    Shapes as :func:`decode_attention`: q (B, H, D), k/v (B, H, T, D),
    optional int8 k/v with (B, H, T) scales."""
    b, h, t, d = k.shape
    if k_scale is not None:
        k = k.astype(jnp.float32) * k_scale[..., None].astype(jnp.float32)
        v = v.astype(jnp.float32) * v_scale[..., None].astype(jnp.float32)
    pos = jnp.arange(t)[None, :]
    pos_ok = pos < length
    if start is not None:
        pos_ok = pos_ok & (pos >= start[:, None])
    s = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    s = jnp.where(pos_ok[:, None, :], s, NEG_INF)
    if k_new is not None:
        s_self = jnp.sum(q.astype(jnp.float32) * k_new.astype(jnp.float32), axis=-1, keepdims=True) * scale
        s = jnp.concatenate([s, s_self], axis=-1)
        v = jnp.concatenate([v.astype(jnp.float32), v_new[:, :, None, :].astype(jnp.float32)], axis=2)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhk,bhkd->bhd", p, v.astype(jnp.float32)).astype(q.dtype)
