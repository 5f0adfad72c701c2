"""Pallas TPU flash attention (forward + backward) for the training path.

The reference uses eager O(T²)-materialized attention (explicit ``bmm`` +
softmax, ``/root/reference/parler_tts/modeling_parler_tts.py:320-382``; flash
attention is listed as future work in its README).  Training sequences here
are ``prompt + 2580`` codec frames, so materializing (B, 16, T, T) fp32
scores is both HBM-bandwidth- and memory-hostile; this kernel computes
attention blockwise with online softmax, never materializing scores.

Key padding is expressed as per-row ``(kv_start, kv_end)`` bounds
(scalar-prefetched) rather than a dense mask: every mask in this framework is
a contiguous run — prompts are LEFT-padded (reference
``run_parler_tts_training.py:910-917``), descriptions RIGHT-padded — and
scalar bounds avoid mask operands that violate TPU (8, 128) tiling.

Semantics (matching ``ops/nn.attention_scores``):
* finite ``NEG_INF`` masking — fully-masked rows degrade to uniform
  attention instead of NaN (left-padded prompt query rows);
* fp32 softmax/accumulation regardless of input dtype;
* optional causal masking with ``q_offset`` (absolute position of q[0]).

Causal block skipping happens in the index_map (out-of-range KV blocks clamp
to the diagonal block, so Mosaic skips the duplicate DMA) plus ``pl.when``
around the compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9



def _row_ok(offset, block, bound, width):
    """(block, 1) bool: in-bounds rows of a tile starting at offset."""
    pos = offset * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    del width
    return pos < bound


def _sanitize(x, ok):
    """Zero out-of-bounds rows: OOB memory may hold NaN/Inf and 0*NaN would
    poison dot-product accumulations."""
    return jnp.where(ok, x, 0.0)


def _causal_limit(i, q_offset, block_q, block_k):
    """Highest KV block index the i-th query block may attend to."""
    q_end = q_offset + (i + 1) * block_q - 1
    return q_end // block_k


def _kv_valid(start_ref, end_ref, bh, j, block_q, block_k, tk, causal, q_offset, i):
    """(block_q, block_k) bool validity of kv positions for this block pair."""
    k_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    valid = (k_pos >= start_ref[bh]) & (k_pos < jnp.minimum(end_ref[bh], tk))
    if causal:
        q_pos = q_offset + i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        valid = valid & (k_pos <= q_pos)
    return valid


def _fwd_kernel(start_ref, end_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_s, l_s, acc_s,
                *, block_q, block_k, scale, causal, q_offset, nk, tk, tq):
    bh, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    run = True
    if causal:
        run = j <= _causal_limit(i, q_offset, block_q, block_k)

    @pl.when(run)
    def _():
        q_ok = _row_ok(i, block_q, tq, block_q)
        k_ok = _row_ok(j, block_k, tk, block_k)
        q = _sanitize(q_ref[0].astype(jnp.float32), q_ok)  # (bq, D)
        k = _sanitize(k_ref[0].astype(jnp.float32), k_ok)  # (bk, D)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale  # (bq, bk)
        valid = _kv_valid(start_ref, end_ref, bh, j, block_q, block_k, tk, causal, q_offset, i)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_s[...]  # (bq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        # explicit zero (not exp(NEG_INF)): OOB-padded V rows may hold NaN and
        # 0*NaN would poison the accumulation
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        l_s[...] = l_s[...] * corr + jnp.sum(p, axis=1, keepdims=True)
        v = _sanitize(v_ref[0].astype(jnp.float32), k_ok)
        pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc_s[...] = acc_s[...] * corr + pv
        m_s[...] = m_new

    @pl.when(j == nk - 1)
    def _():
        l = jnp.maximum(l_s[...], 1e-30)
        o_ref[0] = (acc_s[...] / l).astype(o_ref.dtype)
        lse_ref[0] = m_s[...] + jnp.log(l)  # (bq, 1)


def _fwd(q, k, v, kv_start, kv_end, *, scale, causal, q_offset, block_q, block_k, interpret):
    bh, tq, d = q.shape
    tk = k.shape[1]
    nq, nk = pl.cdiv(tq, block_q), pl.cdiv(tk, block_k)

    def kv_map(bh_i, i, j, s, e):
        if causal:
            j = jnp.minimum(j, _causal_limit(i, q_offset, block_q, block_k))
        return (bh_i, j, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh_i, i, j, s, e: (bh_i, i, 0)),
            pl.BlockSpec((1, block_k, d), kv_map),
            pl.BlockSpec((1, block_k, d), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh_i, i, j, s, e: (bh_i, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh_i, i, j, s, e: (bh_i, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_q=block_q, block_k=block_k, scale=scale,
                          causal=causal, q_offset=q_offset, nk=nk, tk=tk, tq=tq),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, tq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(kv_start, kv_end, q, k, v)
    return out, lse


def _dkv_kernel(start_ref, end_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_s, dv_s,
                *, block_q, block_k, scale, causal, q_offset, ni, tk, tq):
    bh, j, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)  # k-major, q inner

    @pl.when(i == 0)
    def _():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    run = True
    if causal:
        run = j <= _causal_limit(i, q_offset, block_q, block_k)

    @pl.when(run)
    def _():
        q_ok = _row_ok(i, block_q, tq, block_q)
        k_ok = _row_ok(j, block_k, tk, block_k)
        q = _sanitize(q_ref[0].astype(jnp.float32), q_ok)
        k = _sanitize(k_ref[0].astype(jnp.float32), k_ok)
        v = _sanitize(v_ref[0].astype(jnp.float32), k_ok)
        do = _sanitize(do_ref[0].astype(jnp.float32), q_ok)
        lse = _sanitize(lse_ref[0], q_ok)  # (bq, 1)
        delta = _sanitize(delta_ref[0], q_ok)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        valid = _kv_valid(start_ref, end_ref, bh, j, block_q, block_k, tk, causal, q_offset, i)
        valid = valid & q_ok  # zero OOB q rows (their lse is garbage)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)  # (bq, bk)

        dv_s[...] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk_s[...] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _():
        dk_ref[0] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_s[...].astype(dv_ref.dtype)


def _dq_kernel(start_ref, end_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_s,
               *, block_q, block_k, scale, causal, q_offset, nk, tk, tq):
    bh, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        dq_s[...] = jnp.zeros_like(dq_s)

    run = True
    if causal:
        run = j <= _causal_limit(i, q_offset, block_q, block_k)

    @pl.when(run)
    def _():
        q_ok = _row_ok(i, block_q, tq, block_q)
        k_ok = _row_ok(j, block_k, tk, block_k)
        q = _sanitize(q_ref[0].astype(jnp.float32), q_ok)
        k = _sanitize(k_ref[0].astype(jnp.float32), k_ok)
        v = _sanitize(v_ref[0].astype(jnp.float32), k_ok)
        do = _sanitize(do_ref[0].astype(jnp.float32), q_ok)
        lse = _sanitize(lse_ref[0], q_ok)
        delta = _sanitize(delta_ref[0], q_ok)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        valid = _kv_valid(start_ref, end_ref, bh, j, block_q, block_k, tk, causal, q_offset, i)
        valid = valid & q_ok
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dq_s[...] += jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = dq_s[...].astype(dq_ref.dtype)


def _dqkv_single_kernel(start_ref, end_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                        delta_ref, dq_ref, dk_ref, dv_ref,
                        *, block_q, block_k, scale, causal, q_offset, tk, tq):
    """Fused dq+dk+dv for the single-block-pair case (whole sequence fits one
    (block_q, block_k) tile — the production 10 s training shape at the
    measured-best 1024² tiles).  The split _dq/_dkv kernels each recompute
    the score matrix and its exp; with one program per (batch·head) there is
    no cross-block accumulation, so one kernel computes s/p/dp/ds once and
    emits all three gradients — two fewer (T×T)·D dots plus one fewer pass
    over q/k/v/do per head."""
    bh = pl.program_id(0)
    q_ok = _row_ok(0, block_q, tq, block_q)
    k_ok = _row_ok(0, block_k, tk, block_k)
    q = _sanitize(q_ref[0].astype(jnp.float32), q_ok)
    k = _sanitize(k_ref[0].astype(jnp.float32), k_ok)
    v = _sanitize(v_ref[0].astype(jnp.float32), k_ok)
    do = _sanitize(do_ref[0].astype(jnp.float32), q_ok)
    lse = _sanitize(lse_ref[0], q_ok)
    delta = _sanitize(delta_ref[0], q_ok)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    valid = _kv_valid(start_ref, end_ref, bh, 0, block_q, block_k, tk, causal, q_offset, 0)
    valid = valid & q_ok
    p = jnp.where(valid, jnp.exp(s - lse), 0.0)  # (bq, bk)

    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_single(q, k, v, kv_start, kv_end, do, lse, delta, *, scale, causal,
                q_offset, block_q, block_k, interpret):
    bh, tq, d = q.shape
    tk = k.shape[1]
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh_i, s, e: (bh_i, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh_i, s, e: (bh_i, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh_i, s, e: (bh_i, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda bh_i, s, e: (bh_i, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh_i, s, e: (bh_i, 0, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh_i, s, e: (bh_i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh_i, s, e: (bh_i, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh_i, s, e: (bh_i, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh_i, s, e: (bh_i, 0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_dqkv_single_kernel, block_q=block_q, block_k=block_k,
                          scale=scale, causal=causal, q_offset=q_offset, tk=tk, tq=tq),
        grid_spec=spec,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=interpret,
    )(kv_start, kv_end, q, k, v, do, lse, delta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def flash_attention(q, k, v, kv_start, kv_end, scale=1.0, causal=True, q_offset=0,
                    block_q=128, block_k=128, interpret=False):
    """q: (BH, Tq, D); k/v: (BH, Tk, D); kv_start/kv_end: (BH,) int32 — keys
    outside [start, end) are masked.  Returns (BH, Tq, D).  Differentiable
    (flash backward, no score materialization)."""
    out, _ = _fwd(q, k, v, kv_start, kv_end, scale=scale, causal=causal, q_offset=q_offset,
                  block_q=block_q, block_k=block_k, interpret=interpret)
    return out


def _vjp_fwd(q, k, v, kv_start, kv_end, scale, causal, q_offset, block_q, block_k, interpret):
    out, lse = _fwd(q, k, v, kv_start, kv_end, scale=scale, causal=causal, q_offset=q_offset,
                    block_q=block_q, block_k=block_k, interpret=interpret)
    return out, (q, k, v, kv_start, kv_end, out, lse)


def _vjp_bwd(scale, causal, q_offset, block_q, block_k, interpret, res, do):
    q, k, v, kv_start, kv_end, out, lse = res
    bh, tq, d = q.shape
    tk = k.shape[1]
    # optional bwd-only tile override (PARLER_FLASH_BLOCK_Q_BWD/K_BWD, 0 =
    # inherit the fwd tiles): the two backward kernels keep a (block_q,
    # block_k) f32 score tile PLUS dq/dkv accumulators and 4 operand tiles
    # in VMEM at once — measurably tighter than the forward at 1024² — so
    # the best bwd tile may differ from the best fwd tile.
    if _BLOCK_Q_BWD:
        block_q = min(_BLOCK_Q_BWD, _round8(tq))
    if _BLOCK_K_BWD:
        block_k = min(_BLOCK_K_BWD, _round8(tk))
    nq, nk = pl.cdiv(tq, block_q), pl.cdiv(tk, block_k)

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)  # (BH, Tq, 1)

    # "0"/unset = fused path on, any other value disables it ("!= '0'"
    # semantics, consistent with PARLER_REMAT_SAVE_PALLAS).  Read at TRACE
    # time only: toggling between same-shape calls in one process is ignored
    # by the jit cache — restart the process (or jax.clear_caches()) to flip.
    if nq == 1 and nk == 1 and _os.environ.get("PARLER_FLASH_NO_FUSED_BWD", "0") == "0":
        # whole sequence in one block pair: fused dq+dk+dv kernel (no
        # duplicated score recompute between the split kernels below)
        dq, dk, dv = _bwd_single(
            q, k, v, kv_start, kv_end, do, lse, delta, scale=scale,
            causal=causal, q_offset=q_offset, block_q=block_q, block_k=block_k,
            interpret=interpret,
        )
        return dq, dk, dv, None, None

    def kv_map(bh_i, i, j, s, e):
        if causal:
            j = jnp.minimum(j, _causal_limit(i, q_offset, block_q, block_k))
        return (bh_i, j, 0)

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh_i, i, j, s, e: (bh_i, i, 0)),
            pl.BlockSpec((1, block_k, d), kv_map),
            pl.BlockSpec((1, block_k, d), kv_map),
            pl.BlockSpec((1, block_q, d), lambda bh_i, i, j, s, e: (bh_i, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh_i, i, j, s, e: (bh_i, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh_i, i, j, s, e: (bh_i, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh_i, i, j, s, e: (bh_i, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_q=block_q, block_k=block_k, scale=scale,
                          causal=causal, q_offset=q_offset, nk=nk, tk=tk, tq=tq),
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(kv_start, kv_end, q, k, v, do, lse, delta)

    def q_map(bh_i, j, i, s, e):
        # for k-block j, q blocks strictly below the diagonal contribute 0
        if causal:
            i_min = (j * block_k - q_offset) // block_q
            i = jnp.maximum(i, jnp.maximum(i_min, 0))
        return (bh_i, i, 0)

    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), q_map),
            pl.BlockSpec((1, block_k, d), lambda bh_i, j, i, s, e: (bh_i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh_i, j, i, s, e: (bh_i, j, 0)),
            pl.BlockSpec((1, block_q, d), q_map),
            pl.BlockSpec((1, block_q, 1), q_map),
            pl.BlockSpec((1, block_q, 1), q_map),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh_i, j, i, s, e: (bh_i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh_i, j, i, s, e: (bh_i, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_q=block_q, block_k=block_k, scale=scale,
                          causal=causal, q_offset=q_offset, ni=nq, tk=tk, tq=tq),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=interpret,
    )(kv_start, kv_end, q, k, v, do, lse, delta)

    return dq, dk, dv, None, None


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


def _round8(n: int) -> int:
    return max(8, ((n + 7) // 8) * 8)


# default tile sizes (env-overridable for on-chip experiments): the grid has
# bh * ceil(Tq/bq) * ceil(Tk/bk) programs, and at D=64 the per-program dots
# are tiny — per-program fixed cost dominates with small tiles.  Measured on
# v5e, Mini train step batch 8 x 10 s (T=903), remat, 5-step medians:
# 128x128 0.524 s/step (LOST to XLA's materialized attention, 0.358),
# 256x256 0.360, 256x512 0.314, 512x512 0.297, 1024x1024 0.270 (33.6% MFU,
# 1.33x over XLA; b4 x 30 s: 0.512 vs 1.033 XLA).  Blocks clamp to the
# rounded sequence length, so 1024 means "whole sequence per program" at
# 10 s shapes and 3x3 blocks at 30 s; VMEM caps growth past ~1024 (a
# 2048-block score tile is 16 MB f32).  Compiled fwd/bwd parity re-verified
# at the large blocks (benchmarks/pallas_compiled_parity.json).
import os as _os

_BLOCK_Q = int(_os.environ.get("PARLER_FLASH_BLOCK_Q", "1024"))
_BLOCK_K = int(_os.environ.get("PARLER_FLASH_BLOCK_K", "1024"))
# bwd-only overrides (0 = inherit fwd tiles); see _vjp_bwd
_BLOCK_Q_BWD = int(_os.environ.get("PARLER_FLASH_BLOCK_Q_BWD", "0"))
_BLOCK_K_BWD = int(_os.environ.get("PARLER_FLASH_BLOCK_K_BWD", "0"))


def flash_attention_bhtd(q, k, v, kv_mask=None, *, scale, causal=True, q_offset=0,
                         block_q=None, block_k=None, interpret=False):
    """(B, H, T, D) convenience wrapper.

    ``kv_mask`` (B, Tk): validity mask whose valid region must be one
    contiguous run (left- or right-padding — the only shapes this framework
    produces); converted to per-row (start, end) bounds.
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    block_q = min(block_q or _BLOCK_Q, _round8(tq))
    block_k = min(block_k or _BLOCK_K, _round8(tk))
    if kv_mask is None:
        start = jnp.zeros((b,), jnp.int32)
        end = jnp.full((b,), tk, jnp.int32)
    else:
        m = kv_mask.astype(jnp.int32)
        start = jnp.argmax(m, axis=1).astype(jnp.int32)
        end = start + jnp.sum(m, axis=1).astype(jnp.int32)
    start = jnp.repeat(start, h)
    end = jnp.repeat(end, h)
    out = flash_attention(
        q.reshape(b * h, tq, d), k.reshape(b * h, tk, d), v.reshape(b * h, tk, d),
        start, end, scale, causal, q_offset, block_q, block_k, interpret,
    )
    return out.reshape(b, h, tq, d)
