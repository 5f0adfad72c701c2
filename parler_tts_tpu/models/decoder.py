"""MusicGen-style multi-codebook decoder LM, TPU-native.

Semantic equivalent of the reference's ``ParlerTTSDecoder`` /
``ParlerTTSForCausalLM`` (``/root/reference/parler_tts/modeling_parler_tts.py:
755-1552``), redesigned for XLA:

* **Stacked layer parameters** — every per-layer weight carries a leading
  ``(num_layers, ...)`` axis and the block stack runs under ``lax.scan``:
  one compiled layer body instead of 24 unrolled copies (fast compiles, and
  XLA pipelines the weight loads from HBM).
* **Static-shape KV cache, tile-aware** — ``(L, B, H, D, T_max)`` time-minor
  buffers (dense 128-lane reads at D=64) plus a small write-staging slab
  flushed in bulk every :data:`STAGE` steps (see :class:`KVCache`);
  cross-attention K/V are computed once at prefill (reference caches them
  per-layer at ``modeling_parler_tts.py:287-298``).
* **Fused codebook embedding** — the K per-codebook tables are one
  ``(K, vocab+1, H)`` array; the sum over codebooks
  (reference ``:836``) is a single gather over an offset-flattened table.
* **Fused LM heads** — K separate ``Linear(H, V)`` heads (reference
  ``:1069-1071``) are one ``(K, H, V)`` einsum.

Exact reference quirks preserved (they affect checkpoint parity):
* embedding tables have ``vocab_size + 1`` rows (historical accident,
  reference ``:769-773``);
* prompt hidden states are concatenated *in front of* the codec-token
  embeddings and consume sinusoidal position ids (reference ``:838-840,
  881-886``);
* ``embed_scale`` is computed but never applied to the summed embeddings in
  the reference's forward, so we don't apply it either;
* sinusoidal table is ``concat([cos, sin])`` per position (tensor2tensor
  order, reference ``:199-213``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from parler_tts_tpu.core.config import DecoderConfig
from parler_tts_tpu.ops import runtime_flags
from parler_tts_tpu.ops.nn import (
    ACTIVATIONS,
    NEG_INF,
    Params,
    _precision,
    dense,
    dropout,
    layer_norm,
    merge_heads,
    normal_init,
    split_heads,
)


def sinusoidal_positions(num_positions: int, dim: int) -> jnp.ndarray:
    """(num_positions, dim) table, ``[cos | sin]`` concat order
    (reference ``modeling_parler_tts.py:199-213``)."""
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(jnp.log(10000.0) / (half - 1)))
    angles = jnp.arange(num_positions, dtype=jnp.float32)[:, None] * freq[None, :]
    table = jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=1)
    if dim % 2 == 1:
        table = jnp.pad(table, ((0, 0), (0, 1)))
    return table


def sinusoidal_position_at(index: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Single (dim,) position row for a traced scalar ``index`` — the decode
    loop needs one row per step, and computing it directly keeps the
    (max_positions, dim) table out of the loop body (XLA does not hoist the
    table build across the ``while``; it cost ~60 us/step at Mini shapes)."""
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(jnp.log(10000.0) / (half - 1)))
    angles = index.astype(jnp.float32) * freq
    row = jnp.concatenate([jnp.cos(angles), jnp.sin(angles)])
    if dim % 2 == 1:
        row = jnp.pad(row, (0, 1))
    return row


STAGE = 64  # decode positions buffered before a bulk cache flush (see KVCache)

# decode layer-scan unroll factor (experiment knob; see PERFORMANCE.md —
# the ~1.1 ms/step small-fusion glue term scales with scan-iteration count,
# unrolling trades compile time for cross-layer fusion windows)
import os as _os

_DECODE_UNROLL = int(_os.environ.get("PARLER_DECODE_UNROLL", "1"))


class KVCache(NamedTuple):
    """Static-shape decode cache, laid out for the v5e tile geometry.

    self_k/self_v: (L, B, H, D, T_max) — self-attention keys/values at
    absolute fused positions (prompt prefix + codec frames), **time-minor**:
    with D=64 the natural (T, D) layout half-fills the 128-lane tile minor
    dim and the decode attention read runs ~1.9x off HBM bound; (D, T) reads
    dense.  Storage dtype is either the compute dtype or **int8** with
    per-position symmetric scales (``kv_dtype="int8"``): the scale is
    constant over D so it folds exactly out of both attention dots (see
    ``ops/quantization.py``) — halving the decode loop's dominant HBM term
    and the cache footprint (the 16 GB-chip envelope gate).
    self_k_scale/self_v_scale: (L, B, H, T_max) bf16, or None when
    unquantized (bf16 scales: ~0.4% extra relative error on top of int8's
    ~0.8%, but half the per-step scale-read traffic).
    stage_k/stage_v: (L, STAGE, B, H, D) — the most recent
    ``index - flushed`` decode positions.  Per-step single-position writes
    into the big (D, T) time-minor buffers are a *lane-dynamic*
    ``dynamic_update_slice`` — measured ~2.6 ms each at Mini batch-32
    regardless of slab size (the dynamic minor-dim offset defeats tiled
    lowering) — so decode steps append to this small slab-contiguous buffer
    (slot offset on a leading dim: cheap) and attention covers
    [main | stage | current]; every STAGE steps the slab is transposed +
    written to the main buffers in one bulk update, amortizing the
    lane-dynamic write cost.  Storage follows the cache: int8 + per-position
    scales when ``kv_dtype="int8"`` (quantized at append, so stage reads —
    STAGE slots per step — stream half the bytes), else compute dtype.
    stage_k_scale/stage_v_scale: (L, STAGE, B, H) bf16, or None.
    cross_k/cross_v: (L, B, H, S, D) — description keys/values, filled at
    prefill, read-only afterwards.  This is the *dot-native* layout: the
    decode-step score and value einsums consume it with zero physical
    relayout.  Two alternatives were measured at Mini batch-32 and lost:
    (a) head-folded (L, B, S, H*D) packs the minor tile densely but the
    head-split einsums make XLA materialize per-step transposes + a
    dequantized copy (~0.7 ms/step); (b) computing block-diagonal
    multiply-reduces directly on the packed layout does not fuse — XLA
    materializes the reshape/broadcast intermediates (~0.9 ms/step).  The
    (..., S, D=64) minor half-fills the 128-lane tile, but on these small
    read-only buffers (int8) the padding costs far less than any per-step
    relayout.  Same int8 storage rule as self_k/self_v.
    cross_k_scale/cross_v_scale: (L, B, H, S) bf16, or None.
    index: scalar int32 — number of fused positions already written.
    flushed: scalar int32 — positions materialized in self_k/self_v
    (``index - flushed`` positions live in the stage buffers).
    """

    self_k: jnp.ndarray
    self_v: jnp.ndarray
    self_k_scale: jnp.ndarray | None
    self_v_scale: jnp.ndarray | None
    stage_k: jnp.ndarray
    stage_v: jnp.ndarray
    stage_k_scale: jnp.ndarray | None
    stage_v_scale: jnp.ndarray | None
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray
    cross_k_scale: jnp.ndarray | None
    cross_v_scale: jnp.ndarray | None
    index: jnp.ndarray
    flushed: jnp.ndarray


def init_cache(
    cfg: DecoderConfig,
    batch: int,
    max_len: int,
    enc_len: int,
    dtype=jnp.float32,
    kv_dtype: str | None = None,
) -> KVCache:
    """``kv_dtype``: None stores K/V in ``dtype``; ``"int8"`` stores int8 +
    per-position scales (~2x less decode HBM traffic and cache memory)."""
    l, h, d = cfg.num_hidden_layers, cfg.num_attention_heads, cfg.head_dim
    quant = kv_dtype == "int8"
    store = jnp.int8 if quant else dtype
    max_len = max_len + STAGE  # slack so a partial tail flush never clamps
    return KVCache(
        self_k=jnp.zeros((l, batch, h, d, max_len), store),
        self_v=jnp.zeros((l, batch, h, d, max_len), store),
        self_k_scale=jnp.zeros((l, batch, h, max_len), jnp.bfloat16) if quant else None,
        self_v_scale=jnp.zeros((l, batch, h, max_len), jnp.bfloat16) if quant else None,
        stage_k=jnp.zeros((l, STAGE, batch, h, d), store),
        stage_v=jnp.zeros((l, STAGE, batch, h, d), store),
        stage_k_scale=jnp.zeros((l, STAGE, batch, h), jnp.bfloat16) if quant else None,
        stage_v_scale=jnp.zeros((l, STAGE, batch, h), jnp.bfloat16) if quant else None,
        cross_k=jnp.zeros((l, batch, h, enc_len, d), store),
        cross_v=jnp.zeros((l, batch, h, enc_len, d), store),
        cross_k_scale=jnp.zeros((l, batch, h, enc_len), jnp.bfloat16) if quant else None,
        cross_v_scale=jnp.zeros((l, batch, h, enc_len), jnp.bfloat16) if quant else None,
        index=jnp.zeros((), jnp.int32),
        flushed=jnp.zeros((), jnp.int32),
    )


def _store_kv(values: jnp.ndarray, cache_buf: jnp.ndarray):
    """Convert freshly-computed K/V (L, B, H, t, D) to the cache's storage
    format — (D, T)-transposed, int8-quantized when the cache is int8:
    (stored values (L, B, H, D, t), scales (L, B, H, t) bf16-or-None)."""
    if cache_buf.dtype == jnp.int8:
        from parler_tts_tpu.ops.quantization import quantize_kv

        q, scale = quantize_kv(values)
        return jnp.swapaxes(q, -1, -2), scale.astype(jnp.bfloat16)
    return jnp.swapaxes(values.astype(cache_buf.dtype), -1, -2), None


def _store_cross(values: jnp.ndarray, cache_buf: jnp.ndarray):
    """Convert prefill-computed cross K/V (L, B, H, S, D) to the cache's
    storage: the layout already matches (see :class:`KVCache`), so this is
    pure dtype conversion — (stored (L, B, H, S, D), scales (L, B, H, S)
    bf16-or-None)."""
    if cache_buf.dtype == jnp.int8:
        from parler_tts_tpu.ops.quantization import quantize_kv

        q, scale = quantize_kv(values)
        return q, scale.astype(jnp.bfloat16)
    return values.astype(cache_buf.dtype), None


def flush_stage(cache: KVCache) -> KVCache:
    """Write the stage slab into the main (D, T)-layout buffers in one bulk
    quantize+transpose update and advance ``flushed`` to ``index``.

    Always writes the full STAGE-wide slab at offset ``flushed``: slots past
    ``index - flushed`` land as garbage in positions ``>= index``, which are
    (a) invisible to attention (reads mask ``< flushed``) and (b) overwritten
    by the next flush; ``init_cache`` over-allocates T by STAGE so a partial
    tail flush never clamps into valid positions.  Safe to call with an empty
    stage (no-op apart from the masked garbage write).

    The stage is already in storage dtype (quantized at append), so the
    flush is a pure transpose + bulk write."""

    def to_main(slab):  # (L, S, B, H, D) -> (L, B, H, D, S)
        return jnp.swapaxes(jnp.moveaxis(slab, 1, 3), -1, -2)

    fk, fv = to_main(cache.stage_k), to_main(cache.stage_v)
    off = cache.flushed
    return KVCache(
        lax.dynamic_update_slice(cache.self_k, fk, (0, 0, 0, 0, off)),
        lax.dynamic_update_slice(cache.self_v, fv, (0, 0, 0, 0, off)),
        lax.dynamic_update_slice(
            cache.self_k_scale, jnp.moveaxis(cache.stage_k_scale, 1, 3), (0, 0, 0, off)
        )
        if cache.self_k_scale is not None else None,
        lax.dynamic_update_slice(
            cache.self_v_scale, jnp.moveaxis(cache.stage_v_scale, 1, 3), (0, 0, 0, off)
        )
        if cache.self_v_scale is not None else None,
        cache.stage_k,
        cache.stage_v,
        cache.stage_k_scale,
        cache.stage_v_scale,
        cache.cross_k,
        cache.cross_v,
        cache.cross_k_scale,
        cache.cross_v_scale,
        cache.index,
        cache.index,
    )


def grow_cache(cache: KVCache, new_max_len: int) -> KVCache:
    """Zero-pad the self-attention buffers' time axis to ``new_max_len`` (+
    the STAGE slack, matching :func:`init_cache`).  Used by the decode loop's
    *growing-buffer* length bucketing: the cache starts at the first bucket
    size and is padded once per bucket transition, so every decode step reads
    a dense buffer sized to the current bucket — attention HBM traffic scales
    with generated length with no per-step slicing (a static ``slice_in_dim``
    on the minor time axis makes XLA materialize the sliced operand every
    step — measured slower than reading the full buffer).  The padded region
    is garbage-safe: reads mask positions ``>= flushed``."""
    new_t = new_max_len + STAGE
    grow = new_t - cache.self_k.shape[4]
    if grow <= 0:
        return cache
    pad5 = ((0, 0), (0, 0), (0, 0), (0, 0), (0, grow))
    pad4 = ((0, 0), (0, 0), (0, 0), (0, grow))
    return cache._replace(
        self_k=jnp.pad(cache.self_k, pad5),
        self_v=jnp.pad(cache.self_v, pad5),
        self_k_scale=jnp.pad(cache.self_k_scale, pad4)
        if cache.self_k_scale is not None else None,
        self_v_scale=jnp.pad(cache.self_v_scale, pad4)
        if cache.self_v_scale is not None else None,
    )


def prepare_decode_params(params: Params, int8: bool = False) -> Params:
    """Decode-optimized parameter view: concatenates the per-layer q/k/v
    kernels into one (L, H, 3H) fused projection.  Call once (inside the
    jitted generate, before the decode loop) — loop-invariant, so the concat
    happens once per generation, and the step does one matmul instead of
    three (better weight-streaming contiguity).

    ``int8=True`` additionally quantizes every decode-hot matmul weight
    (fused qkv, attention out, cross q/out, FFN, LM heads) to int8 with
    per-output-channel scales (``ops/quantization.py``) — also loop-invariant,
    so quantization costs one pass and every decode step streams half the
    weight bytes.  Embedding tables stay in the compute dtype (gather traffic
    is negligible, and this stack's fused gather->convert miscompiles)."""
    sa = params["layers"]["self_attn"]
    qkv = {
        "kernel": jnp.concatenate(
            [sa["q"]["kernel"], sa["k"]["kernel"], sa["v"]["kernel"]], axis=-1
        )
    }
    layers = {**params["layers"], "self_attn": {**sa, "qkv": qkv}}
    fused = {**params, "layers": layers}
    if not int8:
        return fused

    from parler_tts_tpu.ops.quantization import quantize_dense

    def q(p):
        return quantize_dense(p["kernel"])

    layers = {
        **layers,
        "self_attn": {**layers["self_attn"], "qkv": q(qkv), "o": q(sa["o"])},
        "cross_attn": {
            **layers["cross_attn"],
            "q": q(layers["cross_attn"]["q"]),
            "o": q(layers["cross_attn"]["o"]),
        },
        "fc1": q(layers["fc1"]),
        "fc2": q(layers["fc2"]),
    }
    return {
        **fused,
        "layers": layers,
        "lm_heads": quantize_dense(params["lm_heads"]["kernel"]),
    }


def embed_codebooks(params: Params, ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Sum of per-codebook embeddings (reference ``:836``).
    ids: (B, K, T) -> (B, T, H).  Single gather over the offset-flattened
    (K*(vocab+1), H) table.

    The table is cast to the compute dtype BEFORE the gather: on this
    image's TPU stack, the fused gather->convert(f32->bf16) pattern
    miscompiles (NaNs + occasional TPU-worker kernel faults); gathering in
    the target dtype sidesteps it and halves gather bandwidth anyway."""
    tables = params["embed_tokens"]["embedding"]  # (K, V+1, H)
    if dtype is not None:
        tables = tables.astype(dtype)
    k, v1, h = tables.shape
    flat = tables.reshape(k * v1, h)
    offset_ids = ids + (jnp.arange(k, dtype=ids.dtype) * v1)[None, :, None]
    gathered = jnp.take(flat, offset_ids, axis=0)  # (B, K, T, H)
    return jnp.sum(gathered, axis=1)


def _self_attention_full(
    p: Params,
    cfg: DecoderConfig,
    x: jnp.ndarray,
    mask: jnp.ndarray | None,
    flash_ctx: jnp.ndarray | None = None,
    attn_key: jnp.ndarray | None = None,
):
    """Full-sequence causal self-attention (training / prefill-from-0).
    Returns (out, (k_local, v_local)) — the sequence K/V for cache insert.
    ``attn_key`` enables attention-prob dropout (reference ``:363``) —
    when active it forces the score-materializing XLA path."""
    scale = cfg.head_dim**-0.5
    q = split_heads(dense(p["q"], x), cfg.num_attention_heads) * scale
    k = split_heads(dense(p["k"], x), cfg.num_attention_heads)
    v = split_heads(dense(p["v"], x), cfg.num_attention_heads)
    dtype = q.dtype
    attn_dropout_on = attn_key is not None and cfg.attention_dropout > 0.0

    if q.shape[2] > 1 and flash_ctx is not None and runtime_flags.use_pallas() and not attn_dropout_on:
        # pallas flash attention — no score materialization
        from parler_tts_tpu.ops.pallas.flash_attention import flash_attention_bhtd

        out = flash_attention_bhtd(
            q, k.astype(dtype), v.astype(dtype), flash_ctx,
            scale=1.0, causal=True,  # q pre-scaled
        )
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k.astype(dtype), preferred_element_type=jnp.float32, precision=_precision(q))
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        if attn_dropout_on:
            probs = dropout(attn_key, probs, cfg.attention_dropout)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(dtype), preferred_element_type=dtype, precision=_precision(q))
    return dense(p["o"], merge_heads(out)), (k, v)


def _self_attention_decode(
    p: Params,
    cfg: DecoderConfig,
    x: jnp.ndarray,
    past_k: jnp.ndarray,
    past_v: jnp.ndarray,
    stage_k: jnp.ndarray,
    stage_v: jnp.ndarray,
    stage_k_scale: jnp.ndarray | None,
    stage_v_scale: jnp.ndarray | None,
    index: jnp.ndarray,
    flushed: jnp.ndarray,
    kv_pad_mask: jnp.ndarray | None,
    k_scale: jnp.ndarray | None = None,
    v_scale: jnp.ndarray | None = None,
):
    """Single-token cached decode over [main cache | stage | current token].

    ``past_k/past_v`` (B, H, D, T) are READ-ONLY (positions ``< flushed``
    valid); ``stage_k/stage_v`` (STAGE, B, H, D) hold the most recent
    ``index - flushed`` positions in storage dtype (with per-slot scales
    ``stage_k_scale/stage_v_scale`` (STAGE, B, H) when int8); the current
    token's K/V is an explicit extra column and is returned as the per-layer
    slice for the caller's staged insert (see :class:`KVCache` for why
    writes are staged).

    The whole T axis of ``past_k/past_v`` is read every step; HBM traffic
    scales with generated length because the *buffer itself* is sized to the
    current length bucket (``grow_cache``) — a static read-limit slice on
    the minor time axis was measured slower (XLA materializes the sliced
    operand per step).

    Returns (out, (k_new, v_new)) with k_new/v_new (B, H, 1, D).
    """
    scale = cfg.head_dim**-0.5
    if "qkv" in p:
        # fused projection (prepare_decode_params): one (H, 3H) matmul
        qkv = dense(p["qkv"], x)
        hsz = cfg.hidden_size
        q = split_heads(qkv[..., :hsz], cfg.num_attention_heads) * scale
        k_new = split_heads(qkv[..., hsz : 2 * hsz], cfg.num_attention_heads)
        v_new = split_heads(qkv[..., 2 * hsz :], cfg.num_attention_heads)
    else:
        q = split_heads(dense(p["q"], x), cfg.num_attention_heads) * scale
        k_new = split_heads(dense(p["k"], x), cfg.num_attention_heads)
        v_new = split_heads(dense(p["v"], x), cfg.num_attention_heads)
    dtype = q.dtype
    t_read = past_k.shape[3]
    n_stage = stage_k.shape[0]

    # int8 cache: the per-position scale is constant over D, so it folds
    # out of both dots — scores scale after the q.k dot, value scales
    # into the probs (ops/quantization.py) — and the int8->bf16 convert
    # fuses into the dot operand load (no dequantized buffer in HBM)
    s_past = jnp.einsum("bhqd,bhdk->bhqk", q, past_k.astype(dtype), preferred_element_type=jnp.float32, precision=_precision(q))
    if k_scale is not None:
        s_past = s_past * k_scale[:, :, None, :]
    key_ok = jnp.arange(t_read)[None, None, None, :] < flushed
    if kv_pad_mask is not None:
        key_ok = key_ok & kv_pad_mask[:, None, None, :].astype(bool)
    s_past = jnp.where(key_ok, s_past, NEG_INF)

    s_stage = jnp.einsum("bhqd,cbhd->bhqc", q, stage_k.astype(dtype), preferred_element_type=jnp.float32, precision=_precision(q))
    if stage_k_scale is not None:
        # (STAGE, B, H) -> (B, H, 1, STAGE) scale fold, f32 math
        s_stage = s_stage * jnp.transpose(stage_k_scale, (1, 2, 0))[:, :, None, :].astype(jnp.float32)
    stage_ok = jnp.arange(n_stage)[None, None, None, :] < (index - flushed)
    s_stage = jnp.where(stage_ok, s_stage, NEG_INF)

    s_self = jnp.sum(q * k_new.astype(dtype), axis=-1, keepdims=True).astype(jnp.float32)  # (B,H,1,1)
    s_all = jnp.concatenate([s_past, s_stage, s_self], axis=-1)
    probs = jax.nn.softmax(s_all, axis=-1)
    probs_past = probs[..., :t_read]
    if v_scale is not None:
        # multiply in f32 and downcast the (B,H,1,T) product — converting the
        # stacked scale buffer instead makes XLA materialize a converted copy
        # of the whole (L,B,H,T) buffer every step
        probs_past = probs_past * v_scale[:, :, None, :].astype(jnp.float32)
    probs_past = probs_past.astype(dtype)
    probs_stage = probs[..., t_read : t_read + n_stage]
    if stage_v_scale is not None:
        probs_stage = probs_stage * jnp.transpose(stage_v_scale, (1, 2, 0))[:, :, None, :].astype(jnp.float32)
    probs_stage = probs_stage.astype(dtype)
    out = (
        jnp.einsum("bhqk,bhdk->bhqd", probs_past, past_v.astype(dtype), preferred_element_type=dtype, precision=_precision(q))
        + jnp.einsum("bhqc,cbhd->bhqd", probs_stage, stage_v.astype(dtype), preferred_element_type=dtype, precision=_precision(q))
        + probs[..., -1:].astype(dtype) * v_new.astype(dtype)
    )
    return dense(p["o"], merge_heads(out)), (k_new, v_new)


def _cross_attention(
    p: Params,
    cfg: DecoderConfig,
    x: jnp.ndarray,
    enc: jnp.ndarray | None,
    enc_mask: jnp.ndarray | None,
    cached_kv: tuple[jnp.ndarray, jnp.ndarray] | None,
    attn_key: jnp.ndarray | None = None,
):
    """Cross-attention with optional precomputed K/V (reference ``:287-298``)."""
    scale = cfg.head_dim**-0.5
    q = split_heads(dense(p["q"], x), cfg.num_attention_heads) * scale
    if cached_kv is not None:
        k, v = cached_kv
    else:
        k = split_heads(dense(p["k"], enc), cfg.num_attention_heads)
        v = split_heads(dense(p["v"], enc), cfg.num_attention_heads)

    dtype = q.dtype
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k.astype(dtype), preferred_element_type=jnp.float32, precision=_precision(q))
    if enc_mask is not None:
        scores = jnp.where(enc_mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    if attn_key is not None and cfg.attention_dropout > 0.0:
        probs = dropout(attn_key, probs, cfg.attention_dropout)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(dtype), preferred_element_type=dtype, precision=_precision(q))
    return dense(p["o"], merge_heads(out)), (k, v)


def _cross_attention_decode(
    p: Params,
    cfg: DecoderConfig,
    x: jnp.ndarray,
    ck: jnp.ndarray,
    cv: jnp.ndarray,
    ck_scale: jnp.ndarray | None,
    cv_scale: jnp.ndarray | None,
    enc_mask: jnp.ndarray | None,
):
    """Single-token cross-attention over the dot-native (B, H, S, D) cached
    K/V (see :class:`KVCache` for why this layout).  The int8 per-(head,
    position) scales fold out of both dots exactly as in self-attention.
    Both einsums consume the cache with zero physical relayout — the only
    per-step data movement is the K/V read itself."""
    scale = cfg.head_dim**-0.5
    q = split_heads(dense(p["q"], x), cfg.num_attention_heads) * scale  # (B, H, 1, D)
    dtype = q.dtype
    scores = jnp.einsum(
        "bhqd,bhsd->bhqs", q, ck.astype(dtype),
        preferred_element_type=jnp.float32, precision=_precision(q),
    )
    if ck_scale is not None:
        scores = scores * ck_scale[:, :, None, :].astype(jnp.float32)
    if enc_mask is not None:
        scores = jnp.where(enc_mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    if cv_scale is not None:
        probs = probs * cv_scale[:, :, None, :].astype(jnp.float32)
    probs = probs.astype(dtype)
    out = jnp.einsum(
        "bhqs,bhsd->bhqd", probs, cv.astype(dtype),
        preferred_element_type=dtype, precision=_precision(q),
    )
    return dense(p["o"], merge_heads(out))


def _layer_full(
    lp: Params,
    cfg: DecoderConfig,
    x: jnp.ndarray,
    self_mask,
    enc,
    enc_mask,
    cross_cache,
    flash_ctx=None,
    key: jnp.ndarray | None = None,
):
    """Full-sequence layer (training / prefill).  ``key`` enables train-mode
    dropout at the reference's application sites: attention probs (``:363``),
    residual branches (``:459, 479, 491``), FFN activation (``:489``)."""
    act = ACTIVATIONS[cfg.activation_function]
    if key is not None:
        k_sa, k_r1, k_ca, k_r2, k_act, k_r3 = jax.random.split(key, 6)
    else:
        k_sa = k_r1 = k_ca = k_r2 = k_act = k_r3 = None

    h = layer_norm(lp["ln_self"], x)
    attn_out, self_kv = _self_attention_full(lp["self_attn"], cfg, h, self_mask, flash_ctx, k_sa)
    x = x + dropout(k_r1, attn_out, cfg.dropout)

    cross_kv = None
    if enc is not None or cross_cache is not None:
        h = layer_norm(lp["ln_cross"], x)
        attn_out, cross_kv = _cross_attention(
            lp["cross_attn"], cfg, h, enc, enc_mask, cross_cache, k_ca
        )
        x = x + dropout(k_r2, attn_out, cfg.dropout)

    h = layer_norm(lp["ln_ffn"], x)
    h = dropout(k_act, act(dense(lp["fc1"], h)), cfg.activation_dropout)
    h = dense(lp["fc2"], h)
    return x + dropout(k_r3, h, cfg.dropout), self_kv, cross_kv


def _layer_decode(
    lp: Params,
    cfg: DecoderConfig,
    x: jnp.ndarray,
    past_k,
    past_v,
    stage_k,
    stage_v,
    stage_k_scale,
    stage_v_scale,
    cross_k,
    cross_v,
    cross_k_scale,
    cross_v_scale,
    enc_mask,
    index,
    flushed,
    kv_pad_mask=None,
    k_scale=None,
    v_scale=None,
):
    """Single-token cached layer: read-only past, returns new KV slice."""
    act = ACTIVATIONS[cfg.activation_function]
    h = layer_norm(lp["ln_self"], x)
    attn_out, self_kv = _self_attention_decode(
        lp["self_attn"], cfg, h, past_k, past_v, stage_k, stage_v,
        stage_k_scale, stage_v_scale, index, flushed,
        kv_pad_mask, k_scale, v_scale,
    )
    x = x + attn_out

    if cross_k.shape[3]:  # enc_len == 0: decoder-only generation — no text
        # conditioning, cross-attention skipped entirely (the reference's
        # ParlerTTSForCausalLM.generate path, modeling_parler_tts.py:1281-1552;
        # its layers skip encoder_attn when no encoder_hidden_states)
        h = layer_norm(lp["ln_cross"], x)
        attn_out = _cross_attention_decode(
            lp["cross_attn"], cfg, h, cross_k, cross_v, cross_k_scale, cross_v_scale, enc_mask
        )
        x = x + attn_out

    h = layer_norm(lp["ln_ffn"], x)
    h = dense(lp["fc2"], act(dense(lp["fc1"], h)))
    return x + h, self_kv


def forward(
    params: Params,
    cfg: DecoderConfig,
    decoder_input_ids: jnp.ndarray | None = None,
    *,
    inputs_embeds: jnp.ndarray | None = None,
    prompt_hidden_states: jnp.ndarray | None = None,
    encoder_hidden_states: jnp.ndarray | None = None,
    encoder_attention_mask: jnp.ndarray | None = None,
    attention_mask: jnp.ndarray | None = None,
    cache: KVCache | None = None,
    prefill: bool = False,
    train_key: jnp.ndarray | None = None,
    auto_flush: bool = True,
    remat: bool | str = False,
    scan_unroll: int | str | None = None,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, KVCache | None]:
    """Decoder trunk (reference ``ParlerTTSDecoder.forward`` ``:795-978``).

    ``train_key``: PRNG key enabling train-mode dropout + layerdrop in the
    full-sequence path (reference applies ``config.dropout`` on the embedded
    sequence at ``:888``, per-layer dropouts at ``:363, 459-491``, layerdrop
    at ``:912-917``).  ``None`` (the default) is eval mode — identical graphs
    to round 1.  Only valid without a cache (training, not prefill/decode).

    Full-sequence mode (``cache is None`` or ``cache.index == 0`` prefill):
      ``decoder_input_ids`` (B, K, T); prompt hidden states are prepended;
      causal+padding masking over the fused sequence.
    Incremental mode (``cache`` with ``index > 0``): T == 1, no prompt.

    ``attention_mask`` (B, T_fused) covers the *fused* sequence (prompt +
    codec frames), 1 = valid; None = all valid.  Returns (hidden (B, T_fused,
    H), updated cache).  LM heads are applied separately via :func:`logits`.

    ``prefill=True`` declares (statically) that ``cache.index == 0``, which
    lets the full-sequence pallas flash-attention path run over the local
    K/V instead of the whole cache buffer.
    """
    if inputs_embeds is None:
        inputs_embeds = embed_codebooks(params, decoder_input_ids, dtype=dtype)
    if prompt_hidden_states is not None:
        inputs_embeds = jnp.concatenate([prompt_hidden_states.astype(dtype), inputs_embeds], axis=1)

    b, t_fused, _ = inputs_embeds.shape
    past_len = cache.index if cache is not None else 0

    # positions over the fused sequence, offset by past length (reference
    # :881-886 — prompt tokens consume position ids, known reference TODO)
    if cache is not None and not prefill:
        positions = sinusoidal_position_at(past_len, cfg.hidden_size)[None]
    else:
        pos_table = sinusoidal_positions(cfg.max_position_embeddings, cfg.hidden_size)
        positions = lax.dynamic_slice(pos_table, (past_len, 0), (t_fused, cfg.hidden_size))
    x = inputs_embeds + positions.astype(dtype)[None]

    if cache is not None and not prefill:
        assert t_fused == 1, "cached non-prefill forward is single-token decode"

    # local (t_fused, t_fused) causal+padding mask for full-sequence modes
    kv_pad_mask = None
    flash_ctx = None
    self_mask = None
    if cache is None or prefill:
        q_pos = jnp.arange(t_fused)[None, None, :, None]
        key_pos = jnp.arange(t_fused)[None, None, None, :]
        self_mask = key_pos <= q_pos
        if attention_mask is not None:
            self_mask = self_mask & attention_mask[:, None, None, :t_fused].astype(bool)
        if t_fused > 1:
            flash_ctx = (
                attention_mask[:, :t_fused].astype(jnp.int8)
                if attention_mask is not None
                else jnp.ones((b, t_fused), jnp.int8)
            )
    else:
        t_max = cache.self_k.shape[4]
        if attention_mask is not None:
            # the fused mask may be longer than a growing-buffer bucket's
            # buffer (positions past t_max don't exist yet) or shorter than
            # the +STAGE slack (slack positions are always causally masked)
            if attention_mask.shape[1] >= t_max:
                kv_pad_mask = attention_mask[:, :t_max].astype(jnp.int8)
            else:
                kv_pad_mask = jnp.pad(
                    attention_mask, ((0, 0), (0, t_max - attention_mask.shape[1])),
                    constant_values=1,
                ).astype(jnp.int8)

    enc_mask = None
    if encoder_attention_mask is not None:
        enc_mask = encoder_attention_mask[:, None, None, :].astype(bool)

    layers = params["layers"]
    enc = encoder_hidden_states.astype(dtype) if encoder_hidden_states is not None else None

    if cache is None:
        # gradient checkpointing (reference supports_gradient_checkpointing,
        # :514, 921-933): remat each layer in the backward pass.  remat="dots"
        # keeps per-layer matmul outputs (recomputes only elementwise glue —
        # cheap recompute, but the saved (B,T,ffn) dot outputs still cost
        # ~0.25 GB/layer at batch 32 x 10 s and OOM a 16 GB v5e); remat=True/
        # "full" saves ONLY the layer-boundary activations — O(1 layer) HBM,
        # ~1/3 extra FLOPs, and the capacity unlock that lets batch 32 x 30 s
        # train on one chip.
        # prevent_cse=False is the documented setting for remat under
        # lax.scan (the CSE-prevention machinery is unnecessary there and
        # costs real time)
        if remat == "dots":
            # dots policy (+ optional pallas-output saving): the flash
            # kernel's out/lse are pallas_call results, not dot_general
            # results, so the plain dots policy re-runs the flash forward
            # inside the backward.  PARLER_REMAT_SAVE_PALLAS=1 additionally
            # saves pallas outputs (~15 MB/layer at batch 8 x 10 s), which
            # verifiably removes the recompute from the jaxpr (3 -> 2
            # pallas call sites) — but measured step time is IDENTICAL
            # (0.209 s either way on the round-4 champion): the save's HBM
            # write+read cancels the recompute, so the default stays pure
            # dots (no memory cost).
            import os as _os

            _dots = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if _os.environ.get("PARLER_REMAT_SAVE_PALLAS", "0") != "0":
                def policy(prim, *a, **k):
                    return getattr(prim, "name", "") == "pallas_call" or _dots(prim, *a, **k)
            else:
                policy = _dots
            ckpt = lambda f: jax.checkpoint(f, prevent_cse=False, policy=policy)
        elif remat:
            ckpt = lambda f: jax.checkpoint(f, prevent_cse=False)
        else:
            ckpt = lambda f: f
        # ``scan_unroll`` (arg, or PARLER_TRAIN_SCAN_UNROLL env fallback):
        # unroll factor for the layer scan.  The round-4 training roofline
        # measured 24% of the step in dynamic-update-slice fusions that
        # stash per-iteration remat saves into stacked (L, ...) buffers;
        # "full" unroll removes the scan entirely so remat saves become
        # individual buffers with no stacked-stash traffic — measured
        # 0.261 -> 0.220 s/step (+18.6% to 363.6 audio-s/s, 41.3% MFU) on
        # the batch 8 x 10 s dots-remat champion, at a one-time compile
        # cost of 126 s vs 33 s.  Grads are bit-identical under the flag
        # (test_remat_gradients_match).  Caveat: unrolling raises peak HBM
        # (more simultaneously-live buffers) — batch 8 x 30 s fits with the
        # scan but OOMs fully unrolled (22.9 G vs 15.75 G), so this stays
        # opt-in per shape rather than an unconditional default.
        if scan_unroll is None:
            import os as _os

            scan_unroll = _os.environ.get("PARLER_TRAIN_SCAN_UNROLL", "1")
        unroll = (
            cfg.num_hidden_layers
            if scan_unroll == "full"
            else max(1, min(int(scan_unroll), cfg.num_hidden_layers))
        )
        if train_key is None:
            @ckpt
            def scan_body(x, lp):
                x, _, _ = _layer_full(lp, cfg, x, self_mask, enc, enc_mask, None, flash_ctx)
                return x, None

            x, _ = lax.scan(scan_body, x, layers, unroll=unroll)
        else:
            emb_key, lk_key, ld_key = jax.random.split(train_key, 3)
            x = dropout(emb_key, x, cfg.dropout)  # reference :888
            layer_keys = jax.random.split(lk_key, cfg.num_hidden_layers)
            # layerdrop (reference :912-917): per-layer Bernoulli skip
            if cfg.layerdrop > 0.0:
                keep = jax.random.uniform(ld_key, (cfg.num_hidden_layers,)) >= cfg.layerdrop
            else:
                keep = jnp.ones((cfg.num_hidden_layers,), bool)

            @ckpt
            def scan_body(x, s):
                lp, lkey, keep_l = s
                x_new, _, _ = _layer_full(
                    lp, cfg, x, self_mask, enc, enc_mask, None, flash_ctx, key=lkey
                )
                return jnp.where(keep_l, x_new, x), None

            x, _ = lax.scan(scan_body, x, (layers, layer_keys, keep), unroll=unroll)
        new_cache = None
    elif prefill:
        # prefill from index 0: attention over the local sequence only; scan
        # emits each layer's local K/V + cross K/V, merged into the big
        # buffers with ONE batched write (no per-layer buffer re-copies)
        if enc is None:
            # decoder-only generation: no cross-attention anywhere; the
            # zero-length cross buffers pass through untouched
            def scan_body(x, lp):
                x, self_kv, _ = _layer_full(lp, cfg, x, self_mask, None, None, None, flash_ctx)
                return x, (self_kv[0], self_kv[1])

            x, (ks, vs) = lax.scan(scan_body, x, layers)
            cks, ck_scales = cache.cross_k, cache.cross_k_scale
            cvs, cv_scales = cache.cross_v, cache.cross_v_scale
        else:
            def scan_body(x, lp):
                x, self_kv, cross_kv = _layer_full(lp, cfg, x, self_mask, enc, enc_mask, None, flash_ctx)
                return x, (self_kv[0], self_kv[1], cross_kv[0], cross_kv[1])

            x, (ks, vs, cks, cvs) = lax.scan(scan_body, x, layers)
            cks, ck_scales = _store_cross(cks, cache.cross_k)
            cvs, cv_scales = _store_cross(cvs, cache.cross_v)
        ks, k_scales = _store_kv(ks, cache.self_k)
        vs, v_scales = _store_kv(vs, cache.self_v)
        new_cache = KVCache(
            lax.dynamic_update_slice(cache.self_k, ks, (0, 0, 0, 0, 0)),
            lax.dynamic_update_slice(cache.self_v, vs, (0, 0, 0, 0, 0)),
            lax.dynamic_update_slice(cache.self_k_scale, k_scales, (0, 0, 0, 0))
            if k_scales is not None else None,
            lax.dynamic_update_slice(cache.self_v_scale, v_scales, (0, 0, 0, 0))
            if v_scales is not None else None,
            cache.stage_k,
            cache.stage_v,
            cache.stage_k_scale,
            cache.stage_v_scale,
            cks,
            cvs,
            ck_scales,
            cv_scales,
            past_len + t_fused,
            past_len + t_fused,
        )
    else:
        def scan_body(x, s):
            lp, sk, sv, ksc, vsc, stk, stv, stksc, stvsc, ck, cv, cksc, cvsc = s
            x, self_kv = _layer_decode(
                lp, cfg, x, sk, sv, stk, stv, stksc, stvsc, ck, cv, cksc, cvsc,
                enc_mask, past_len, cache.flushed, kv_pad_mask,
                k_scale=ksc, v_scale=vsc,
            )
            return x, (self_kv[0], self_kv[1])

        x, (ks, vs) = lax.scan(
            scan_body,
            x,
            (layers, cache.self_k, cache.self_v, cache.self_k_scale,
             cache.self_v_scale, cache.stage_k, cache.stage_v,
             cache.stage_k_scale, cache.stage_v_scale,
             cache.cross_k, cache.cross_v, cache.cross_k_scale,
             cache.cross_v_scale),
            unroll=_DECODE_UNROLL,
        )
        # append the new position to the stage slab (cheap leading-dim write;
        # see KVCache docstring), quantizing at append when the cache is int8
        slot = past_len - cache.flushed  # 0..STAGE-1
        stage_k_scale, stage_v_scale = cache.stage_k_scale, cache.stage_v_scale
        if cache.stage_k.dtype == jnp.int8:
            from parler_tts_tpu.ops.quantization import quantize_kv

            ks, ks_sc = quantize_kv(ks)  # (L,B,H,1,D) int8, (L,B,H,1) f32
            vs, vs_sc = quantize_kv(vs)
            stage_k_scale = lax.dynamic_update_slice(
                stage_k_scale, jnp.moveaxis(ks_sc.astype(jnp.bfloat16), 3, 1),
                (0, slot, 0, 0),
            )
            stage_v_scale = lax.dynamic_update_slice(
                stage_v_scale, jnp.moveaxis(vs_sc.astype(jnp.bfloat16), 3, 1),
                (0, slot, 0, 0),
            )
        stage_k = lax.dynamic_update_slice(
            cache.stage_k, jnp.moveaxis(ks, 3, 1).astype(cache.stage_k.dtype),
            (0, slot, 0, 0, 0),
        )
        stage_v = lax.dynamic_update_slice(
            cache.stage_v, jnp.moveaxis(vs, 3, 1).astype(cache.stage_v.dtype),
            (0, slot, 0, 0, 0),
        )
        new_cache = KVCache(
            cache.self_k, cache.self_v, cache.self_k_scale, cache.self_v_scale,
            stage_k, stage_v, stage_k_scale, stage_v_scale,
            cache.cross_k, cache.cross_v,
            cache.cross_k_scale, cache.cross_v_scale, past_len + 1,
            cache.flushed,
        )
        if auto_flush:
            # stage full -> bulk flush.  A lax.cond carrying the big cache
            # buffers de-aliases the while carry (measured: per-step
            # whole-buffer relayout copies), so hot loops pass
            # auto_flush=False and call :func:`flush_stage` at static
            # STAGE-step boundaries instead; this branch keeps the simple
            # step-by-step forward() API correct.
            new_cache = lax.cond(
                slot + 1 == cache.stage_k.shape[1], flush_stage, lambda c: c, new_cache
            )

    x = layer_norm(params["final_ln"], x)
    return x, new_cache


def logits(params: Params, hidden: jnp.ndarray, num_labels: int | None = None) -> jnp.ndarray:
    """Fused K LM heads: hidden (B, T, H) -> (B, K, T', V).  When
    ``num_labels`` is given, only the last ``num_labels`` positions are
    projected (the prompt prefix produces no logits — reference
    ``:1148-1149``)."""
    if num_labels is not None:
        hidden = hidden[:, -num_labels:]
    heads = params["lm_heads"]
    if "kernel_q" in heads:
        # int8 heads: per-(codebook, vocab) scale folds out of the H dot
        out = jnp.einsum(
            "bth,khv->bktv", hidden, heads["kernel_q"].astype(hidden.dtype),
            precision=_precision(hidden),
        )
        return out * heads["scale"].astype(hidden.dtype)[None, :, None, :]
    kern = heads["kernel"].astype(hidden.dtype)  # (K, H, V)
    return jnp.einsum("bth,khv->bktv", hidden, kern, precision=_precision(hidden))


def loss_fn(
    lm_logits: jnp.ndarray,
    labels: jnp.ndarray,
    decoder_input_ids: jnp.ndarray,
    cfg: DecoderConfig,
    ignore_id: int = -100,
) -> jnp.ndarray:
    """Per-codebook masked CE averaged over K (reference ``:1145-1169``).

    lm_logits: (B, K, T, V); labels: (B, K, T) with ``ignore_id`` holes;
    decoder_input_ids: (B, K, T) — positions whose *input* is EOS are
    excluded so only one EOS per codebook contributes (reference ``:1157``).
    Per-codebook means use each codebook's own valid count, then the K means
    are averaged, exactly like the reference's loop.
    """
    labels = jnp.where(labels == cfg.bos_token_id, ignore_id, labels)
    mask = (decoder_input_ids != cfg.eos_token_id) & (labels != ignore_id)

    logp = jax.nn.log_softmax(lm_logits.astype(jnp.float32), axis=-1)
    safe_labels = jnp.where(mask, labels, 0)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    per_cb_sum = jnp.sum(jnp.where(mask, -token_ll, 0.0), axis=(0, 2))  # (K,)
    per_cb_cnt = jnp.maximum(jnp.sum(mask, axis=(0, 2)), 1)  # (K,)
    return jnp.mean(per_cb_sum / per_cb_cnt)


def init(key, cfg: DecoderConfig) -> Params:
    """Random init: normal(0, initializer_factor) for linears/embeddings
    (reference ``:517-526``), ones/zeros for layer norms."""
    std = cfg.initializer_factor
    h, f, k_cb, v1 = cfg.hidden_size, cfg.ffn_dim, cfg.num_codebooks, cfg.vocab_size + 1
    l = cfg.num_hidden_layers
    keys = iter(jax.random.split(key, 32))

    def lin(kk, nin, nout):
        # stacked across layers: (L, nin, nout)
        return {"kernel": normal_init(kk, (l, nin, nout), std)}

    def ln():
        return {"scale": jnp.ones((l, h)), "bias": jnp.zeros((l, h))}

    layers = {
        "self_attn": {n: lin(next(keys), h, h) for n in ("q", "k", "v", "o")},
        "ln_self": ln(),
        "cross_attn": {n: lin(next(keys), h, h) for n in ("q", "k", "v", "o")},
        "ln_cross": ln(),
        "fc1": lin(next(keys), h, f),
        "fc2": lin(next(keys), f, h),
        "ln_ffn": ln(),
    }
    return {
        "embed_tokens": {"embedding": normal_init(next(keys), (k_cb, v1, h), std)},
        "layers": layers,
        "final_ln": {"scale": jnp.ones((h,)), "bias": jnp.zeros((h,))},
        "lm_heads": {"kernel": normal_init(next(keys), (k_cb, h, cfg.vocab_size), std)},
    }


def stack_layer_params(layer_list: list[Params]) -> Params:
    """List of per-layer trees -> single tree with leading (L, ...) axes
    (importer helper; the torch reference stores layers separately)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_list)
