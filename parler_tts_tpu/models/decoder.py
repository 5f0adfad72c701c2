"""MusicGen-style multi-codebook decoder LM, TPU-native.

Semantic equivalent of the reference's ``ParlerTTSDecoder`` /
``ParlerTTSForCausalLM`` (``/root/reference/parler_tts/modeling_parler_tts.py:
755-1552``), redesigned for XLA:

* **Stacked layer parameters** — every per-layer weight carries a leading
  ``(num_layers, ...)`` axis and the block stack runs under ``lax.scan``:
  one compiled layer body instead of 24 unrolled copies (fast compiles, and
  XLA pipelines the weight loads from HBM).
* **Static-shape KV cache** — ``(L, B, H, T_max, D)`` buffers updated with
  ``dynamic_update_slice`` at a scalar ``index``; cross-attention K/V are
  computed once at prefill (reference caches them per-layer at
  ``modeling_parler_tts.py:287-298``).
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


class KVCache(NamedTuple):
    """Static-shape decode cache.

    self_k/self_v: (L, B, H, T_max, D) — self-attention keys/values at
    absolute fused positions (prompt prefix + codec frames).
    cross_k/cross_v: (L, B, H, S, D) — description keys/values, filled at
    prefill, read-only afterwards.
    index: scalar int32 — number of fused positions already written.
    """

    self_k: jnp.ndarray
    self_v: jnp.ndarray
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray
    index: jnp.ndarray


def init_cache(
    cfg: DecoderConfig, batch: int, max_len: int, enc_len: int, dtype=jnp.float32
) -> KVCache:
    l, h, d = cfg.num_hidden_layers, cfg.num_attention_heads, cfg.head_dim
    return KVCache(
        self_k=jnp.zeros((l, batch, h, max_len, d), dtype),
        self_v=jnp.zeros((l, batch, h, max_len, d), dtype),
        cross_k=jnp.zeros((l, batch, h, enc_len, d), dtype),
        cross_v=jnp.zeros((l, batch, h, enc_len, d), dtype),
        index=jnp.zeros((), jnp.int32),
    )


def embed_codebooks(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    """Sum of per-codebook embeddings (reference ``:836``).
    ids: (B, K, T) -> (B, T, H).  Single gather over the offset-flattened
    (K*(vocab+1), H) table."""
    tables = params["embed_tokens"]["embedding"]  # (K, V+1, H)
    k, v1, h = tables.shape
    flat = tables.reshape(k * v1, h)
    offset_ids = ids + (jnp.arange(k, dtype=ids.dtype) * v1)[None, :, None]
    gathered = jnp.take(flat, offset_ids, axis=0)  # (B, K, T, H)
    return jnp.sum(gathered, axis=1)


def _self_attention(
    p: Params,
    cfg: DecoderConfig,
    x: jnp.ndarray,
    mask: jnp.ndarray | None,
    cache_kv: tuple[jnp.ndarray, jnp.ndarray] | None,
    index: jnp.ndarray | None,
    kv_pad_mask: jnp.ndarray | None = None,
    flash_ctx: jnp.ndarray | None = None,
):
    """Returns (out, (k, v)) — k/v are the updated full-length buffers when a
    cache is used, else the sequence k/v.

    Single-token cached decode uses the pallas ``decode_attention`` kernel on
    TPU: only the valid prefix of the KV buffer is streamed from HBM
    (``ops/pallas/decode_attention.py``); ``kv_pad_mask`` (B, T_max) carries
    prompt left-padding.
    """
    scale = cfg.head_dim**-0.5
    q = split_heads(dense(p["q"], x), cfg.num_attention_heads) * scale
    k = split_heads(dense(p["k"], x), cfg.num_attention_heads)
    v = split_heads(dense(p["v"], x), cfg.num_attention_heads)
    k_local, v_local = k, v

    if cache_kv is not None:
        ck, cv = cache_kv
        k = lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, index, 0))
        v = lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, index, 0))

    dtype = q.dtype
    if q.shape[2] > 1 and flash_ctx is not None and runtime_flags.use_pallas():
        # full-sequence (training / prefill-from-0) path: pallas flash
        # attention over the locally-computed K/V — no score materialization
        from parler_tts_tpu.ops.pallas.flash_attention import flash_attention_bhtd

        kv_mask2d = flash_ctx
        out = flash_attention_bhtd(
            q, k_local.astype(dtype), v_local.astype(dtype), kv_mask2d,
            scale=1.0, causal=True,  # q pre-scaled
        )
    elif cache_kv is not None and q.shape[2] == 1 and runtime_flags.use_pallas():
        from parler_tts_tpu.ops.pallas.decode_attention import decode_attention

        b, h, t_max, d = k.shape
        start = None
        if kv_pad_mask is not None:
            # padding is a contiguous left prefix (left-padded prompts):
            # first valid position per row, broadcast over heads
            row_start = jnp.argmax(kv_pad_mask != 0, axis=1).astype(jnp.int32)  # (B,)
            start = jnp.repeat(row_start, h)
        out = decode_attention(
            q.reshape(b * h, 1, d),
            k.reshape(b * h, t_max, d).astype(dtype),
            v.reshape(b * h, t_max, d).astype(dtype),
            index + 1,
            start,
            scale=1.0,  # q is pre-scaled
        ).reshape(b, h, 1, d)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k.astype(dtype), preferred_element_type=jnp.float32, precision=_precision(q))
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(dtype), preferred_element_type=dtype, precision=_precision(q))
    return dense(p["o"], merge_heads(out)), (k, v)


def _cross_attention(
    p: Params,
    cfg: DecoderConfig,
    x: jnp.ndarray,
    enc: jnp.ndarray | None,
    enc_mask: jnp.ndarray | None,
    cached_kv: tuple[jnp.ndarray, jnp.ndarray] | None,
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
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(dtype), preferred_element_type=dtype, precision=_precision(q))
    return dense(p["o"], merge_heads(out)), (k, v)


def _layer(
    lp: Params,
    cfg: DecoderConfig,
    x: jnp.ndarray,
    self_mask,
    enc,
    enc_mask,
    self_cache,
    cross_cache,
    index,
    kv_pad_mask=None,
    flash_ctx=None,
):
    act = ACTIVATIONS[cfg.activation_function]
    h = layer_norm(lp["ln_self"], x)
    attn_out, self_kv = _self_attention(
        lp["self_attn"], cfg, h, self_mask, self_cache, index, kv_pad_mask, flash_ctx
    )
    x = x + attn_out

    cross_kv = None
    if enc is not None or cross_cache is not None:
        h = layer_norm(lp["ln_cross"], x)
        attn_out, cross_kv = _cross_attention(lp["cross_attn"], cfg, h, enc, enc_mask, cross_cache)
        x = x + attn_out

    h = layer_norm(lp["ln_ffn"], x)
    h = dense(lp["fc2"], act(dense(lp["fc1"], h)))
    return x + h, self_kv, cross_kv


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
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, KVCache | None]:
    """Decoder trunk (reference ``ParlerTTSDecoder.forward`` ``:795-978``).

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
        inputs_embeds = embed_codebooks(params, decoder_input_ids).astype(dtype)
    if prompt_hidden_states is not None:
        inputs_embeds = jnp.concatenate([prompt_hidden_states.astype(dtype), inputs_embeds], axis=1)

    b, t_fused, _ = inputs_embeds.shape
    past_len = cache.index if cache is not None else 0

    # positions over the fused sequence, offset by past length (reference
    # :881-886 — prompt tokens consume position ids, known reference TODO)
    pos_table = sinusoidal_positions(cfg.max_position_embeddings, cfg.hidden_size)
    positions = lax.dynamic_slice(pos_table, (past_len, 0), (t_fused, cfg.hidden_size))
    x = inputs_embeds + positions.astype(dtype)[None]

    # self-attention mask: causal over absolute fused positions + padding
    kv_pad_mask = None
    flash_ctx = None
    if t_fused > 1 and (cache is None or prefill):
        flash_ctx = (
            attention_mask[:, :t_fused].astype(jnp.int8)
            if attention_mask is not None
            else jnp.ones((b, t_fused), jnp.int8)
        )
    if cache is not None:
        t_max = cache.self_k.shape[3]
        key_pos = jnp.arange(t_max)[None, None, None, :]
        q_pos = past_len + jnp.arange(t_fused)[None, None, :, None]
        self_mask = key_pos <= q_pos  # (1,1,T,Tmax)
        if attention_mask is not None:
            pad = jnp.pad(attention_mask, ((0, 0), (0, t_max - attention_mask.shape[1])), constant_values=1)
            self_mask = self_mask & pad[:, None, None, :].astype(bool)
            kv_pad_mask = pad.astype(jnp.int8)
    else:
        q_pos = jnp.arange(t_fused)[None, None, :, None]
        key_pos = jnp.arange(t_fused)[None, None, None, :]
        self_mask = key_pos <= q_pos
        if attention_mask is not None:
            self_mask = self_mask & attention_mask[:, None, None, :].astype(bool)

    enc_mask = None
    if encoder_attention_mask is not None:
        enc_mask = encoder_attention_mask[:, None, None, :].astype(bool)

    layers = params["layers"]
    use_cross_cache = cache is not None and encoder_hidden_states is None
    enc = None if use_cross_cache else (
        encoder_hidden_states.astype(dtype) if encoder_hidden_states is not None else None
    )

    if cache is not None:
        def scan_body(x, s):
            lp, sk, sv, ck, cv = s
            x, self_kv, cross_kv = _layer(
                lp, cfg, x, self_mask, enc, enc_mask, (sk, sv),
                (ck, cv) if use_cross_cache else None, past_len, kv_pad_mask, flash_ctx,
            )
            new_ck, new_cv = cross_kv if cross_kv is not None else (ck, cv)
            return x, (self_kv[0], self_kv[1], new_ck, new_cv)

        x, (nsk, nsv, nck, ncv) = lax.scan(
            scan_body, x, (layers, cache.self_k, cache.self_v, cache.cross_k, cache.cross_v)
        )
        new_cache = KVCache(nsk, nsv, nck, ncv, past_len + t_fused)
    else:
        def scan_body(x, lp):
            x, _, _ = _layer(lp, cfg, x, self_mask, enc, enc_mask, None, None, 0, None, flash_ctx)
            return x, None

        x, _ = lax.scan(scan_body, x, layers)
        new_cache = None

    x = layer_norm(params["final_ln"], x)
    return x, new_cache


def logits(params: Params, hidden: jnp.ndarray, num_labels: int | None = None) -> jnp.ndarray:
    """Fused K LM heads: hidden (B, T, H) -> (B, K, T', V).  When
    ``num_labels`` is given, only the last ``num_labels`` positions are
    projected (the prompt prefix produces no logits — reference
    ``:1148-1149``)."""
    if num_labels is not None:
        hidden = hidden[:, -num_labels:]
    kern = params["lm_heads"]["kernel"].astype(hidden.dtype)  # (K, H, V)
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
