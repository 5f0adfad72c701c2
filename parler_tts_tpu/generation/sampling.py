"""Logits processors and samplers for multi-codebook decoding.

Static-shape JAX equivalents of the HF logits-processor chain the reference
relies on (``/root/reference/parler_tts/modeling_parler_tts.py:2543-2620``):
classifier-free guidance combine, temperature, top-k, top-p, then categorical
sampling (or argmax for greedy) applied per ``(batch, codebook)`` row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parler_tts_tpu.core.config import GenerationConfig

NEG_INF = -1e9


def apply_cfg(cond: jnp.ndarray, uncond: jnp.ndarray, scale: float) -> jnp.ndarray:
    """HF ``ClassifierFreeGuidanceLogitsProcessor``:
    ``uncond + scale * (cond - uncond)``."""
    return uncond + scale * (cond - uncond)


def apply_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    return logits / temperature


def _total_order(x: jnp.ndarray):
    """Bitcast floats to unsigned ints whose ``<`` matches the float ``<``
    (IEEE total order: flip all bits of negatives, set the sign bit of
    non-negatives).  Works for bf16/f16 (16-bit) and f32."""
    bits = jnp.dtype(x.dtype).itemsize * 8
    ui = jnp.uint16 if bits == 16 else jnp.uint32
    si = jnp.int16 if bits == 16 else jnp.int32
    u = jax.lax.bitcast_convert_type(x, ui)
    neg = jax.lax.bitcast_convert_type(x, si) < 0
    sign = jnp.asarray(1 << (bits - 1), ui)
    return jnp.where(neg, ~u, u | sign), bits, ui


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k highest logits per row, mask the rest (HF TopKLogitsWarper).

    Only the k-th largest *value* is needed as a threshold.  Instead of a
    sort — XLA's TPU sort costs ~265 us/step on (32, 9, 1088) bf16 decode
    logits; ``lax.top_k`` (a full value+index pair sort) ~2x that — the
    threshold is found EXACTLY by bitwise bisection over the IEEE total
    order: ``bits`` sequential compare+count reductions (16 for bf16),
    each a cheap VPU pass over the row.

    The bisection runs as a ``fori_loop``, NOT a Python unroll: unrolled, the
    16-32 reduction subgraphs inlined into every decode-loop body blew the
    remote XLA compile up from ~90 s to ~370 s for the Mini batch-64 generate
    program (round-3 measurement, /tmp compile sweep — throughput was
    identical), so the rolled form trades an immeasurable per-step loop
    overhead for a 4x faster cold start."""
    k = min(k, logits.shape[-1])
    if k == logits.shape[-1]:
        return logits
    u, bits, ui = _total_order(logits)
    one = jnp.asarray(1, ui)

    # invariant: count(u >= lo) >= k; final lo = total-order image of the
    # k-th largest value (ties at the threshold are kept, matching the
    # sort-based ``logits < sorted[n-k]`` masking)
    def body(i, lo):
        mid = lo | (one << jnp.asarray(bits - 1 - i, ui))
        cnt = jnp.sum((u >= mid[..., None]).astype(jnp.int32), axis=-1)
        return jnp.where(cnt >= k, mid, lo)

    lo = jax.lax.fori_loop(0, bits, body, jnp.zeros(logits.shape[:-1], ui))
    return jnp.where(u < lo[..., None], NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering (HF TopPLogitsWarper, min_tokens_to_keep=1)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < p; always keep top-1
    keep_sorted = jnp.roll(cum, 1, axis=-1).at[..., 0].set(0.0) < p
    kth = jnp.where(keep_sorted, sorted_logits, jnp.inf).min(axis=-1, keepdims=True)
    return jnp.where(logits < kth, NEG_INF, logits)


def process_logits(logits: jnp.ndarray, gen: GenerationConfig) -> jnp.ndarray:
    """Temperature/top-k/top-p chain in HF's warper order."""
    if gen.do_sample and gen.temperature not in (None, 1.0):
        logits = apply_temperature(logits, gen.temperature)
    if gen.do_sample and gen.top_k and gen.top_k > 0:
        logits = apply_top_k(logits, gen.top_k)
    if gen.do_sample and gen.top_p is not None and gen.top_p < 1.0:
        logits = apply_top_p(logits, gen.top_p)
    return logits


def select_tokens(key, logits: jnp.ndarray, gen: GenerationConfig) -> jnp.ndarray:
    """logits (..., V) -> token ids (...). Greedy argmax or categorical."""
    if gen.do_sample:
        return jax.random.categorical(key, logits.astype(jnp.float32), axis=-1)
    return jnp.argmax(logits, axis=-1)
