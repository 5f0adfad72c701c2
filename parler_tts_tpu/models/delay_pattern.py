"""Delay-pattern scheduler for multi-codebook codec-token generation.

TPU-native re-design of the reference's delay-pattern utilities
(``/root/reference/parler_tts/modeling_parler_tts.py:68-139``): codebook ``k``
is shifted right by ``k`` steps so a single transformer step predicts all K
codebooks at once.  For 4 codebooks and max length 8 the pattern is::

    [B, -1, -1, -1, -1,  P,  P,  P]
    [B,  B, -1, -1, -1, -1,  P,  P]
    [B,  B,  B, -1, -1, -1, -1,  P]
    [B,  B,  B,  B, -1, -1, -1, -1]

where ``B``/``P`` are BOS/PAD specials and ``-1`` marks positions the model
must predict.  Differences from the reference, chosen for XLA:

* everything is built with broadcasted iota comparisons — no Python loops over
  codebooks, no ``nonzero`` (dynamic shapes);
* arrays are ``(batch, K, T)`` (the reference flattens to ``(batch*K, T)``);
* the "first position to generate" is a *static* Python int derived from the
  prompt length, so jitted decode loops get static trip counts.

All functions are pure and jit-safe; the ``-1`` sentinel is data, never shape.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def build_delay_pattern(
    input_ids: jnp.ndarray,
    *,
    bos_token_id: int,
    pad_token_id: int,
    max_length: int,
) -> tuple[jnp.ndarray, jnp.ndarray, int]:
    """Build the delayed pattern mask.

    Args:
      input_ids: ``(batch, K, seq_len)`` int array of decoder prompt ids
        (typically just the BOS start frame, ``seq_len == 1``; longer for
        audio-prompted continuation).
      bos_token_id / pad_token_id: special ids filling the lower/upper
        triangular regions (reference ``modeling_parler_tts.py:113-124``).
      max_length: static total sequence length of the pattern.

    Returns:
      ``(prompt_ids, pattern, first_start_id)`` where ``pattern`` is
      ``(batch, K, max_length)`` holding forced tokens with ``-1`` at
      positions to be predicted; ``prompt_ids`` is ``input_ids`` trimmed to
      ``first_start_id`` (static length); ``first_start_id`` is the first
      decode position (a Python int).
    """
    input_ids = jnp.asarray(input_ids, dtype=jnp.int32)
    batch, num_codebooks, seq_len = input_ids.shape

    # short-sequence escape hatch, reference modeling_parler_tts.py:104-106
    if max_length < 2 * num_codebooks - 1:
        pattern = jnp.full((batch, num_codebooks, max_length), -1, dtype=input_ids.dtype)
        return input_ids, pattern, seq_len

    t = jnp.arange(max_length)[None, :]  # (1, T)
    k = jnp.arange(num_codebooks)[:, None]  # (K, 1)

    # codebook k's prompt occupies columns [k, k + seq_len)
    shifted = jnp.full((batch, num_codebooks, max_length), -1, dtype=input_ids.dtype)
    # scatter prompt into the shifted layout: column t holds prompt[t - k]
    src_idx = jnp.clip(t - k, 0, seq_len - 1)  # (K, T)
    in_prompt = (t >= k) & (t < k + seq_len)  # (K, T)
    gathered = jnp.take_along_axis(
        input_ids, jnp.broadcast_to(src_idx[None], (batch, num_codebooks, max_length)), axis=2
    )
    shifted = jnp.where(in_prompt[None], gathered, shifted)

    # BOS region: *inclusive* lower triangle t <= k (reference uses
    # tril(ones) with default diagonal at modeling_parler_tts.py:113-124, so
    # row k has k+1 leading BOS — position 0 of the prompt is overwritten,
    # which is a no-op in practice since the start frame is BOS anyway).
    bos_region = t <= k  # (K, T)
    pad_region = t >= (max_length - (num_codebooks - 1) + k)  # triu(diagonal=T-K+1)

    pattern = jnp.where(bos_region[None], jnp.asarray(bos_token_id, input_ids.dtype), shifted)
    pattern = jnp.where(pad_region[None], jnp.asarray(pad_token_id, input_ids.dtype), pattern)

    # first -1 in codebook 0 is at seq_len (codebook 0 is unshifted, its
    # prompt occupies [0, seq_len), col 0 forced to BOS); if the prompt runs
    # into the PAD region there are no -1s and the reference falls back to
    # seq_len too (modeling_parler_tts.py:131-135).  Static by construction.
    first_start_id = seq_len
    # the reference returns the *pattern* prefix (prompt with BOS/PAD forced),
    # not the raw prompt — modeling_parler_tts.py:137-138
    return pattern[..., :first_start_id], pattern, first_start_id


def apply_delay_pattern(input_ids: jnp.ndarray, pattern: jnp.ndarray) -> jnp.ndarray:
    """Force known BOS/PAD/prompt frames around model predictions.

    Reference semantics (``modeling_parler_tts.py:68-74``):
    ``where(pattern == -1, input_ids, pattern)`` with the pattern cropped to
    the current sequence length.
    """
    seq_len = input_ids.shape[-1]
    pattern = pattern[..., :seq_len]
    return jnp.where(pattern == -1, input_ids, pattern)


def undelay_pattern(output_ids: jnp.ndarray) -> jnp.ndarray:
    """Invert the delay: shift codebook ``k`` left by ``k`` steps.

    Input ``(batch, K, T)`` → output ``(batch, K, T - K + 1)`` of "aligned"
    codec frames.  This is the static-shape equivalent of the reference's
    rebuild-mask-then-boolean-filter undelay (``modeling_parler_tts.py:
    1537-1546, 2636-2645``): after the left-shift, the first ``T-K+1``
    columns of every codebook row hold exactly the tokens the reference's
    mask filter keeps (model predictions, BOS/PAD stripped).
    """
    batch, num_codebooks, seq_len = output_ids.shape
    out_len = seq_len - num_codebooks + 1
    if out_len <= 0:
        return output_ids[..., :0]
    t = jnp.arange(out_len)[None, :]  # (1, T')
    k = jnp.arange(num_codebooks)[:, None]  # (K, 1)
    idx = jnp.broadcast_to((t + k)[None], (batch, num_codebooks, out_len))
    return jnp.take_along_axis(output_ids, idx, axis=2)


def build_delay_pattern_labels(
    codes: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    bos_token_id: int,
    eos_token_id: int,
    max_length: int,
    ignore_id: int = -100,
) -> jnp.ndarray:
    """Build training labels in the delay pattern from raw codec codes.

    Static-shape equivalent of the training script's label construction
    (``/root/reference/training/run_parler_tts_training.py:1164-1213``):
    prepend one BOS frame, delay codebook ``k`` by ``k``, fill beyond the data
    with EOS, then drop the all-BOS first timestep.  Per sample of length
    ``L``, label row ``k`` is therefore::

        [BOS]*k + codes_k[:L] + [EOS]*(K-k) + [ignore]*padding

    i.e. *real* BOS tokens in the delay region (the reference masks them to
    -100 inside the loss, ``modeling_parler_tts.py:1155`` — our
    :func:`~parler_tts_tpu.models.decoder.loss_fn` does the same), EOS fill to
    ``L + K`` per sample (extra EOS positions are excluded from the loss
    because their *inputs* are EOS, reference ``:1157``), ``ignore_id`` for
    batch padding beyond (the reference collator pads with -100,
    ``run_parler_tts_training.py:551-555``).  Keeping BOS in the labels is
    load-bearing: ``labels_to_decoder_inputs`` right-shifts the labels into
    decoder inputs, so codebook ``k`` sees BOS at positions ``0..k`` during
    training — exactly what the delay pattern forces at inference.

    Args:
      codes: ``(batch, K, T_codes)`` raw (un-delayed) codec tokens, right
        padded arbitrarily past each sample's true length.
      lengths: ``(batch,)`` true code lengths per sample.
      max_length: static label length ``T``; must fit ``T_codes + K`` for the
        longest sample.

    Returns:
      ``(batch, K, max_length)`` labels as above.
    """
    codes = jnp.asarray(codes, dtype=jnp.int32)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    batch, num_codebooks, t_codes = codes.shape
    t = jnp.arange(max_length)[None, None, :]  # (1,1,T)
    k = jnp.arange(num_codebooks)[None, :, None]  # (1,K,1)
    lens = lengths[:, None, None]  # (B,1,1)

    # after BOS prepend + delay + first-timestep drop, codebook k's data
    # occupies [k, k + len)
    src = jnp.clip(t - k, 0, t_codes - 1)
    gathered = jnp.take_along_axis(
        codes, jnp.broadcast_to(src, (batch, num_codebooks, max_length)), axis=2
    )
    in_data = (t >= k) & (t < k + lens)
    eos_region = (t >= k + lens) & (t < lens + num_codebooks)

    labels = jnp.full((batch, num_codebooks, max_length), ignore_id, dtype=codes.dtype)
    labels = jnp.where(t < k, jnp.asarray(bos_token_id, codes.dtype), labels)
    labels = jnp.where(in_data, gathered, labels)
    labels = jnp.where(eos_region, jnp.asarray(eos_token_id, codes.dtype), labels)
    return labels


def labels_to_decoder_inputs(
    labels: jnp.ndarray,
    *,
    bos_token_id: int,
    pad_token_id: int,
    ignore_id: int = -100,
) -> jnp.ndarray:
    """``shift_tokens_right`` over delay-pattern labels.

    Reference: ``modeling_parler_tts.py:2023-2026`` builds
    ``decoder_input_ids = shift_tokens_right(labels, pad_id, bos_id)`` —
    right-shift by one, BOS at position 0, ``-100`` replaced by PAD.
    Input/output ``(batch, K, T)``.
    """
    shifted = jnp.roll(labels, 1, axis=-1)
    shifted = shifted.at[..., 0].set(bos_token_id)
    return jnp.where(shifted == ignore_id, jnp.asarray(pad_token_id, labels.dtype), shifted)
