"""Static-shape autoregressive generation engine.

TPU-native redesign of ``ParlerTTSForConditionalGeneration.generate``
(``/root/reference/parler_tts/modeling_parler_tts.py:2342-2686``, call stack
SURVEY.md §3.1):

* steps 4-10 (text encode, CFG null rows, prompt embed, delay-pattern build,
  prefill) are one jitted **prefill**;
* step 11 (the hot loop) is a ``lax.while_loop`` over a static-shape token
  buffer and KV cache — one decoder step per codec frame, all K codebooks
  sampled at once, with early exit once every ``(batch, codebook)`` stream
  has emitted EOS (the reference's dynamic stopping criteria, made
  shape-static);
* steps 12-13 (undelay + DAC vocode) are batched masked computation instead
  of the reference's per-sample Python trim loop (``:2664-2680``).

Everything compiles once per ``(batch, prompt_len, desc_len, max_length)``
bucket.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from parler_tts_tpu.core.config import GenerationConfig, ParlerTTSConfig
from parler_tts_tpu.models import codec as codec_mod
from parler_tts_tpu.models import decoder as decoder_mod
from parler_tts_tpu.models import parler
from parler_tts_tpu.models.delay_pattern import build_delay_pattern, undelay_pattern
from parler_tts_tpu.generation import sampling
from parler_tts_tpu.ops.nn import Params


class GenerateOutput(NamedTuple):
    """tokens: raw delayed ids (B, K, max_length); codes: undelayed clean
    codec codes (B, K, T_codes); code_lengths: valid frames per sample;
    audio: (B, T_codes*hop) waveform; audio_lengths: valid samples per
    sample."""

    tokens: jnp.ndarray
    codes: jnp.ndarray
    code_lengths: jnp.ndarray
    audio: jnp.ndarray
    audio_lengths: jnp.ndarray


class DecodeState(NamedTuple):
    t: jnp.ndarray  # current position being generated (scalar int32)
    tokens: jnp.ndarray  # (B, K, max_length) delayed buffer
    finished: jnp.ndarray  # (B, K) bool — stream emitted EOS
    cache: decoder_mod.KVCache
    logits: jnp.ndarray  # (rows, K, V) logits predicting position t
    key: jnp.ndarray


def _decoder_rows(x: jnp.ndarray, use_cfg: bool) -> jnp.ndarray:
    """CFG duplicates the batch rows: [cond; uncond] (reference :1214-1229)."""
    return jnp.concatenate([x, x], axis=0) if use_cfg else x


def generate_tokens(
    params: Params,
    cfg: ParlerTTSConfig,
    gen: GenerationConfig,
    *,
    input_ids: jnp.ndarray | None = None,
    attention_mask: jnp.ndarray | None = None,
    prompt_input_ids: jnp.ndarray | None = None,
    prompt_attention_mask: jnp.ndarray | None = None,
    prompt_hidden_states: jnp.ndarray | None = None,
    decoder_input_codes: jnp.ndarray | None = None,
    key: jnp.ndarray,
    max_length: int | None = None,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run prefill + decode loop; returns (delayed tokens (B, K, T), final
    decode step index).  Pure & jittable with static ``max_length``.

    ``decoder_input_codes`` (B, K, T_audio) enables audio-prompted voice
    continuation: raw codec codes (from ``dac.encode`` of a voice sample) are
    placed after the BOS start frame, exactly like the reference's
    ``input_values`` path (``modeling_parler_tts.py:2247-2292, 2483-2487``).

    ``input_ids=None`` disables text conditioning entirely (no T5 encode, no
    cross-attention in any layer) and ``prompt_input_ids=None`` drops the
    prompt prefix — together they form the standalone decoder-only path of
    the reference's ``ParlerTTSForCausalLM.generate`` (``:1281-1552``).
    ``prompt_hidden_states`` (B, P, H) bypasses ``embed_prompts`` — the
    decoder-only API surface, where the caller supplies embedded prompts
    directly (reference ``:1193, 1222-1224``).
    """
    dcfg = cfg.decoder
    num_codebooks = dcfg.num_codebooks
    for ref_arr in (input_ids, prompt_input_ids, prompt_hidden_states, decoder_input_codes):
        if ref_arr is not None:
            b = ref_arr.shape[0]
            break
    else:
        raise ValueError("need input_ids, prompt_input_ids, or decoder_input_codes for the batch size")
    max_length = max_length or gen.max_length
    use_cfg = gen.guidance_scale is not None and gen.guidance_scale > 1.0

    if attention_mask is None and input_ids is not None:
        attention_mask = jnp.ones(input_ids.shape, jnp.int32)
    if prompt_attention_mask is None and prompt_input_ids is not None:
        prompt_attention_mask = jnp.ones(prompt_input_ids.shape, jnp.int32)
    if prompt_attention_mask is None and prompt_hidden_states is not None:
        prompt_attention_mask = jnp.ones(prompt_hidden_states.shape[:2], jnp.int32)

    # --- text encode + CFG null rows (reference :2197-2241) ---
    if input_ids is not None:
        enc_hidden = parler.encode_text(params, cfg, input_ids, attention_mask, dtype=dtype)
        enc_mask = attention_mask
        if use_cfg:
            enc_hidden = jnp.concatenate([enc_hidden, jnp.zeros_like(enc_hidden)], axis=0)
            enc_mask = jnp.concatenate([enc_mask, jnp.zeros_like(enc_mask)], axis=0)
    else:
        enc_hidden = enc_mask = None

    # --- prompt embed; CFG row duplication.  Composite path (text
    # conditioning present): the prompt rows are *repeated* — guidance is on
    # the description only (reference composite prepare_inputs :2109-2118).
    # Decoder-only path (input_ids=None): the null half gets ZEROED prompt
    # hidden states + zeroed prompt mask — guidance is on the prompt itself
    # (reference ParlerTTSForCausalLM.prepare_inputs :1214-1229) ---
    if prompt_hidden_states is not None:
        prompt_hidden = prompt_hidden_states.astype(dtype)
    elif prompt_input_ids is not None:
        prompt_hidden = parler.embed_prompts(params, prompt_input_ids, dtype=dtype)
    else:
        prompt_hidden = None
    if prompt_hidden is not None:
        p_mask = prompt_attention_mask
        if use_cfg:
            if input_ids is None:
                prompt_hidden = jnp.concatenate(
                    [prompt_hidden, jnp.zeros_like(prompt_hidden)], axis=0
                )
                p_mask = jnp.concatenate([p_mask, jnp.zeros_like(p_mask)], axis=0)
            else:
                prompt_hidden = jnp.concatenate([prompt_hidden, prompt_hidden], axis=0)
                p_mask = jnp.concatenate([p_mask, p_mask], axis=0)
    else:
        p_mask = jnp.zeros((b, 0), jnp.int32)

    # --- delay pattern over the un-duplicated batch (reference :2529-2537) ---
    start_ids = jnp.full((b, num_codebooks, 1), gen.decoder_start_token_id, jnp.int32)
    if decoder_input_codes is not None:
        start_ids = jnp.concatenate([start_ids, decoder_input_codes.astype(jnp.int32)], axis=2)
    _, pattern, t0 = build_delay_pattern(
        start_ids,
        bos_token_id=gen.bos_token_id,
        pad_token_id=gen.pad_token_id,
        max_length=max_length,
    )
    tokens = jnp.where(pattern == -1, gen.pad_token_id, pattern)

    # --- prefill: prompt + start frame ---
    rows = 2 * b if use_cfg else b
    p_len = prompt_hidden.shape[1] if prompt_hidden is not None else 0
    if prompt_hidden is None:
        p_mask = jnp.zeros((rows, 0), jnp.int32)
    # growing-buffer length buckets: the cache is allocated at the first
    # bucket's fused length and zero-padded (grow_cache) at each bucket
    # transition, so attention reads a dense buffer sized to the current
    # generated length (see the loop-nest comment below)
    bucket_sizes = _kv_read_limits(
        p_len + t0, p_len + max_length, gen.kv_read_buckets, batch_rows=rows
    )
    cache = decoder_mod.init_cache(
        dcfg, rows, bucket_sizes[0],
        enc_hidden.shape[1] if enc_hidden is not None else 0, dtype=dtype,
        kv_dtype=gen.kv_cache_dtype,
    )
    # one static fused mask covering prompt padding + all decode positions;
    # causal masking hides not-yet-written positions, so it is valid at every
    # step (prompt left-padding stays masked throughout — reference :843-867)
    fused_mask = jnp.concatenate(
        [p_mask.astype(jnp.int32), jnp.ones((rows, max_length), jnp.int32)], axis=1
    )
    # prefill the whole forced prefix [0, t0): BOS frame + any audio-prompt
    # codes (pattern-applied, so codebook delays are already in place)
    hidden, cache = decoder_mod.forward(
        params["decoder"],
        dcfg,
        _decoder_rows(tokens[:, :, :t0], use_cfg),
        prompt_hidden_states=prompt_hidden,
        encoder_hidden_states=enc_hidden,
        encoder_attention_mask=enc_mask,
        attention_mask=fused_mask,
        cache=cache,
        prefill=True,
        dtype=dtype,
    )
    logits0 = decoder_mod.logits(params["decoder"], hidden, num_labels=1)[:, :, 0]  # (rows,K,V)

    state = DecodeState(
        t=jnp.asarray(t0, jnp.int32),
        tokens=tokens,
        finished=jnp.zeros((b, num_codebooks), bool),
        cache=cache,
        logits=logits0,
        key=key,
    )

    eos = gen.eos_token_id
    pad = gen.pad_token_id
    # fused-QKV (+ optional int8) view for the decode loop — loop-invariant,
    # so the concat/quantization happens once per generation
    decode_params = decoder_mod.prepare_decode_params(
        params["decoder"], int8=gen.int8_weights
    )

    def make_cond(t_hi: int):
        def cond(s: DecodeState):
            return (s.t < t_hi) & ~jnp.all(s.finished)

        return cond

    def make_body():
        def body(s: DecodeState) -> DecodeState:
            step_key = jax.random.fold_in(s.key, s.t)
            logits = s.logits
            if use_cfg:
                cond_l, uncond_l = logits[:b], logits[b:]
                logits = sampling.apply_cfg(cond_l, uncond_l, gen.guidance_scale)
            logits = sampling.process_logits(logits, gen)
            sampled = sampling.select_tokens(step_key, logits, gen).astype(jnp.int32)  # (B,K)

            # finished streams emit PAD (HF unfinished_sequences semantics)
            sampled = jnp.where(s.finished, pad, sampled)
            # HF's legacy greedy_search/sample updates unfinished_sequences
            # from the RAW sampled token, BEFORE the delay mask re-applies
            # forced BOS/PAD at the next prepare_inputs — a stream that
            # samples EOS inside a forced region still finishes (validated
            # bit-exact in tests/test_decoder_only.py)
            new_finished = s.finished | (sampled == eos)
            # delay pattern forcing (reference re-applies the mask every step,
            # :1203-1212)
            forced = lax.dynamic_slice_in_dim(s.tokens, s.t, 1, axis=2)[:, :, 0]
            pat_t = lax.dynamic_slice_in_dim(pattern, s.t, 1, axis=2)[:, :, 0]
            token_t = jnp.where(pat_t == -1, sampled, forced)

            new_tokens = lax.dynamic_update_slice(s.tokens, token_t[:, :, None], (0, 0, s.t))

            hidden, new_cache = decoder_mod.forward(
                decode_params,
                dcfg,
                _decoder_rows(token_t[:, :, None], use_cfg),
                encoder_attention_mask=enc_mask,
                attention_mask=fused_mask,
                cache=s.cache,
                auto_flush=False,
                dtype=dtype,
            )
            new_logits = decoder_mod.logits(decode_params, hidden, num_labels=1)[:, :, 0]
            return DecodeState(s.t + 1, new_tokens, new_finished, new_cache, new_logits, s.key)

        return body

    # Loop nest, outer to inner:
    # * one Python-level loop per KV-length bucket — the cache's self-KV
    #   buffers are PHYSICALLY sized to the bucket and zero-padded
    #   (grow_cache) at each transition, so every step reads a dense buffer
    #   and average attention HBM traffic scales with generated length, not
    #   max_length.  (The previous design kept one full-size buffer and
    #   statically sliced reads per bucket; the minor-axis slice made XLA
    #   materialize the sliced operand every step — measured slower than no
    #   bucketing at all.)  State flows from one bucket into the next; a
    #   bucket whose range is already past (or where every stream is
    #   finished) exits immediately on its condition.
    # * a single while_loop over STAGE-step segments: each body is a
    #   static-length ``lax.scan`` of STAGE decode steps whose carry holds
    #   ONLY the small mutable state (t, tokens, finished, stage slabs,
    #   index, logits) — the big KV buffers are closed over read-only.
    #   Carrying the big buffers through an inner loop makes XLA COPY the
    #   pass-through elements at the loop boundary (measured ~1.3 ms/step of
    #   flush-time buffer copies at Mini batch-32, for both while-in-while
    #   and scan-in-while); keeping them out of the inner carry leaves the
    #   segment-end ``flush_stage`` DUS as an in-place update on the single
    #   outer while's carry.  Steps past ``t_hi`` or after global EOS inside
    #   a segment are masked: their small state is select-reverted, and their
    #   stage-slab garbage lands in a slot that is either rewritten by the
    #   next real step or masked out of attention reads (slot = index -
    #   flushed doesn't advance when masked).
    def make_segment_body(t_hi: int):
        step = make_body()

        def segment_body(s: DecodeState) -> DecodeState:
            main = s.cache  # big buffers: closure constants for the scan

            def masked_step(inner, _):
                t, tokens, finished, stage_k, stage_v, stage_ks, stage_vs, index, logits = inner
                cache = main._replace(
                    stage_k=stage_k, stage_v=stage_v,
                    stage_k_scale=stage_ks, stage_v_scale=stage_vs, index=index,
                )
                s2 = step(DecodeState(t, tokens, finished, cache, logits, s.key))
                pred = (t < t_hi) & ~jnp.all(finished)
                keep = lambda new, old: jnp.where(pred, new, old)
                return (
                    keep(s2.t, t),
                    keep(s2.tokens, tokens),
                    keep(s2.finished, finished),
                    s2.cache.stage_k,
                    s2.cache.stage_v,
                    s2.cache.stage_k_scale,
                    s2.cache.stage_v_scale,
                    keep(s2.cache.index, index),
                    keep(s2.logits, logits),
                ), None

            inner0 = (s.t, s.tokens, s.finished, main.stage_k, main.stage_v,
                      main.stage_k_scale, main.stage_v_scale, main.index, s.logits)
            (t, tokens, finished, stage_k, stage_v, stage_ks, stage_vs, index,
             logits), _ = lax.scan(masked_step, inner0, None, length=decoder_mod.STAGE)
            cache = main._replace(
                stage_k=stage_k, stage_v=stage_v,
                stage_k_scale=stage_ks, stage_v_scale=stage_vs, index=index,
            )
            return DecodeState(
                t, tokens, finished, decoder_mod.flush_stage(cache), logits, s.key
            )

        return segment_body

    final = state
    for size in bucket_sizes:
        final = final._replace(cache=decoder_mod.grow_cache(final.cache, size))
        t_hi = min(max_length, size - p_len)
        final = lax.while_loop(make_cond(t_hi), make_segment_body(t_hi), final)
    return final.tokens, final.t


def _kv_read_limits(min_limit: int, t_fused_max: int, max_buckets: int,
                    batch_rows: int | None = None) -> list[int]:
    """Static KV-buffer length buckets (growing-buffer decode): multiples of
    128, at most ``max_buckets`` of them, last one = ``t_fused_max``; the
    first is >= ``min_limit`` so the prefill always fits.

    ``PARLER_KV_MIN_STEP`` (trace-time env) floors the bucket granularity.
    Default 128 for batched decode (round-5 roofline harvest): the old 256
    floor collapsed short programs' ladders (3 s -> only [256, 315], most
    steps reading ~270 positions for an average live length of ~158 — the
    dominant HBM term).  Measured on-chip, int8, 8-bucket cap: batch 128 x
    3 s 14.38 -> 12.96 ms/step (-9.9%), batch 32 x 10 s 4.485 -> 4.128
    (-8.0%); a 64 floor is neutral vs 128 (transition overhead cancels the
    finer reads), and >= 30 s ladders never hit the floor.  Small OFFLINE
    batches (``batch_rows <= 4``) keep a COARSER 256 floor: mostly
    weight-streaming-bound, so finer reads buy little and transitions cost
    — full-bench batch-1 x 10 s p50: 0.981 s with the 256-floor ladder vs
    1.001 s at floor 128 vs 1.049 s single-bucket (the KV-read term is
    ~11% of a batch-1 step, so no-bucketing overpays on reads;
    decode_bench's vocode-less harness ranked these differently — the full
    pipeline number decides).  The STREAMING path deliberately omits
    ``batch_rows`` (keeps the 128 floor even at batch 1): its chunked
    decode re-enters the ladder per chunk, and the measured stream numbers
    are better at 128 (first audio 0.197 s / 2.85x RT vs 0.201 / 2.76 at
    256 — stream_bench round-5)."""
    if max_buckets <= 1 or t_fused_max <= 256:
        return [t_fused_max]
    import os as _os

    default_floor = 256 if (batch_rows is not None and batch_rows <= 4) else 128
    floor = int(_os.environ.get("PARLER_KV_MIN_STEP", default_floor))
    step = max(floor, -(-t_fused_max // max_buckets // 128) * 128)
    limits = [l for l in range(step, t_fused_max, step) if l >= max(min_limit, step)]
    return limits + [t_fused_max]


def postprocess_tokens(
    tokens: jnp.ndarray, cfg: ParlerTTSConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Undelay + trim specials (reference :2628-2680, made batch-static).

    Drops the BOS start column, left-shifts codebook k by k, computes each
    sample's valid length as the first frame where any codebook holds a
    special (>= codebook_size), and zeroes codes from there on.  Returns
    (codes (B, K, T'), code_lengths (B,)).
    """
    codes = undelay_pattern(tokens[:, :, 1:])
    codebook_size = cfg.audio_encoder.codebook_size
    t = codes.shape[-1]
    special = jnp.any(codes >= codebook_size, axis=1)  # (B, T')
    first_special = jnp.where(
        jnp.any(special, axis=1), jnp.argmax(special, axis=1), t
    )
    valid = jnp.arange(t)[None] < first_special[:, None]
    codes = jnp.where(valid[:, None, :], codes, 0)
    return codes, first_special.astype(jnp.int32)


def generate(
    params: Params,
    cfg: ParlerTTSConfig,
    gen: GenerationConfig,
    *,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
    prompt_input_ids: jnp.ndarray,
    prompt_attention_mask: jnp.ndarray | None = None,
    input_values: jnp.ndarray | None = None,
    decoder_input_codes: jnp.ndarray | None = None,
    key: jnp.ndarray,
    max_length: int | None = None,
    vocode: bool = True,
    dtype=jnp.float32,
) -> GenerateOutput:
    """description ids + prompt ids -> waveform (the reference's user API,
    ``README.md:52``).  ``input_values`` (B, T) raw audio enables voice
    continuation (encoded to codes by the frozen DAC, reference
    ``:2247-2292``); alternatively pass pre-computed ``decoder_input_codes``.
    """
    if input_values is not None:
        assert decoder_input_codes is None
        decoder_input_codes = codec_mod.encode(
            params["audio_encoder"], cfg.audio_encoder, input_values
        )
    if (
        decoder_input_codes is not None
        and cfg.decoder.audio_channels == 2
        and decoder_input_codes.shape[1] == cfg.decoder.num_codebooks // 2
    ):
        # mono codes into a stereo decoder (reference :2042-2044)
        decoder_input_codes = jnp.repeat(decoder_input_codes, 2, axis=1)
    tokens, _ = generate_tokens(
        params, cfg, gen,
        input_ids=input_ids,
        attention_mask=attention_mask,
        prompt_input_ids=prompt_input_ids,
        prompt_attention_mask=prompt_attention_mask,
        decoder_input_codes=decoder_input_codes,
        key=key,
        max_length=max_length,
        dtype=dtype,
    )
    return _finalize(params, cfg, tokens, vocode=vocode, dtype=dtype)


def _finalize(params: Params, cfg: ParlerTTSConfig, tokens: jnp.ndarray, *,
              vocode: bool, dtype) -> GenerateOutput:
    """Undelay/trim + batched masked DAC vocode (reference :2628-2680)."""
    codes, code_lengths = postprocess_tokens(tokens, cfg)
    if vocode and "audio_encoder" in params:
        if cfg.decoder.num_codebooks != cfg.audio_encoder.num_codebooks:
            # audio_channels == 2 decoders emit 2K interleaved streams; the
            # reference has no stereo vocode either (its generate feeds
            # output_ids straight into the K-codebook DAC, :2650-2663, which
            # would reject 2K codebooks) — fail loudly instead of vocoding
            # garbage; pass vocode=False and decode the codes externally
            raise ValueError(
                f"decoder emits {cfg.decoder.num_codebooks} codebook streams but the codec "
                f"takes {cfg.audio_encoder.num_codebooks} (audio_channels="
                f"{cfg.decoder.audio_channels}); no stereo vocode path exists "
                "(the torch reference has none either) — use vocode=False"
            )
        audio = codec_mod.decode(
            params["audio_encoder"], cfg.audio_encoder, codes,
            dtype=None if dtype == jnp.float32 else dtype,
        )
    else:
        audio = jnp.zeros((tokens.shape[0], 0), jnp.float32)
    audio_lengths = code_lengths * cfg.audio_encoder.hop_length
    return GenerateOutput(tokens, codes, code_lengths, audio, audio_lengths)


def generate_decoder_only(
    params: Params,
    cfg: ParlerTTSConfig,
    gen: GenerationConfig,
    *,
    decoder_input_codes: jnp.ndarray | None = None,
    input_values: jnp.ndarray | None = None,
    prompt_hidden_states: jnp.ndarray | None = None,
    prompt_attention_mask: jnp.ndarray | None = None,
    batch_size: int | None = None,
    key: jnp.ndarray,
    max_length: int | None = None,
    vocode: bool = True,
    dtype=jnp.float32,
) -> GenerateOutput:
    """Standalone decoder-only generation: audio continuation with NO text
    conditioning — the reference's ``ParlerTTSForCausalLM.generate``
    (``modeling_parler_tts.py:1281-1552``).  Cross-attention is skipped in
    every layer (zero-length encoder sequence).

    Continue a voice sample via ``input_values`` (B, T) raw audio or
    pre-computed ``decoder_input_codes`` (B, K, frames); with neither, the
    model free-runs from BOS (pass ``batch_size``).

    ``prompt_hidden_states`` (B, P, H) prepends pre-embedded prompt states —
    the reference passes these as a model kwarg (``:1193``).  With
    ``gen.guidance_scale > 1`` classifier-free guidance runs against a null
    batch whose prompt rows are ZEROED (reference ``:1214-1229``)."""
    if input_values is not None:
        assert decoder_input_codes is None
        decoder_input_codes = codec_mod.encode(
            params["audio_encoder"], cfg.audio_encoder, input_values
        )
    if decoder_input_codes is None:
        if batch_size is None and prompt_hidden_states is not None:
            batch_size = prompt_hidden_states.shape[0]
        if batch_size is None:
            raise ValueError("pass decoder_input_codes/input_values or batch_size")
        decoder_input_codes = jnp.zeros(
            (batch_size, cfg.decoder.num_codebooks, 0), jnp.int32
        )
    tokens, _ = generate_tokens(
        params, cfg, gen,
        decoder_input_codes=decoder_input_codes,
        prompt_hidden_states=prompt_hidden_states,
        prompt_attention_mask=prompt_attention_mask,
        key=key, max_length=max_length, dtype=dtype,
    )
    return _finalize(params, cfg, tokens, vocode=vocode, dtype=dtype)
