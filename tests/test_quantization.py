"""Int8 KV-cache + weight-only quantization (ops/quantization.py).

The reference torch stack has no quantization; these tests gate the TPU-side
int8 decode paths on (a) bounded quantization error, (b) exact scale-folding
algebra (folded == dequantize-then-compute), and (c) the full decode engine
staying numerically sane end-to-end with int8 cache + weights.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parler_tts_tpu.core.config import DecoderConfig
from parler_tts_tpu.models import decoder as jdec
from parler_tts_tpu.ops.nn import dense
from parler_tts_tpu.ops.quantization import (
    dequantize_kv,
    quantize_dense,
    quantize_kv,
)

K, H, LAYERS, V = 4, 32, 2, 99


def make_cfg():
    return DecoderConfig(
        vocab_size=V, max_position_embeddings=256, num_hidden_layers=LAYERS,
        ffn_dim=64, num_attention_heads=4, hidden_size=H, num_codebooks=K,
        pad_token_id=V, eos_token_id=V, bos_token_id=V + 1,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )


def test_quantize_kv_roundtrip_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 5, 17, 64)) * 4.0, jnp.float32)
    q, scale = quantize_kv(x)
    assert q.dtype == jnp.int8 and scale.shape == (3, 5, 17)
    back = dequantize_kv(q, scale)
    # symmetric int8: max error is scale/2 = amax/254 per row
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    assert float(jnp.max(jnp.abs(back - x) / jnp.maximum(amax, 1e-8))) <= 0.5 / 127 + 1e-6


def test_quantize_dense_folding_exact():
    """(x @ w_int8) * scale equals x @ dequantized(w) up to f32 rounding
    (the fold only reassociates the per-channel constant)."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((H, 48)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((5, H)), jnp.float32)
    qd = quantize_dense(w)
    assert qd["kernel_q"].dtype == jnp.int8 and qd["scale"].shape == (48,)
    folded = dense(qd, x)
    dequant = x @ (qd["kernel_q"].astype(jnp.float32) * qd["scale"][None, :])
    np.testing.assert_allclose(np.asarray(folded), np.asarray(dequant), rtol=1e-4, atol=1e-5)
    # and close to the fp32 matmul (per-channel int8 keeps ~2 decimal digits)
    exact = dense({"kernel": w}, x)
    err = np.max(np.abs(np.asarray(folded - exact))) / np.max(np.abs(np.asarray(exact)))
    assert err < 2e-2


@pytest.mark.slow
def test_int8_kv_decode_matches_fp_within_tolerance():
    """Cached decode with an int8 KV cache stays close to the fp32 cache."""
    cfg = make_cfg()
    rng = np.random.default_rng(2)
    params = jdec.init(jax.random.PRNGKey(0), cfg)
    B, T, S = 2, 10, 7
    ids = rng.integers(0, V, (B, K, T)).astype(np.int32)
    enc = jnp.asarray(rng.standard_normal((B, S, H)), jnp.float32)
    enc_mask = jnp.ones((B, S), jnp.int32)

    def run(kv_dtype):
        cache = jdec.init_cache(cfg, B, T, S, dtype=jnp.float32, kv_dtype=kv_dtype)
        hidden, cache = jdec.forward(
            params, cfg, ids[:, :, :1], encoder_hidden_states=enc,
            encoder_attention_mask=enc_mask, cache=cache, prefill=True,
        )
        outs = [hidden]
        for t in range(1, T):
            hidden, cache = jdec.forward(
                params, cfg, ids[:, :, t : t + 1], encoder_attention_mask=enc_mask,
                cache=cache,
            )
            outs.append(hidden)
        return jnp.concatenate(outs, axis=1), cache

    fp, _ = run(None)
    q8, cache8 = run("int8")
    assert cache8.self_k.dtype == jnp.int8
    # T + STAGE: init_cache over-allocates so partial stage flushes never clamp
    assert cache8.self_k_scale is not None
    assert cache8.self_k_scale.shape == (LAYERS, B, 4, T + jdec.STAGE)
    assert cache8.self_k_scale.dtype == jnp.bfloat16
    rel = float(jnp.max(jnp.abs(q8 - fp)) / jnp.max(jnp.abs(fp)))
    assert rel < 5e-2, rel


def test_int8_weights_decode_params():
    cfg = make_cfg()
    params = jdec.init(jax.random.PRNGKey(0), cfg)
    dp = jdec.prepare_decode_params(params, int8=True)
    assert dp["layers"]["self_attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    assert dp["lm_heads"]["kernel_q"].dtype == jnp.int8
    # logits from int8 heads close to fp heads
    rng = np.random.default_rng(3)
    hidden = jnp.asarray(rng.standard_normal((2, 3, H)), jnp.float32)
    lf = jdec.logits(params, hidden)
    lq = jdec.logits(dp, hidden)
    assert lq.shape == lf.shape
    err = float(jnp.max(jnp.abs(lq - lf)) / jnp.max(jnp.abs(lf)))
    assert err < 2e-2, err


def _composite_cfg():
    from parler_tts_tpu.core.config import (
        DACConfig, ParlerTTSConfig, T5EncoderConfig,
    )

    return ParlerTTSConfig(
        vocab_size=120,
        text_encoder=T5EncoderConfig(
            vocab_size=120, d_model=24, d_kv=6, d_ff=48, num_layers=2, num_heads=4,
            relative_attention_num_buckets=8, relative_attention_max_distance=20,
        ),
        audio_encoder=DACConfig(
            num_codebooks=K, codebook_size=32, codebook_dim=4, latent_dim=16,
            encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=16,
            upsampling_ratios=(4, 2), sampling_rate=16000,
        ),
        decoder=dataclasses.replace(make_cfg(), vocab_size=34, pad_token_id=32,
                                    eos_token_id=32, bos_token_id=33),
    )


def test_generate_int8_end_to_end():
    """Full engine with int8 cache + int8 weights: runs, finite, and the
    forced delay-pattern structure (BOS/PAD forcing) is preserved."""
    from parler_tts_tpu.core.config import (
        DACConfig, GenerationConfig, ParlerTTSConfig, T5EncoderConfig,
    )
    from parler_tts_tpu.generation import generate as G
    from parler_tts_tpu.models import parler

    cfg = ParlerTTSConfig(
        vocab_size=120,
        text_encoder=T5EncoderConfig(
            vocab_size=120, d_model=24, d_kv=6, d_ff=48, num_layers=2, num_heads=4,
            relative_attention_num_buckets=8, relative_attention_max_distance=20,
        ),
        audio_encoder=DACConfig(
            num_codebooks=K, codebook_size=32, codebook_dim=4, latent_dim=16,
            encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=16,
            upsampling_ratios=(4, 2), sampling_rate=16000,
        ),
        decoder=dataclasses.replace(make_cfg(), vocab_size=34, pad_token_id=32,
                                    eos_token_id=32, bos_token_id=33),
    )
    params = parler.init(jax.random.PRNGKey(0), cfg, with_audio_encoder=False)
    gen = GenerationConfig(
        max_length=12, do_sample=False, decoder_start_token_id=33,
        pad_token_id=32, bos_token_id=33, eos_token_id=32,
        kv_cache_dtype="int8", int8_weights=True,
    )
    rng = np.random.default_rng(4)
    tokens, _ = G.generate_tokens(
        params, cfg, gen,
        input_ids=rng.integers(0, 120, (2, 6)),
        prompt_input_ids=rng.integers(0, 120, (2, 4)),
        key=jax.random.PRNGKey(1),
    )
    tokens = np.asarray(tokens)
    assert tokens.shape == (2, K, 12)
    # delay-pattern forcing: codebook k starts with k+1 BOS
    for k in range(K):
        assert (tokens[:, k, : k + 1] == 33).all()
    assert (tokens < 34).all() and (tokens >= 0).all()


@pytest.mark.slow
@__import__("pytest").mark.parametrize("kv_dtype", [None, "int8"])
def test_engine_matches_stepwise_forward(kv_dtype):
    """The hot-loop engine (segmented masked scan + staged KV flushes,
    generate.py) must produce EXACTLY the tokens of the simple step-by-step
    ``forward(auto_flush=True)`` API.  Regression for the segment scan
    dropping the int8 stage-scale slabs from its carry (stale scales fed to
    attention + flushed into the main cache)."""
    from jax import lax

    from parler_tts_tpu.core.config import GenerationConfig
    from parler_tts_tpu.generation import generate as G
    from parler_tts_tpu.generation import sampling
    from parler_tts_tpu.models import parler
    from parler_tts_tpu.models.delay_pattern import build_delay_pattern

    cfg = _composite_cfg()
    dcfg = cfg.decoder
    params = parler.init(jax.random.PRNGKey(0), cfg, with_audio_encoder=False)
    gen = GenerationConfig(
        max_length=40, do_sample=False, decoder_start_token_id=33,
        pad_token_id=32, bos_token_id=33, eos_token_id=32,
        kv_cache_dtype=kv_dtype, int8_weights=False,
    )
    rng = np.random.default_rng(7)
    input_ids = jnp.asarray(rng.integers(0, 120, (2, 6)), jnp.int32)
    prompt_ids = jnp.asarray(rng.integers(0, 120, (2, 4)), jnp.int32)
    key = jax.random.PRNGKey(1)

    engine_tokens, _ = G.generate_tokens(
        params, cfg, gen, input_ids=input_ids, prompt_input_ids=prompt_ids, key=key,
    )

    # --- hand-rolled reference loop over the simple forward() API ---
    b, num_codebooks = 2, dcfg.num_codebooks
    attn_mask = jnp.ones(input_ids.shape, jnp.int32)
    enc_hidden = parler.encode_text(params, cfg, input_ids, attn_mask)
    prompt_hidden = parler.embed_prompts(params, prompt_ids)
    start_ids = jnp.full((b, num_codebooks, 1), gen.decoder_start_token_id, jnp.int32)
    _, pattern, t0 = build_delay_pattern(
        start_ids, bos_token_id=gen.bos_token_id, pad_token_id=gen.pad_token_id,
        max_length=gen.max_length,
    )
    tokens = jnp.where(pattern == -1, gen.pad_token_id, pattern)
    p_len = prompt_hidden.shape[1]
    cache = jdec.init_cache(
        dcfg, b, p_len + gen.max_length, enc_hidden.shape[1], kv_dtype=kv_dtype,
    )
    fused_mask = jnp.ones((b, p_len + gen.max_length), jnp.int32)
    hidden, cache = jdec.forward(
        params["decoder"], dcfg, tokens[:, :, :t0],
        prompt_hidden_states=prompt_hidden, encoder_hidden_states=enc_hidden,
        encoder_attention_mask=attn_mask, attention_mask=fused_mask,
        cache=cache, prefill=True,
    )
    logits = jdec.logits(params["decoder"], hidden, num_labels=1)[:, :, 0]
    decode_params = jdec.prepare_decode_params(params["decoder"], int8=False)
    finished = jnp.zeros((b, num_codebooks), bool)
    for t in range(t0, gen.max_length):
        step_key = jax.random.fold_in(key, t)
        l = sampling.process_logits(logits, gen)
        sampled = sampling.select_tokens(step_key, l, gen).astype(jnp.int32)
        sampled = jnp.where(finished, gen.pad_token_id, sampled)
        forced = tokens[:, :, t]
        pat_t = pattern[:, :, t]
        token_t = jnp.where(pat_t == -1, sampled, forced)
        finished = finished | (token_t == gen.eos_token_id)
        tokens = lax.dynamic_update_slice(tokens, token_t[:, :, None], (0, 0, t))
        if bool(jnp.all(finished)):
            break
        hidden, cache = jdec.forward(
            decode_params, dcfg, token_t[:, :, None],
            encoder_attention_mask=attn_mask, attention_mask=fused_mask, cache=cache,
        )
        logits = jdec.logits(decode_params, hidden, num_labels=1)[:, :, 0]

    np.testing.assert_array_equal(np.asarray(engine_tokens), np.asarray(tokens))
