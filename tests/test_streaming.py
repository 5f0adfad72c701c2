"""Streaming generation: chunked emit equals offline generation; audio-prompt
continuation (BASELINE configs 1 & 4)."""

import numpy as np
import pytest

from parler_tts_tpu.core.config import (
    DACConfig,
    DecoderConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5EncoderConfig,
)
from parler_tts_tpu.generation import generate as G
from parler_tts_tpu.generation.streaming import stream_generate
from parler_tts_tpu.models import parler

K, PAD, BOS = 4, 32, 33


@pytest.fixture(scope="module")
def setup():
    import jax

    cfg = ParlerTTSConfig(
        vocab_size=120,
        text_encoder=T5EncoderConfig(vocab_size=120, d_model=24, d_kv=6, d_ff=48, num_layers=2, num_heads=4),
        audio_encoder=DACConfig(
            num_codebooks=K, codebook_size=32, codebook_dim=4, latent_dim=16,
            encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=16,
            upsampling_ratios=(4, 2), sampling_rate=16000,
        ),
        decoder=DecoderConfig(
            vocab_size=40, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            ffn_dim=64, num_codebooks=K, max_position_embeddings=128,
            pad_token_id=PAD, eos_token_id=PAD, bos_token_id=BOS, dropout=0.0,
        ),
    )
    params = parler.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    inputs = dict(
        input_ids=rng.integers(0, 120, (2, 7)),
        prompt_input_ids=rng.integers(0, 120, (2, 5)),
    )
    return cfg, params, inputs


def test_stream_matches_offline_greedy(setup):
    import jax

    cfg, params, inputs = setup
    gen = GenerationConfig(
        max_length=18, do_sample=False,
        decoder_start_token_id=BOS, pad_token_id=PAD, bos_token_id=BOS, eos_token_id=PAD,
    )
    from parler_tts_tpu.models import dac as dac_mod
    from parler_tts_tpu.models.delay_pattern import undelay_pattern

    offline = G.generate(params, cfg, gen, **inputs, key=jax.random.PRNGKey(0))

    chunks = list(stream_generate(
        params, cfg, gen, **inputs, key=jax.random.PRNGKey(0),
        chunk_frames=5, lookback=8, dtype=np.float32,
    ))
    assert chunks[-1].finished
    codes_stream = np.concatenate([c.codes for c in chunks], axis=2)
    # stream yields raw (pre-trim) undelayed codes: compare against the
    # offline token buffer undelayed the same way
    offline_raw = np.asarray(undelay_pattern(np.asarray(offline.tokens)[:, :, 1:]))
    np.testing.assert_array_equal(codes_stream, offline_raw[:, :, : codes_stream.shape[2]])

    # incremental windowed vocode == one-shot vocode of the same codes
    audio_stream = np.concatenate([c.audio for c in chunks], axis=1)
    cleaned = np.where(codes_stream >= cfg.audio_encoder.codebook_size, 0, codes_stream)
    expected = np.asarray(dac_mod.decode(params["audio_encoder"], cfg.audio_encoder, cleaned))
    np.testing.assert_allclose(audio_stream, expected[:, : audio_stream.shape[1]], atol=1e-4)


def test_stream_first_chunk_latency_smaller(setup):
    """First chunk arrives after chunk_frames of decoding, not max_length."""
    import jax

    cfg, params, inputs = setup
    gen = GenerationConfig(
        max_length=30, do_sample=True, temperature=1.0, top_k=10,
        decoder_start_token_id=BOS, pad_token_id=PAD, bos_token_id=BOS, eos_token_id=PAD,
    )
    it = stream_generate(params, cfg, gen, **inputs, key=jax.random.PRNGKey(1),
                         chunk_frames=6, lookback=8, dtype=np.float32)
    first = next(it)
    assert first.codes.shape[2] <= 6
    assert first.frame_offset == 0
    rest = list(it)
    assert rest[-1].finished


def test_audio_prompt_continuation(setup):
    """Voice prompting: codes prefix is consumed and reproduced in output
    (reference input_values path :2247-2292)."""
    import jax

    cfg, params, inputs = setup
    rng = np.random.default_rng(3)
    audio_codes = rng.integers(0, 32, (2, K, 4))
    gen = GenerationConfig(
        max_length=20, do_sample=False,
        decoder_start_token_id=BOS, pad_token_id=PAD, bos_token_id=BOS, eos_token_id=PAD,
    )
    out = G.generate(params, cfg, gen, **inputs,
                     decoder_input_codes=audio_codes, key=jax.random.PRNGKey(0))
    codes = np.asarray(out.codes)
    # the first frames of the undelayed output are exactly the prompt codes
    np.testing.assert_array_equal(codes[:, :, :4], audio_codes)
