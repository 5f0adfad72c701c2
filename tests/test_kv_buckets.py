"""Growing-buffer KV length buckets: the multi-while_loop decode
(generation/generate.py `_kv_read_limits` sizes + `decoder.grow_cache`
transitions) must produce the same tokens as the single full-size loop.

The smaller per-bucket buffers only drop attention columns that are masked
anyway (positions >= cache.flushed), so greedy token streams are identical."""

import numpy as np
import pytest

import jax

from parler_tts_tpu.core.config import (
    DACConfig,
    DecoderConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5EncoderConfig,
)
from parler_tts_tpu.generation import generate as G
from parler_tts_tpu.generation.generate import _kv_read_limits
from parler_tts_tpu.models import parler


def test_kv_read_limits_shape():
    # covers the full range, respects the bucket cap, multiples of 128
    lims = _kv_read_limits(30, 920, 8)
    assert lims[-1] == 920
    assert len(lims) <= 8
    assert all(l % 128 == 0 for l in lims[:-1])
    assert all(b > a for a, b in zip(lims, lims[1:]))
    # degenerate: tiny max_length or buckets disabled -> single loop
    assert _kv_read_limits(10, 200, 8) == [200]
    assert _kv_read_limits(10, 920, 1) == [920]


@pytest.mark.slow
def test_bucketed_decode_matches_full_loop():
    cfg = ParlerTTSConfig(
        vocab_size=120,
        text_encoder=T5EncoderConfig(
            vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4
        ),
        audio_encoder=DACConfig(
            num_codebooks=4, codebook_size=32, codebook_dim=4, latent_dim=16,
            encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=16,
            upsampling_ratios=(4, 2),
        ),
        decoder=DecoderConfig(
            vocab_size=40, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            ffn_dim=64, num_codebooks=4, max_position_embeddings=512,
            pad_token_id=32, eos_token_id=32, bos_token_id=33, dropout=0.0,
        ),
    )
    params = parler.init(jax.random.PRNGKey(0), cfg, with_audio_encoder=False)
    rng = np.random.default_rng(0)
    inputs = dict(
        input_ids=rng.integers(0, 120, (2, 7)),
        prompt_input_ids=rng.integers(0, 120, (2, 5)),
    )
    # max_length 300 + prompt 5 -> buckets [256, 305] with the default cap
    base_gen = GenerationConfig(
        max_length=300, do_sample=False, decoder_start_token_id=33,
        pad_token_id=32, bos_token_id=33, eos_token_id=32, kv_read_buckets=1,
    )
    bucketed_gen = GenerationConfig(**{**base_gen.to_dict(), "kv_read_buckets": 8})
    assert len(_kv_read_limits(6, 305, 8)) >= 2

    base, _ = G.generate_tokens(
        params, cfg, base_gen, **inputs, key=jax.random.PRNGKey(0)
    )
    bucketed, _ = G.generate_tokens(
        params, cfg, bucketed_gen, **inputs, key=jax.random.PRNGKey(0)
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(bucketed))

    # streaming crosses the same bucket boundaries by growing the cache
    # between chunks.  Chunk-end flushes land at different steps than the
    # offline segment flushes, which regroups the [main | stage] attention
    # summation — mathematically identical, but float near-ties in greedy
    # argmax can flip (measured ~0.2% of tokens at this scale with random
    # weights).  Assert the streams agree everywhere but such rare flips
    # (and their delayed-pattern echoes).
    from parler_tts_tpu.generation.streaming import stream_generate
    from parler_tts_tpu.models.delay_pattern import undelay_pattern

    chunks = list(stream_generate(
        params, cfg, bucketed_gen, **inputs, key=jax.random.PRNGKey(0),
        chunk_frames=60, lookback=8,
    ))
    codes_stream = np.concatenate([c.codes for c in chunks], axis=2)
    offline_raw = np.asarray(undelay_pattern(np.asarray(base)[:, :, 1:]))
    match = codes_stream == offline_raw[:, :, : codes_stream.shape[2]]
    assert match.mean() > 0.98, f"stream/offline token match {match.mean():.4f}"


def test_kv_read_limits_batch_aware_floor():
    """Round-5 policy (measured end-to-end, see _kv_read_limits docstring):
    offline batches <= 4 get the coarse 256-floor ladder; larger batches the
    fine 128 floor; omitting batch_rows (the streaming path) also keeps 128."""
    from parler_tts_tpu.generation.generate import _kv_read_limits

    t = 893  # batch-1 10 s latency shape
    assert _kv_read_limits(25, t, 8, batch_rows=1)[0] == 256
    assert _kv_read_limits(25, t, 8, batch_rows=4)[0] == 256
    assert _kv_read_limits(25, t, 8, batch_rows=5)[0] == 128
    assert _kv_read_limits(25, t, 8, batch_rows=128)[0] == 128
    assert _kv_read_limits(25, t, 8)[0] == 128  # streaming omits batch_rows
    # every variant still ends at the fused max and respects the cap
    for rows in (1, 5, None):
        lims = _kv_read_limits(25, t, 8, batch_rows=rows)
        assert lims[-1] == t and len(lims) <= 8
