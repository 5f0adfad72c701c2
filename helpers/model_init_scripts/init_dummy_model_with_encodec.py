"""Initialize a dummy composite whose audio codec is a REAL EnCodec —
equivalent of the reference's
``helpers/model_init_scripts/init_dummy_model_with_encodec.py``, which swaps
``facebook/encodec_24khz`` in for DAC through the Auto registry (reference
``:11-18``, ``modeling_parler_tts.py:1854-1879``).

The codec here is the full ``facebook/encodec_24khz`` architecture
(``models/encodec.py``: causal SEANet conv+LSTM encoder/decoder, 32-codebook
Euclidean RVQ, 24 kHz / hop 320 / 75 Hz) with random weights; the decoder LM
models 8 of its codebooks like the reference dummy (its ``num_codebooks=8``).
Real ``EncodecModel`` weights load through
``core/torch_import.import_encodec`` (bit-exact codes / allclose waveform —
``tests/test_encodec.py``).

Token ids mirror the reference script: vocab = codebook_size + 1, pad/eos =
codebook_size, bos = codebook_size + 1 (reference ``:22-37, 52-55``).

Usage: python helpers/model_init_scripts/init_dummy_model_with_encodec.py <save_dir>
"""

import argparse
import sys

import jax

from parler_tts_tpu.core import checkpoint as ck
from parler_tts_tpu.core.config import (
    DecoderConfig,
    EncodecConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5EncoderConfig,
)
from parler_tts_tpu.models import parler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("save_dir")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # facebook/encodec_24khz architecture; the LM models 8 of its 32 codebooks
    codec = EncodecConfig(num_codebooks=8)
    assert codec.frame_rate == 75 and codec.hop_length == 320
    vocab = codec.codebook_size  # 1024
    cfg = ParlerTTSConfig(
        vocab_size=32128,  # t5 prompt tokenizer
        text_encoder=T5EncoderConfig(d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4),
        audio_encoder=codec,
        decoder=DecoderConfig(
            vocab_size=vocab + 1, hidden_size=512, num_hidden_layers=4, num_attention_heads=8,
            ffn_dim=512, num_codebooks=codec.num_codebooks, max_position_embeddings=2048,
            pad_token_id=vocab, eos_token_id=vocab, bos_token_id=vocab + 1,
        ),
    )
    params = parler.init(jax.random.PRNGKey(args.seed), cfg)
    gen = GenerationConfig(
        max_length=30 * codec.frame_rate, do_sample=True,
        decoder_start_token_id=vocab + 1, pad_token_id=vocab, bos_token_id=vocab + 1,
        eos_token_id=vocab,
    )
    ck.save_model(args.save_dir, params, cfg, gen)
    print(f"saved dummy model with real EnCodec codec to {args.save_dir} "
          f"({codec.num_codebooks} of {codec.num_quantizers} codebooks @ "
          f"{codec.frame_rate} Hz, {codec.sampling_rate} Hz audio)")


if __name__ == "__main__":
    sys.exit(main())
