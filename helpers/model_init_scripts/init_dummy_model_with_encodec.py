"""Initialize a dummy model with an Encodec-geometry codec — equivalent of
the reference's ``helpers/model_init_scripts/init_dummy_model_with_encodec.py``
(which swaps ``facebook/encodec_24khz`` in for DAC, proving the codec is
pluggable; reference ``:11-18``).

Codec pluggability here is config-driven: the decoder takes its codebook
count/vocab from the codec config, and the codec geometry (sampling rate,
strides, codebooks) is fully parametric.  This script builds the 24 kHz /
8-codebook / 75 Hz Encodec-like geometry on the DAC conv architecture; a
bit-exact Encodec port (LSTM + residual blocks) is a separate model family.

Usage: python helpers/model_init_scripts/init_dummy_model_with_encodec.py <save_dir>
"""

import argparse
import sys

import jax

from parler_tts_tpu.core import checkpoint as ck
from parler_tts_tpu.core.config import (
    DACConfig,
    DecoderConfig,
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

    # encodec_24khz geometry: 24 kHz, hop 320, 75 frames/s, 8 codebooks x 1024
    codec = DACConfig(
        num_codebooks=8,
        codebook_size=1024,
        codebook_dim=8,
        latent_dim=128,
        frame_rate=75,
        sampling_rate=24000,
        encoder_hidden_size=32,
        downsampling_ratios=(2, 4, 5, 8),  # hop 320
        decoder_hidden_size=256,
        upsampling_ratios=(8, 5, 4, 2),
    )
    cfg = ParlerTTSConfig(
        vocab_size=32128,
        text_encoder=T5EncoderConfig(d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4),
        audio_encoder=codec,
        decoder=DecoderConfig(
            vocab_size=1088, hidden_size=512, num_hidden_layers=4, num_attention_heads=8,
            ffn_dim=512, num_codebooks=codec.num_codebooks, max_position_embeddings=1024,
            pad_token_id=1024, eos_token_id=1024, bos_token_id=1025,
        ),
    )
    params = parler.init(jax.random.PRNGKey(args.seed), cfg)
    gen = GenerationConfig(
        max_length=30 * codec.frame_rate, do_sample=True,
        decoder_start_token_id=1025, pad_token_id=1024, bos_token_id=1025, eos_token_id=1024,
    )
    ck.save_model(args.save_dir, params, cfg, gen)
    print(f"saved dummy encodec-geometry model to {args.save_dir} "
          f"({codec.num_codebooks} codebooks @ {codec.frame_rate} Hz, {codec.sampling_rate} Hz audio)")


if __name__ == "__main__":
    sys.exit(main())
