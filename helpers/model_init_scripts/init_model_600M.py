"""Initialize the Mini-class (600M decoder) composite model from scratch.

Equivalent of the reference's ``helpers/model_init_scripts/init_model_600M.py``
(decoder geometry at ``:25-42``, generation defaults at ``:55-62``): builds a
randomly-initialized 24x1024 decoder (9 codebooks, vocab 1024+64, 4096
positions), assembles it with a flan-t5-base-shaped text encoder and the
44.1 kHz DAC config, and saves a complete model artifact.

Usage: python helpers/model_init_scripts/init_model_600M.py <save_dir>
       [--text-encoder <hf_t5_dir>] [--dac <hf_dac_dir>]

When local HF checkpoints are given, their weights are imported (torch →
JAX); otherwise the frozen encoders are randomly initialized (useful only
for smoke/perf work — real training wants the pretrained T5/DAC).
"""

import argparse
import sys

import jax

from parler_tts_tpu.core import checkpoint as ck
from parler_tts_tpu.core.config import GenerationConfig, mini_600m_config
from parler_tts_tpu.models import parler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("save_dir")
    ap.add_argument("--text-encoder", default=None, help="local HF flan-t5 checkpoint dir")
    ap.add_argument("--dac", default=None, help="local HF DacModel checkpoint dir")
    ap.add_argument("--tokenizer", default=None,
                    help="tokenizer dir to bundle into the artifact "
                         "(defaults to --text-encoder's, which carries the "
                         "flan-t5 tokenizer in HF checkpoints)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = mini_600m_config()
    params = parler.init(jax.random.PRNGKey(args.seed), cfg)

    if args.text_encoder:
        from transformers import T5EncoderModel

        from parler_tts_tpu.core.torch_import import import_t5_encoder

        m = T5EncoderModel.from_pretrained(args.text_encoder)
        params["text_encoder"] = import_t5_encoder(m.state_dict(), cfg.text_encoder.num_layers)
    if args.dac:
        from transformers import DacModel

        from parler_tts_tpu.core.torch_import import import_dac

        m = DacModel.from_pretrained(args.dac)
        params["audio_encoder"] = import_dac(m.state_dict())

    gen = GenerationConfig(
        max_length=30 * cfg.frame_rate,  # 30 s (reference :60)
        do_sample=True,
        guidance_scale=1.0,
        decoder_start_token_id=cfg.decoder.bos_token_id,
        pad_token_id=cfg.decoder.pad_token_id,
        bos_token_id=cfg.decoder.bos_token_id,
        eos_token_id=cfg.decoder.eos_token_id,
    )
    # bundle the tokenizer so the artifact is self-contained (reference
    # saves it alongside, run_parler_tts_training.py:1436-1453)
    tok = None
    tok_src = args.tokenizer or args.text_encoder
    if tok_src:
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(tok_src)
        except Exception as e:
            print(f"tokenizer not bundled ({tok_src}: {e})", file=sys.stderr)
    ck.save_model(args.save_dir, params, cfg, gen, tokenizer=tok)
    from parler_tts_tpu.ops.nn import count_params

    print(f"saved Mini-600M-class model to {args.save_dir} "
          f"({count_params(params['decoder'])/1e6:.0f}M decoder params)")


if __name__ == "__main__":
    sys.exit(main())
