"""Initialize the tiny smoke-test model (4x512 decoder) — equivalent of the
reference's ``helpers/model_init_scripts/init_dummy_model.py:25-42``.

Usage: python helpers/model_init_scripts/init_dummy_model.py <save_dir>
"""

import argparse
import sys

import jax

from parler_tts_tpu.core import checkpoint as ck
from parler_tts_tpu.core.config import GenerationConfig, dummy_config
from parler_tts_tpu.models import parler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("save_dir")
    ap.add_argument("--num-codebooks", type=int, default=9)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = dummy_config(num_codebooks=args.num_codebooks)
    params = parler.init(jax.random.PRNGKey(args.seed), cfg)
    gen = GenerationConfig(
        max_length=30 * cfg.frame_rate,
        do_sample=True,
        decoder_start_token_id=cfg.decoder.bos_token_id,
        pad_token_id=cfg.decoder.pad_token_id,
        bos_token_id=cfg.decoder.bos_token_id,
        eos_token_id=cfg.decoder.eos_token_id,
    )
    ck.save_model(args.save_dir, params, cfg, gen)
    print(f"saved dummy model to {args.save_dir}")


if __name__ == "__main__":
    sys.exit(main())
