"""Convert a reference (HF parler-tts) checkpoint directory into this
framework's model artifact — the one-command migration path for users of
``parler-tts/parler_tts_mini_v0.1``.

Usage: python helpers/convert_reference_checkpoint.py <hf_checkpoint_dir> <out_dir>
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="reference checkpoint dir (config.json + weights)")
    ap.add_argument("out", help="output artifact dir")
    args = ap.parse_args()

    from parler_tts_tpu.core import checkpoint as ck
    from parler_tts_tpu.core.from_reference import from_reference_pretrained
    from parler_tts_tpu.ops.nn import count_params

    params, cfg, gen = from_reference_pretrained(args.src)
    ck.save_model(args.out, params, cfg, gen)
    dec_m = count_params(params["decoder"]) / 1e6
    print(f"converted {args.src} -> {args.out} "
          f"(decoder {dec_m:.0f}M params, {cfg.decoder.num_codebooks} codebooks, "
          f"{cfg.sampling_rate} Hz)")


if __name__ == "__main__":
    sys.exit(main())
