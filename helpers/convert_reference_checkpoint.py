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

    import os
    import shutil

    from parler_tts_tpu.core import checkpoint as ck
    from parler_tts_tpu.core.from_reference import from_reference_pretrained
    from parler_tts_tpu.ops.nn import count_params

    params, cfg, gen = from_reference_pretrained(args.src)
    ck.save_model(args.out, params, cfg, gen)
    # carry the tokenizer + feature-extractor files over so the artifact is
    # self-contained like the source HF dir (reference saves them alongside,
    # run_parler_tts_training.py:1436-1453); save_model already synthesized a
    # preprocessor_config.json stub — the source's real one overwrites it
    carried = []
    for name in ("tokenizer.json", "tokenizer_config.json", "special_tokens_map.json",
                 "spiece.model", "added_tokens.json", "vocab.json", "merges.txt",
                 "preprocessor_config.json"):
        src_f = os.path.join(args.src, name)
        if os.path.exists(src_f):
            shutil.copy2(src_f, os.path.join(args.out, name))
            carried.append(name)
    if carried:
        print(f"carried over: {', '.join(carried)}")
    dec_m = count_params(params["decoder"]) / 1e6
    print(f"converted {args.src} -> {args.out} "
          f"(decoder {dec_m:.0f}M params, {cfg.decoder.num_codebooks} codebooks, "
          f"{cfg.sampling_rate} Hz)")


if __name__ == "__main__":
    sys.exit(main())
