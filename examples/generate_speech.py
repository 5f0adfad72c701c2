"""Generate speech from a description + prompt (the reference README's usage,
``/root/reference/README.md:40-56``).

Usage:
  python examples/generate_speech.py <model_dir> --tokenizer <tok_dir> \
      --description "A female speaker with a low-pitched voice..." \
      --prompt "Hey, how are you doing today?" --out out.wav

Build a model dir first, e.g.:
  python helpers/model_init_scripts/init_dummy_model.py /tmp/model     # random
  python helpers/convert_reference_checkpoint.py <hf_ckpt> /tmp/model  # real
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    # artifacts saved/converted by this framework bundle their tokenizer
    # (round 5); --tokenizer is only needed for dirs that lack one
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--description", default="A female speaker with a slightly low-pitched "
                    "voice delivers her words quite expressively, with clear audio quality.")
    ap.add_argument("--prompt", default="Hey, how are you doing today?")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-seconds", type=float, default=10.0)
    ap.add_argument("--out", default="out.wav")
    args = ap.parse_args()

    from parler_tts_tpu.pipeline import ParlerTTSPipeline
    from parler_tts_tpu.utils.audio_io import write_wav

    pipe = ParlerTTSPipeline.from_pretrained(args.model_dir, tokenizer_name=args.tokenizer)
    sr, (wav,) = pipe.tts(args.description, args.prompt, seed=args.seed,
                          max_seconds=args.max_seconds)
    write_wav(args.out, wav, sr)
    print(f"wrote {args.out}: {len(wav)/sr:.2f}s @ {sr} Hz")


if __name__ == "__main__":
    main()
