"""Stream speech chunk-by-chunk as it is generated (first audio after
~chunk_frames/86 seconds of decoding).

Usage:
  python examples/stream_speech.py <model_dir> --tokenizer <tok_dir> \
      --prompt "..." --out out.wav
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    # bundled-tokenizer artifacts (round 5) need no --tokenizer
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--description", default="A clear, expressive female voice.")
    ap.add_argument("--prompt", default="Streaming synthesis, one second at a time.")
    ap.add_argument("--max-seconds", type=float, default=10.0)
    ap.add_argument("--chunk-frames", type=int, default=86)
    ap.add_argument("--out", default="out.wav")
    args = ap.parse_args()

    import time

    import jax

    from parler_tts_tpu.core import checkpoint as ck
    from parler_tts_tpu.generation.streaming import stream_generate
    from parler_tts_tpu.utils.audio_io import write_wav

    params, cfg, gen = ck.load_model(args.model_dir)
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.tokenizer or args.model_dir)
    d = tok([args.description], return_tensors="np")
    p = tok([args.prompt], return_tensors="np")

    import dataclasses

    gen = dataclasses.replace(gen, max_length=int(args.max_seconds * cfg.frame_rate))
    chunks = []
    t0 = time.time()
    for ch in stream_generate(
        params, cfg, gen,
        input_ids=d.input_ids, attention_mask=d.attention_mask,
        prompt_input_ids=p.input_ids, prompt_attention_mask=p.attention_mask,
        key=jax.random.PRNGKey(0), chunk_frames=args.chunk_frames,
    ):
        print(f"t={time.time()-t0:6.2f}s  chunk: {ch.audio.shape[1]/cfg.sampling_rate:.2f}s audio"
              f"{'  (final)' if ch.finished else ''}")
        chunks.append(ch.audio)
    wav = np.concatenate(chunks, axis=1)[0]
    write_wav(args.out, wav, cfg.sampling_rate)
    print(f"wrote {args.out}: {len(wav)/cfg.sampling_rate:.2f}s")


if __name__ == "__main__":
    main()
