"""Streaming generation benchmark (BASELINE config 4): time-to-first-audio
and steady-state chunk latency at batch 1 on the Mini-600M geometry.

Methodology matches PERFORMANCE.md "Streaming": sampled decode, 0.5 s chunks
(chunk_frames=43), default lookback, int8 serving path, random Mini-shape
weights (throughput is weight-value independent).  A warm-up stream runs
first so the reported numbers are jit-warm (the per-stream cost users see
after the first request); the persistent cache covers fresh processes.

Usage: python benchmarks/stream_bench.py [--seconds 5] [--chunk-frames 43] [--reps 2]
Emits one JSON line.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--chunk-frames", type=int, default=43)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from parler_tts_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from parler_tts_tpu.core.config import GenerationConfig, mini_600m_config
    from parler_tts_tpu.generation.streaming import stream_generate
    from parler_tts_tpu.models import parler
    from parler_tts_tpu.ops.nn import astype_tree

    cfg = mini_600m_config()
    frames = int(args.seconds * cfg.frame_rate)
    gen = GenerationConfig(
        max_length=frames, do_sample=True, temperature=1.0, top_k=50,
        kv_cache_dtype="int8", int8_weights=True,
    )

    t0 = time.time()
    params = jax.jit(
        lambda k: astype_tree(parler.init(k, cfg, with_audio_encoder=True), jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    inputs = dict(
        input_ids=jnp.asarray(rng.integers(0, 32128, (1, 32))),
        attention_mask=jnp.ones((1, 32), jnp.int32),
        prompt_input_ids=jnp.asarray(rng.integers(0, 32128, (1, 24))),
        prompt_attention_mask=jnp.ones((1, 24), jnp.int32),
    )

    def run_stream(key):
        """-> (first_audio_s, total_s, n_chunks, audio_samples, chunk_times)"""
        t0 = time.time()
        first = None
        chunk_times = []
        t_prev = t0
        total_samples = 0
        for ch in stream_generate(
            params, cfg, gen, key=key, chunk_frames=args.chunk_frames,
            dtype=jnp.bfloat16, **inputs,
        ):
            now = time.time()
            total_samples += int(np.asarray(ch.audio).shape[-1])
            if first is None:
                first = now - t0
            else:
                chunk_times.append(now - t_prev)
            t_prev = now
        return first, time.time() - t0, len(chunk_times) + 1, total_samples, chunk_times

    t0 = time.time()
    run_stream(jax.random.PRNGKey(1))  # warm-up (compiles the stream programs)
    print(f"warmup stream {time.time()-t0:.1f}s", file=sys.stderr)

    firsts, totals, steadies = [], [], []
    for i in range(args.reps):
        first, total, n, samples, chunk_times = run_stream(jax.random.PRNGKey(2 + i))
        firsts.append(first)
        totals.append(total)
        if chunk_times:
            steadies.append(float(np.median(chunk_times)))
        print(f"rep{i}: first={first:.3f}s total={total:.2f}s chunks={n} "
              f"samples={samples}", file=sys.stderr)

    audio_s = args.seconds
    print(json.dumps({
        "metric": "stream_batch1",
        "chunk_frames": args.chunk_frames,
        "utterance_seconds": audio_s,
        "first_audio_s": round(float(np.median(firsts)), 3),
        "total_s": round(float(np.median(totals)), 2),
        "steady_chunk_s": round(float(np.median(steadies)), 3) if steadies else None,
        "realtime_factor": round(audio_s / float(np.median(totals)), 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
