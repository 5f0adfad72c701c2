"""Decode-path microbenchmark: ms/step + peak HBM at production shapes.

Times the full decode hot path (prefill + bucketed ``lax.while_loop``s over
the KV cache, no vocode) on the Mini-600M geometry and reports per-step
latency and the chip's peak memory.  This is the measurement tool for the
round-2 decode work: KV-cache memory envelope (batch 32 x 10 s / batch 4 x
30 s on one 16 GB v5e) and the 2x step-time target.

Usage:
  python benchmarks/decode_bench.py --batch 32 --seconds 10
      [--reps 3] [--kv-dtype int8] [--int8-weights] [--kv-buckets N]
      [--greedy] [--top-k K]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="mini", choices=["mini", "large"],
                    help="model geometry: mini (600M) or large (2B decoder)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--kv-dtype", default=None, choices=["int8"],
                    help="KV-cache storage dtype override")
    ap.add_argument("--int8-weights", action="store_true",
                    help="int8 weight-only decode matmuls")
    ap.add_argument("--kv-buckets", type=int, default=8,
                    help="max KV read-length buckets (1 = single full-range loop)")
    ap.add_argument("--greedy", action="store_true",
                    help="argmax decode (ablates the sampler: no top-k, no categorical)")
    ap.add_argument("--top-k", type=int, default=50,
                    help="top-k for sampling (0 disables the top-k warper)")
    ap.add_argument("--trace", default=None, metavar="LOGDIR",
                    help="capture a jax.profiler trace (perfetto) of the timed reps")
    args = ap.parse_args()

    from parler_tts_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from parler_tts_tpu.core.config import (
        GenerationConfig, large_2b_config, mini_600m_config,
    )
    from parler_tts_tpu.generation import generate as G
    from parler_tts_tpu.models import parler
    from parler_tts_tpu.ops.nn import astype_tree

    cfg = mini_600m_config() if args.config == "mini" else large_2b_config()
    frames = int(args.seconds * cfg.frame_rate) + cfg.decoder.num_codebooks
    gen = GenerationConfig(
        max_length=frames, do_sample=not args.greedy, temperature=1.0,
        top_k=args.top_k,  # 0 disables the warper in process_logits
        kv_cache_dtype=args.kv_dtype, int8_weights=args.int8_weights,
        kv_read_buckets=args.kv_buckets,
    )

    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} kv_dtype={args.kv_dtype} "
          f"kv_buckets={args.kv_buckets} batch={args.batch} frames={frames}",
          file=sys.stderr)

    t0 = time.time()
    params = jax.jit(
        lambda k: astype_tree(parler.init(k, cfg, with_audio_encoder=False), jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    float(jnp.sum(params["decoder"]["final_ln"]["scale"]))  # sync
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    desc = rng.integers(0, 32128, (args.batch, 32))
    prompt = rng.integers(0, 32128, (args.batch, 24))

    @jax.jit
    def run(params, key):
        tokens, t_final = G.generate_tokens(
            params, cfg, gen,
            input_ids=desc, prompt_input_ids=prompt,
            key=key, dtype=jnp.bfloat16,
        )
        return jnp.sum(tokens.astype(jnp.int32)), t_final

    t0 = time.time()
    s, t_final = run(params, jax.random.PRNGKey(1))
    steps = int(t_final)
    _ = int(s)
    compile_s = time.time() - t0
    print(f"compile+first {compile_s:.1f}s, {steps} steps", file=sys.stderr)

    import contextlib

    from parler_tts_tpu.utils.profiling import trace

    times = []
    with trace(args.trace, perfetto=True) if args.trace else contextlib.nullcontext():
        for i in range(args.reps):
            t0 = time.time()
            s, t_final = run(params, jax.random.PRNGKey(2 + i))
            _ = int(s)  # sync (block_until_ready unreliable through tunnel)
            times.append(time.time() - t0)
    median = float(np.median(times))

    stats = {}
    try:
        ms = dev.memory_stats() or {}
        stats = {
            "peak_gb": round(ms.get("peak_bytes_in_use", 0) / 2**30, 2),
            "limit_gb": round(ms.get("bytes_limit", 0) / 2**30, 2),
        }
    except Exception:
        pass

    print(json.dumps({
        "config": args.config,
        "batch": args.batch,
        "seconds": args.seconds,
        "steps": steps,
        "kv_buckets": args.kv_buckets,
        "kv_dtype": args.kv_dtype,
        "total_s": round(median, 3),
        "ms_per_step": round(median / max(steps, 1) * 1000, 3),
        "compile_s": round(compile_s, 1),
        **stats,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
