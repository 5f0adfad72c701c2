"""Vocoder (DAC decode) microbench — codes -> waveform on the real chip.

Times the serving-path vocoder at production shapes (reference capability:
``modeling_dac.py:98-134`` decode; this repo's bf16 path is the one
``bench.py`` and the pipeline use).  Variants:

* fp32           — the allclose quality-gate path
* bf16+sin       — bf16 convs, exact transcendental snake (round-1 serving path)
* bf16+poly      — bf16 convs, polynomial snake_fast (current serving path)

Usage: python benchmarks/vocoder_bench.py [--batch 32] [--seconds 3.0]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from parler_tts_tpu.core.config import DACConfig
from parler_tts_tpu.models import dac
from parler_tts_tpu.utils.compilation_cache import enable_persistent_cache
from parler_tts_tpu.utils.profiling import sync


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    enable_persistent_cache()
    cfg = DACConfig()
    params = dac.init(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)
    frames = int(args.seconds * cfg.frame_rate)
    codes = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.codebook_size, (args.batch, cfg.num_codebooks, frames)),
        jnp.int32,
    )
    audio_s = args.batch * frames / cfg.frame_rate

    exact_snake = dac.snake

    def run(tag: str, dtype, fast: bool) -> None:
        dac.snake_fast = dac.snake_fast if fast else exact_snake
        fn = jax.jit(lambda p, c: dac.decode(p, cfg, c, dtype=dtype))
        out = fn(params, codes)
        sync(out)  # compile + first run
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, codes)
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{tag:12s} {dt*1e3:8.1f} ms  {audio_s/dt:8.1f} audio-s/s  (batch {args.batch} x {args.seconds}s)")

    real_fast = dac.snake_fast
    run("fp32", None, fast=False)
    run("bf16+sin", jnp.bfloat16, fast=False)
    dac.snake_fast = real_fast
    run("bf16+poly", jnp.bfloat16, fast=True)


if __name__ == "__main__":
    main()
