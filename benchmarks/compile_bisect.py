"""Bisect where generation compile time goes as batch grows (VERDICT r3 #5:
batch-256 cold compile was 200 s+ vs 54 s at batch 128 — ~4x superlinear).

Times trace (jit -> lower) and XLA compile (lower -> compile) separately for
one knob combination per process (persistent cache NOT enabled, so every run
is a true cold compile; ShapeDtypeStructs avoid touching the chip until
compile).  Emits one JSON line.

Usage: python benchmarks/compile_bisect.py --batch 256 [--greedy] [--topk 0]
           [--no-vocode] [--no-int8] [--seconds 3.0]
Chain several in one serialized TPU run; see PERFORMANCE.md "batch-256
compile" for the measured matrix.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--topk", type=int, default=50)
    ap.add_argument("--no-vocode", action="store_true")
    ap.add_argument("--no-int8", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from parler_tts_tpu.core.config import GenerationConfig, mini_600m_config
    from parler_tts_tpu.generation import generate as G
    from parler_tts_tpu.models import parler
    from parler_tts_tpu.ops.nn import astype_tree

    cfg = mini_600m_config()
    frames = int(args.seconds * cfg.frame_rate) + cfg.decoder.num_codebooks
    vocode = not args.no_vocode
    use_int8 = not args.no_int8
    gen = GenerationConfig(
        max_length=frames,
        do_sample=not args.greedy,
        temperature=1.0,
        top_k=args.topk,
        kv_cache_dtype="int8" if use_int8 else None,
        int8_weights=use_int8,
    )
    rng = np.random.default_rng(0)
    inputs = dict(
        input_ids=rng.integers(0, 32128, (args.batch, 32)),
        attention_mask=np.ones((args.batch, 32), np.int32),
        prompt_input_ids=rng.integers(0, 32128, (args.batch, 24)),
        prompt_attention_mask=np.ones((args.batch, 24), np.int32),
    )

    def run(params, key):
        out = G.generate(params, cfg, gen, **inputs, key=key, vocode=vocode, dtype=jnp.bfloat16)
        res = out.audio if vocode else out.codes
        return jnp.sum(res.astype(jnp.float32))

    params_shape = jax.eval_shape(
        lambda k: astype_tree(parler.init(k, cfg, with_audio_encoder=vocode), jnp.bfloat16),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    key_shape = jax.ShapeDtypeStruct((2,), jnp.uint32)

    t0 = time.time()
    lowered = jax.jit(run).lower(params_shape, key_shape)
    trace_s = time.time() - t0
    hlo_bytes = len(lowered.as_text("stablehlo"))
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    try:
        mem = compiled.memory_analysis()
        hbm = getattr(mem, "temp_size_in_bytes", None)
    except Exception:
        hbm = None
    print(json.dumps({
        "batch": args.batch,
        "sample": not args.greedy,
        "top_k": args.topk,
        "vocode": vocode,
        "int8": use_int8,
        "trace_s": round(trace_s, 1),
        "compile_s": round(compile_s, 1),
        "stablehlo_bytes": hlo_bytes,
        "temp_hbm_bytes": hbm,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
