"""Training-step throughput on the Mini-600M geometry (BASELINE config 5:
the run_parler_tts_training equivalent).

Measures the sharded jit train step (forward+backward+AdamW, frozen T5,
pallas flash attention) and reports codec-tokens/s and audio-seconds of
training data per second.

Usage: python benchmarks/train_bench.py [--batch 3] [--seconds 10] [--steps 5]
Emits one JSON line.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=3)  # reference per-device bsz
    ap.add_argument("--seconds", type=float, default=10.0)  # audio per sample
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from parler_tts_tpu.core.config import mini_600m_config
    from parler_tts_tpu.models import parler
    from parler_tts_tpu.models.delay_pattern import build_delay_pattern_labels
    from parler_tts_tpu.training import optim, step as tstep
    from parler_tts_tpu.utils.profiling import sync

    cfg = mini_600m_config()
    b = args.batch
    t_codes = int(args.seconds * cfg.frame_rate)
    t_lab = t_codes + cfg.decoder.num_codebooks + 2

    params = jax.jit(lambda k: parler.init(k, cfg, with_audio_encoder=False))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    tx = optim.make_optimizer(9.5e-4, warmup_steps=100)
    state, frozen = tstep.create_state(params, tx)
    train_step = jax.jit(tstep.make_train_step(cfg, tx, dtype=jnp.bfloat16), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 1024, (b, cfg.decoder.num_codebooks, t_codes))
    labels = build_delay_pattern_labels(
        codes, np.full((b,), t_codes), bos_token_id=cfg.decoder.bos_token_id,
        eos_token_id=cfg.decoder.eos_token_id, max_length=t_lab,
    )
    batch = {
        "input_ids": rng.integers(0, 32128, (b, 48)),
        "attention_mask": np.ones((b, 48), np.int32),
        "prompt_input_ids": rng.integers(0, 32128, (b, 32)),
        "prompt_attention_mask": np.ones((b, 32), np.int32),
        "labels": np.asarray(labels),
    }

    t0 = time.time()
    state, m = train_step(state, frozen, batch)
    sync(m["loss"])
    compile_s = time.time() - t0
    print(f"compile+first {compile_s:.1f}s loss={float(m['loss']):.3f}", file=sys.stderr)

    t0 = time.time()
    for _ in range(args.steps):
        state, m = train_step(state, frozen, batch)
    sync(m["loss"])
    dt = (time.time() - t0) / args.steps

    tokens = b * t_lab * cfg.decoder.num_codebooks
    print(json.dumps({
        "metric": "train_step",
        "batch": b,
        "label_frames": t_lab,
        "step_s": round(dt, 3),
        "codec_tokens_per_sec": round(tokens / dt),
        "train_audio_seconds_per_sec": round(b * args.seconds / dt, 2),
        "compile_s": round(compile_s, 1),
        "loss": round(float(m["loss"]), 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
