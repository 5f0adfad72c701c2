"""Training-step throughput on the Mini-600M geometry (BASELINE config 5:
the run_parler_tts_training equivalent).

Measures the sharded jit train step (forward+backward+AdamW, frozen T5,
pallas flash attention) and reports codec-tokens/s and audio-seconds of
training data per second.

Usage: python benchmarks/train_bench.py [--batch 3] [--seconds 10] [--steps 5] [--remat off|dots|full]
Emits one JSON line (incl. analytic model-FLOPs MFU vs the v5e 197 TFLOP/s
bf16 peak).
"""

import argparse
import json
import sys
import time


def _train_step_model_flops(cfg, b, t_lab, desc_len, prompt_len):
    """Analytic matmul FLOPs of one train step (see call-site comment)."""
    d = cfg.decoder
    h, L, ffn = d.hidden_size, d.num_hidden_layers, d.ffn_dim
    tf = prompt_len + t_lab  # fused decoder sequence
    te = desc_len
    # decoder layer: self QKVO + self dots + cross q,o + cross k,v + cross dots + FFN
    layer = (
        4 * 2 * tf * h * h
        + 2 * 2 * tf * tf * h
        + 2 * 2 * tf * h * h
        + 2 * 2 * te * h * h
        + 2 * 2 * tf * te * h
        + 2 * 2 * tf * h * ffn
    )
    heads = d.num_codebooks * 2 * t_lab * h * d.vocab_size
    trainable = L * layer + heads
    t5 = cfg.text_encoder
    hm, ff5 = t5.d_model, t5.d_ff
    t5_layer = 4 * 2 * te * hm * hm + 2 * 2 * te * te * hm + 3 * 2 * te * hm * ff5  # gated FFN: wi_0, wi_1, wo
    frozen = t5.num_layers * t5_layer
    proj = 2 * te * hm * h if hm != h else 0
    return b * (3 * (trainable + proj) + frozen)


V5E_PEAK_BF16_FLOPS = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=3)  # reference per-device bsz
    ap.add_argument("--seconds", type=float, default=10.0)  # audio per sample
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--remat", default="auto", choices=["auto", "off", "dots", "full"],
                    help="per-layer gradient checkpointing: auto (shape-driven "
                         "plan, training/autotune.py) | off | dots (save "
                         "matmul outputs) | full (save only layer boundaries; "
                         "the 16 GB-chip capacity unlock for batch>=8 x 10 s)")
    ap.add_argument("--no-pallas", action="store_true",
                    help="ablation: XLA attention instead of the pallas flash kernel")
    ap.add_argument("--unroll", default="auto",
                    help="layer-scan unroll factor (int, 'full', or 'auto' = "
                         "shape-driven plan)")
    ap.add_argument("--trace", default=None, metavar="LOGDIR",
                    help="capture a jax.profiler trace of the timed steps")
    args = ap.parse_args()
    remat = {"auto": "auto", "off": False, "dots": "dots", "full": True}[args.remat]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from parler_tts_tpu.core.config import mini_600m_config
    from parler_tts_tpu.ops import runtime_flags

    if args.no_pallas:
        runtime_flags.set_pallas(False)
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
    unroll = args.unroll if args.unroll in (None, "full", "auto") else int(args.unroll)
    if remat == "auto" or unroll == "auto":
        # the same shape-driven plan run_training.py applies by default
        # (round-4 VERDICT #4): champion when it fits, capacity plan if not
        from parler_tts_tpu.training.autotune import plan_train_memory

        plan = plan_train_memory(cfg, per_device_batch=b, fused_len=32 + t_lab)
        if remat == "auto":
            remat = plan.remat
        if unroll == "auto":
            unroll = plan.scan_unroll
        print(f"[plan] remat={remat} scan_unroll={unroll} "
              f"(est peak {plan.est_peak_bytes/1e9:.1f} G / {plan.hbm_limit_bytes/1e9:.2f} G)",
              file=sys.stderr)
    train_step = jax.jit(
        tstep.make_train_step(cfg, tx, dtype=jnp.bfloat16, remat=remat, scan_unroll=unroll),
        donate_argnums=(0,),
    )

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

    # analytic model-FLOPs per step for MFU: matmuls only, fwd + 2x bwd on the
    # trainable path, frozen-T5 forward once, full (non-causal-discounted)
    # attention quadratic terms, no remat-recompute FLOPs (MFU counts model
    # FLOPs, not hardware FLOPs).  v5e peak: 197 TFLOP/s bf16.
    flops = _train_step_model_flops(cfg, b, t_lab, desc_len=48, prompt_len=32)

    import contextlib

    from parler_tts_tpu.utils.profiling import trace

    t0 = time.time()
    with trace(args.trace, perfetto=True) if args.trace else contextlib.nullcontext():
        for _ in range(args.steps):
            state, m = train_step(state, frozen, batch)
        sync(m["loss"])
    dt = (time.time() - t0) / args.steps

    tokens = b * t_lab * cfg.decoder.num_codebooks
    print(json.dumps({
        "metric": "train_step",
        "batch": b,
        "label_frames": t_lab,
        "remat": str(remat),
        "scan_unroll": str(unroll),
        "step_s": round(dt, 3),
        "codec_tokens_per_sec": round(tokens / dt),
        "train_audio_seconds_per_sec": round(b * args.seconds / dt, 2),
        "model_tflops_per_step": round(flops / 1e12, 2),
        "mfu_pct": round(100.0 * flops / dt / V5E_PEAK_BF16_FLOPS, 1),
        "compile_s": round(compile_s, 1),
        "loss": round(float(m["loss"]), 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
