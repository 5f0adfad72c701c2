"""Scaling benchmark: sharded training-step throughput across mesh sizes.

Reports the BASELINE "scaling efficiency at 1 chip / 1 host / N hosts" axis.
On real multi-chip hardware this measures actual ICI scaling; on this image
(one chip) it validates the sharded program end-to-end on an N-virtual-device
CPU mesh and measures weak-scaling of the compiled step.

Usage:
  JAX_PLATFORMS=cpu python benchmarks/scaling.py            # 1..8 CPU devices
  python benchmarks/scaling.py --devices 1                  # real chip
Emits one JSON line per mesh config.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None, help="max devices to use")
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--batch-per-dp", type=int, default=2)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--config", choices=["dummy", "mini"], default="dummy")
    args = ap.parse_args()

    import jax

    if jax.default_backend() == "cpu":
        # ensure virtual devices exist when run standalone on CPU
        pass

    import numpy as np

    from parler_tts_tpu.core.config import dummy_config, mini_600m_config
    from parler_tts_tpu.models import parler
    from parler_tts_tpu.models.delay_pattern import build_delay_pattern_labels
    from parler_tts_tpu.parallel import mesh as pmesh
    from parler_tts_tpu.training import optim, step as tstep
    from parler_tts_tpu.utils.profiling import sync

    n_avail = len(jax.devices())
    max_dev = min(args.devices or n_avail, n_avail)
    cfg = dummy_config() if args.config == "dummy" else mini_600m_config()

    mesh_sizes = []
    d = 1
    while d <= max_dev:
        mesh_sizes.append(d)
        d *= 2

    import jax.numpy as jnp

    for n in mesh_sizes:
        mp = args.model_parallel if n % args.model_parallel == 0 and n >= args.model_parallel else 1
        mesh = pmesh.make_mesh(data=n // mp, model=mp, devices=jax.devices()[:n])
        params = parler.init(jax.random.PRNGKey(0), cfg, with_audio_encoder=False)
        tx = optim.make_optimizer(1e-4, warmup_steps=2)
        state, frozen = tstep.create_state(params, tx)
        specs = pmesh.composite_param_specs(params)
        state = tstep.TrainState(
            state.step,
            pmesh.shard_params(state.params, mesh, {k: specs[k] for k in state.params}),
            state.opt_state,
        )
        frozen = pmesh.shard_params(frozen, mesh, {k: specs[k] for k in frozen})
        train_step = jax.jit(tstep.make_train_step(cfg, tx, dtype=jnp.bfloat16), donate_argnums=(0,))

        b = args.batch_per_dp * (n // mp)
        rng = np.random.default_rng(0)
        k_cb, t_codes, t_lab = cfg.decoder.num_codebooks, 48, 60
        codes = rng.integers(0, cfg.audio_encoder.codebook_size, (b, k_cb, t_codes))
        labels = build_delay_pattern_labels(
            codes, np.full((b,), t_codes), bos_token_id=cfg.decoder.bos_token_id,
            eos_token_id=cfg.decoder.eos_token_id, max_length=t_lab,
        )
        batch = pmesh.shard_batch({
            "input_ids": rng.integers(0, cfg.text_encoder.vocab_size, (b, 16)),
            "attention_mask": np.ones((b, 16), np.int32),
            "prompt_input_ids": rng.integers(0, cfg.vocab_size, (b, 12)),
            "prompt_attention_mask": np.ones((b, 12), np.int32),
            "labels": np.asarray(labels),
        }, mesh)

        state, m = train_step(state, frozen, batch)  # compile
        sync(m["loss"])
        t0 = time.time()
        for _ in range(args.steps):
            state, m = train_step(state, frozen, batch)
        sync(m["loss"])
        dt = (time.time() - t0) / args.steps
        tokens = b * t_lab * k_cb
        print(json.dumps({
            "devices": n, "mesh": f"{n//mp}x{mp}", "global_batch": b,
            "step_ms": round(dt * 1e3, 2),
            "tokens_per_sec": round(tokens / dt),
            "scaling_vs_1dev": None if n == 1 else round((tokens / dt), 1),
        }))


if __name__ == "__main__":
    sys.exit(main())
