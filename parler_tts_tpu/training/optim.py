"""Optimizer + LR schedule factory.

Replaces the reference's torch AdamW + HF ``get_scheduler``
(``/root/reference/training/run_parler_tts_training.py:1360-1375``) with
optax.  Defaults follow the Mini v0.1 recipe
(``helpers/training_configs/starting_point_0.01.json:43-53``): AdamW
β=(0.9, 0.99), wd 0.01, lr 9.5e-4 constant-with-warmup (20k steps).
"""

from __future__ import annotations

import optax


def make_schedule(
    name: str,
    learning_rate: float,
    *,
    warmup_steps: int = 0,
    total_steps: int | None = None,
) -> optax.Schedule:
    """HF ``get_scheduler`` names: constant_with_warmup | linear | cosine |
    constant."""
    if name == "constant":
        return optax.constant_schedule(learning_rate)
    if name == "constant_with_warmup":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
                optax.constant_schedule(learning_rate),
            ],
            [max(warmup_steps, 1)],
        )
    if name == "linear":
        assert total_steps is not None
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
                optax.linear_schedule(learning_rate, 0.0, total_steps - warmup_steps),
            ],
            [max(warmup_steps, 1)],
        )
    if name == "cosine":
        assert total_steps is not None
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, max(warmup_steps, 1), total_steps
        )
    raise ValueError(f"unknown schedule {name!r}")


def make_optimizer(
    learning_rate: float = 9.5e-4,
    *,
    schedule: str = "constant_with_warmup",
    warmup_steps: int = 20000,
    total_steps: int | None = None,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    max_grad_norm: float | None = 1.0,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping and optional gradient accumulation
    (the reference accumulates 8 micro-steps, ``starting_point_0.01.json:45``;
    clipping at ``run_parler_tts_training.py:1584-1585``)."""
    sched = make_schedule(schedule, learning_rate, warmup_steps=warmup_steps, total_steps=total_steps)
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(sched, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
