"""Sharded training step.

One pjit-compiled function = forward + backward + optax update, with the
batch sharded on the ``data`` mesh axis and (optionally) weights sharded on
``model`` — the TPU equivalent of the reference's Accelerate DDP step
(``/root/reference/training/run_parler_tts_training.py:1491-1516, 1580-1588``;
SURVEY.md §3.2).  Gradient all-reduce is inserted by GSPMD over ICI.

The text encoder and audio codec stay frozen (reference
``freeze_encoders``, ``modeling_parler_tts.py:2332-2340``): they live in
``frozen`` and gradients are only taken w.r.t. ``state.params``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from parler_tts_tpu.core.config import ParlerTTSConfig
from parler_tts_tpu.models import parler

TRAINABLE_KEYS = ("decoder", "embed_prompts", "enc_to_dec_proj")


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any  # trainable subtree
    opt_state: Any


def split_params(params: Any) -> tuple[Any, Any]:
    """-> (trainable, frozen) per the reference's freezing policy."""
    trainable = {k: params[k] for k in TRAINABLE_KEYS if k in params}
    frozen = {k: v for k, v in params.items() if k not in trainable}
    return trainable, frozen


def merge_params(trainable: Any, frozen: Any) -> Any:
    return {**frozen, **trainable}


def create_state(params: Any, tx: optax.GradientTransformation) -> tuple[TrainState, Any]:
    trainable, frozen = split_params(params)
    return TrainState(jnp.zeros((), jnp.int32), trainable, tx.init(trainable)), frozen


def has_dropout(cfg: ParlerTTSConfig) -> bool:
    d = cfg.decoder
    return any(r > 0.0 for r in (d.dropout, d.attention_dropout, d.activation_dropout, d.layerdrop))


def make_train_step(
    cfg: ParlerTTSConfig,
    tx: optax.GradientTransformation,
    *,
    dtype=jnp.bfloat16,
    dropout_seed: int | None = None,
    remat: bool | str = False,
    scan_unroll: int | str | None = None,
):
    """Returns ``step(state, frozen, batch) -> (state, metrics)``.

    batch keys: input_ids, attention_mask, prompt_input_ids,
    prompt_attention_mask, labels (B, K, T), optional decoder_attention_mask.

    ``dropout_seed`` (when the config has any nonzero dropout/layerdrop rate)
    threads a per-step PRNG key — ``fold_in(PRNGKey(seed), state.step)`` — so
    dropout masks are deterministic per (seed, step) and differ across steps,
    like the reference's global-seeded torch dropout (reference trains the
    Mini recipe with ``dropout=0.1``).
    """
    use_dropout = dropout_seed is not None and has_dropout(cfg)

    def loss_fn(trainable, frozen, batch, train_key):
        params = merge_params(trainable, frozen)
        loss, _ = parler.train_forward(
            params,
            cfg,
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            prompt_input_ids=batch["prompt_input_ids"],
            prompt_attention_mask=batch["prompt_attention_mask"],
            labels=batch["labels"],
            decoder_attention_mask=batch.get("decoder_attention_mask"),
            train_key=train_key,
            remat=remat,
            scan_unroll=scan_unroll,
            dtype=dtype,
        )
        return loss

    def step(state: TrainState, frozen, batch):
        train_key = (
            jax.random.fold_in(jax.random.PRNGKey(dropout_seed), state.step)
            if use_dropout
            else None
        )
        loss, grads = jax.value_and_grad(loss_fn)(state.params, frozen, batch, train_key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "step": state.step,
        }
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return step


def make_eval_step(cfg: ParlerTTSConfig, *, dtype=jnp.bfloat16):
    """Loss-only eval pass (reference ``eval_step`` ``:1518-1533``)."""

    def step(params, batch):
        loss, _ = parler.train_forward(
            params,
            cfg,
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            prompt_input_ids=batch["prompt_input_ids"],
            prompt_attention_mask=batch["prompt_attention_mask"],
            labels=batch["labels"],
            decoder_attention_mask=batch.get("decoder_attention_mask"),
            dtype=dtype,
        )
        return {"loss": loss}

    return step
