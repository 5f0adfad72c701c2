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


def make_train_step(cfg: ParlerTTSConfig, tx: optax.GradientTransformation, *, dtype=jnp.bfloat16):
    """Returns ``step(state, frozen, batch) -> (state, metrics)``.

    batch keys: input_ids, attention_mask, prompt_input_ids,
    prompt_attention_mask, labels (B, K, T), optional decoder_attention_mask.
    """

    def loss_fn(trainable, frozen, batch):
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
            dtype=dtype,
        )
        return loss

    def step(state: TrainState, frozen, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, frozen, batch)
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
