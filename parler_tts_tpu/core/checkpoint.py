"""Checkpoint save/load/rotate/resume.

TPU-native replacement for the reference's Accelerate checkpointing
(``/root/reference/training/run_parler_tts_training.py:79-123, 853-866,
1410-1482, 1611-1624``; SURVEY.md §5.4):

* directory pattern ``checkpoint-{step}-epoch-{epoch}`` (reference ``:79``),
* latest-checkpoint discovery by regex (reference ``:82-91``),
* rotation keeping the ``save_total_limit`` newest (reference ``:94-123``),
* resume = restore params/opt-state/step + data-iterator epoch bookkeeping.

Storage is Orbax (sharded, async-capable) for train state, plus a plain
``config.json``/``generation_config.json`` pair so a checkpoint directory is
a complete model artifact like the reference's ``save_pretrained`` output
(reference ``:1436-1453``).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from parler_tts_tpu.core.config import GenerationConfig, ParlerTTSConfig

_CKPT_RE = re.compile(r"checkpoint-(\d+)-epoch-(\d+)")


def checkpoint_name(step: int, epoch: int) -> str:
    return f"checkpoint-{step}-epoch-{epoch}"


def sorted_checkpoints(output_dir: str) -> list[str]:
    """Checkpoint dirs sorted oldest-first by step (reference ``:94-105``)."""
    if not os.path.isdir(output_dir):
        return []
    found = []
    for name in os.listdir(output_dir):
        m = _CKPT_RE.fullmatch(name)
        if m and os.path.isdir(os.path.join(output_dir, name)):
            found.append((int(m.group(1)), os.path.join(output_dir, name)))
    return [p for _, p in sorted(found)]


def latest_checkpoint(output_dir: str) -> str | None:
    """Most recent checkpoint dir, or None (reference ``:82-91``)."""
    ckpts = sorted_checkpoints(output_dir)
    return ckpts[-1] if ckpts else None


def parse_step_epoch(path: str) -> tuple[int, int]:
    m = _CKPT_RE.search(os.path.basename(os.path.normpath(path)))
    if not m:
        raise ValueError(f"not a checkpoint dir: {path}")
    return int(m.group(1)), int(m.group(2))


def rotate_checkpoints(output_dir: str, save_total_limit: int | None) -> None:
    """Delete oldest checkpoints beyond the limit (reference ``:108-123``)."""
    if not save_total_limit or save_total_limit <= 0:
        return
    ckpts = sorted_checkpoints(output_dir)
    for path in ckpts[: max(0, len(ckpts) - save_total_limit)]:
        shutil.rmtree(path, ignore_errors=True)


def save_train_state(
    path: str,
    *,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
    epoch: int = 0,
    extra: dict | None = None,
) -> None:
    """Write a train-state checkpoint (sharded arrays via Orbax)."""
    path = os.path.abspath(path)
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), payload, force=True)
    meta = {"step": int(step), "epoch": int(epoch), **(extra or {})}
    with open(os.path.join(path, "trainer_state.json"), "w") as f:
        json.dump(meta, f)


def load_train_state(path: str, *, template: Any | None = None) -> tuple[dict, dict]:
    """-> (payload {params[, opt_state]}, meta {step, epoch, ...}).

    ``template`` (matching pytree of arrays/ShapeDtypeStructs) restores with
    the template's shardings; None restores as host numpy.
    """
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            restore_args = jax.tree.map(
                lambda x: ocp.ArrayRestoreArgs(sharding=getattr(x, "sharding", None)), template
            )
            payload = ckptr.restore(
                os.path.join(path, "state"),
                args=ocp.args.PyTreeRestore(item=template, restore_args=restore_args),
            )
        else:
            payload = ckptr.restore(os.path.join(path, "state"))
    meta_path = os.path.join(path, "trainer_state.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return payload, meta


# ---------------------------------------------------------------------------
# Model artifacts (save_pretrained/from_pretrained equivalents)
# ---------------------------------------------------------------------------


def save_model(
    path: str,
    params: Any,
    cfg: ParlerTTSConfig,
    gen: GenerationConfig | None = None,
    *,
    tokenizer: Any = None,
    feature_extractor: Any = None,
) -> None:
    """Complete self-contained model artifact: config.json +
    generation_config.json + sharded weights + tokenizer files +
    preprocessor_config.json (the reference's ``save_pretrained`` directory
    contract including tokenizer/feature-extractor,
    ``run_parler_tts_training.py:1436-1453``; round-4 VERDICT #6).

    ``tokenizer``: any HF-style tokenizer with ``save_pretrained`` (the
    reference saves ONE — prompt and description tokenizers are the same
    flan-t5 in every recipe).  ``feature_extractor``: HF-style object with
    ``save_pretrained``; when None a minimal ``preprocessor_config.json`` is
    synthesized from the audio-encoder config so the artifact still records
    its audio I/O contract."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    cfg.save(os.path.join(path, "config.json"))
    (gen or GenerationConfig()).save(os.path.join(path, "generation_config.json"))
    if tokenizer is not None:
        tokenizer.save_pretrained(path)
    if feature_extractor is not None:
        feature_extractor.save_pretrained(path)
    else:
        # EncodecFeatureExtractor-shaped stub (reference wraps DAC with
        # EncodecFeatureExtractor(sampling_rate=44100),
        # push_dac_to_hub.py:9-16) — enough for transformers to reload it
        acfg = cfg.audio_encoder
        with open(os.path.join(path, "preprocessor_config.json"), "w") as f:
            json.dump({
                "feature_extractor_type": "EncodecFeatureExtractor",
                "feature_size": 1,
                "padding_side": "right",
                "padding_value": 0.0,
                "return_attention_mask": True,
                "sampling_rate": int(acfg.sampling_rate),
                "chunk_length_s": getattr(acfg, "chunk_length_s", None),
                "overlap": getattr(acfg, "overlap", None),
            }, f, indent=2)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "weights"), params, force=True)


def load_model(path: str) -> tuple[Any, ParlerTTSConfig, GenerationConfig]:
    """-> (params, config, generation_config) — ``from_pretrained``."""
    path = os.path.abspath(path)
    cfg = ParlerTTSConfig.load(os.path.join(path, "config.json"))
    gen_path = os.path.join(path, "generation_config.json")
    gen = GenerationConfig.load(gen_path) if os.path.exists(gen_path) else GenerationConfig()
    with ocp.PyTreeCheckpointer() as ckptr:
        weights = os.path.join(path, "weights")
        if jax.process_count() > 1:
            # under a multi-process runtime orbax requires explicit
            # shardings; model checkpoints are host-replicated (every host
            # loads the full tree and the train/infer step shards them)
            from jax.sharding import NamedSharding, PartitionSpec

            mesh = jax.sharding.Mesh(np.asarray(jax.local_devices()[:1]), ("_load",))
            replicated = NamedSharding(mesh, PartitionSpec())
            meta = ckptr.metadata(weights).item_metadata
            args = jax.tree.map(
                lambda m: ocp.ArrayRestoreArgs(sharding=replicated), meta.tree
            )
            params = ckptr.restore(weights, restore_args=args)
            # hand plain host arrays to callers (placement is re-decided by
            # the consuming jit / mesh, exactly like the single-process path)
            params = jax.tree.map(np.asarray, params)
        else:
            params = ckptr.restore(weights)
    return params, cfg, gen
