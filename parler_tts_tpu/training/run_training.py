"""Training CLI — the TPU-native equivalent of the reference's
``accelerate launch training/run_parler_tts_training.py <config.json>``
(``/root/reference/training/run_parler_tts_training.py:783-1759``; call
stacks SURVEY.md §3.2-§3.4).

Usage::

    python -m parler_tts_tpu.training.run_training helpers/training_configs/foo.json
    python -m parler_tts_tpu.training.run_training --train_dataset_name synthetic://256 ...

Stages (mirroring the reference's ``main()``):
  1. args (JSON or flags) → seed → mesh ((data, model) axes replace DDP);
  2. model load/init (``model_name_or_path`` artifact dir, else from-scratch
     dummy/mini geometry);
  3. data: dataset load+merge → text tokenization → offline DAC audio
     tokenization (JAX, per-host shard) → delay-pattern labels → filters;
     ``synthetic://N`` fabricates N random samples for smoke/perf runs
     (this image has no libsndfile, so audio-column datasets need
     pre-tokenized codes — see ``prepare_synthetic`` / ``prepare_hf``);
  4. optimizer (AdamW + schedule), resume from rotating checkpoints;
  5. epoch/step loop: sharded jit train step, grad accumulation, clipping,
     periodic save+rotate, eval loss pass, JSONL/wandb metrics.
"""

from __future__ import annotations

import math
import os
import sys
import time
from typing import Any

import numpy as np


def prepare_synthetic(n: int, cfg, *, seed: int = 0, desc_len: int = 24, prompt_len: int = 16,
                      codes_len: int = 64) -> list[dict]:
    """Fabricate a dataset of (description ids, prompt ids, codec labels).

    Fills the role of the reference's dummy-dataset smoke recipe
    (``helpers/training_configs/librispeech_tts_r_300M_dummy.json`` — 96
    samples; SURVEY.md §4) without audio files.
    """
    from parler_tts_tpu.training.data import build_labels

    rng = np.random.default_rng(seed)
    dcfg = cfg.decoder
    samples = []
    for i in range(n):
        t = int(rng.integers(codes_len // 2, codes_len + 1))
        codes = rng.integers(0, cfg.audio_encoder.codebook_size, (dcfg.num_codebooks, t)).astype(np.int16)
        labels, _ = build_labels(
            [codes], bos_token_id=dcfg.bos_token_id, eos_token_id=dcfg.eos_token_id,
            max_length=codes_len + dcfg.num_codebooks + 2,
        )
        samples.append(
            {
                "input_ids": rng.integers(0, cfg.text_encoder.vocab_size, (int(rng.integers(8, desc_len + 1)),)),
                "prompt_input_ids": rng.integers(0, cfg.vocab_size, (int(rng.integers(6, prompt_len + 1)),)),
                "labels": labels[0],
            }
        )
    return samples


def prepare_hf(data_args, model_args, cfg, dac_params) -> list[dict]:
    """Real-dataset path: load+merge HF datasets, tokenize text columns,
    run the frozen DAC over audio, build labels (reference ``:935-1257``)."""
    from transformers import AutoTokenizer

    from parler_tts_tpu.training import data as D

    specs = D.parse_dataset_spec(
        data_args.train_dataset_name,
        data_args.train_dataset_config_name,
        data_args.train_split_name,
        data_args.train_metadata_dataset_name,
    )
    ds = D.load_multiple_datasets(specs, sampling_rate=cfg.audio_encoder.sampling_rate)

    desc_tok = AutoTokenizer.from_pretrained(model_args.description_tokenizer_name or model_args.model_name_or_path)
    prompt_tok = AutoTokenizer.from_pretrained(model_args.prompt_tokenizer_name or model_args.model_name_or_path)

    sr = cfg.audio_encoder.sampling_rate
    min_len = int(data_args.min_duration_in_seconds * sr)
    max_len = int(data_args.max_duration_in_seconds * sr)

    audio, rows = [], []
    for ex in ds:
        wav = np.asarray(ex[data_args.target_audio_column_name]["array"], np.float32)
        if not (min_len <= len(wav) <= max_len):  # duration filter (:373-381)
            continue
        if len(ex[data_args.prompt_column_name]) > data_args.max_text_length:
            continue
        audio.append(wav)
        rows.append(ex)

    codes_list = D.tokenize_audio_batches(
        dac_params, cfg.audio_encoder, audio, batch_size=data_args.audio_encoder_batch_size
    )
    t_lab = int(data_args.max_duration_in_seconds * cfg.audio_encoder.frame_rate) + cfg.decoder.num_codebooks + 2
    samples = []
    for ex, codes in zip(rows, codes_list):
        labels, _ = D.build_labels(
            [codes.astype(np.int32)], bos_token_id=cfg.decoder.bos_token_id,
            eos_token_id=cfg.decoder.eos_token_id, max_length=min(t_lab, codes.shape[1] + cfg.decoder.num_codebooks + 2),
        )
        samples.append(
            {
                "input_ids": np.asarray(desc_tok(ex[data_args.description_column_name]).input_ids),
                "prompt_input_ids": np.asarray(prompt_tok(ex[data_args.prompt_column_name]).input_ids),
                "labels": labels[0],
            }
        )
    return samples


def main(argv: list[str] | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from parler_tts_tpu.core import checkpoint as ck
    from parler_tts_tpu.core.config import GenerationConfig, dummy_config, mini_600m_config
    from parler_tts_tpu.models import parler
    from parler_tts_tpu.parallel import mesh as pmesh
    from parler_tts_tpu.training import optim
    from parler_tts_tpu.training import step as tstep
    from parler_tts_tpu.training.args import parse_args
    from parler_tts_tpu.training.data import Collator, batches
    from parler_tts_tpu.training.logging_utils import MetricLogger

    from parler_tts_tpu.parallel import distributed as dist

    model_args, data_args, train_args = parse_args(argv)
    np.random.seed(train_args.seed)

    # ----- multi-host + mesh (replaces Accelerate/DDP init, :819-830) -----
    dist.initialize()
    n_dev = len(jax.devices())
    model_par = min(train_args.model_parallel_size, n_dev)
    mesh = pmesh.make_mesh(data=n_dev // model_par, model=model_par)

    # ----- model -----
    gen_cfg = GenerationConfig()
    if model_args.model_name_or_path and os.path.isdir(model_args.model_name_or_path):
        params, cfg, gen_cfg = ck.load_model(model_args.model_name_or_path)
    else:
        cfg = dummy_config() if model_args.model_name_or_path == "dummy" else mini_600m_config()
        params = parler.init(jax.random.PRNGKey(train_args.seed), cfg, with_audio_encoder=False)

    # ----- data -----
    if data_args.train_dataset_name.startswith("synthetic://"):
        n = int(data_args.train_dataset_name.split("://", 1)[1])
        samples = prepare_synthetic(n, cfg, seed=train_args.seed)
    else:
        samples = prepare_hf(data_args, model_args, cfg, params.get("audio_encoder"))
    if data_args.max_train_samples:
        samples = samples[: data_args.max_train_samples]
    if jax.process_count() > 1:
        # per-host shard of the dataset (replaces Accelerate dispatch,
        # reference :1137-1145); global batch assembled across hosts below
        samples = dist.process_shard(samples)
    if data_args.preprocessing_only:  # reference escape hatch :415-426
        print(f"preprocessing_only: prepared {len(samples)} samples")
        return {"samples": len(samples)}

    label_len = max(s["labels"].shape[1] for s in samples)
    collator = Collator(
        description_pad_id=0,
        prompt_pad_id=0,
        max_description_len=max(len(s["input_ids"]) for s in samples),
        max_prompt_len=max(len(s["prompt_input_ids"]) for s in samples),
        label_len=label_len,
    )

    # ----- optimizer + state -----
    per_step = train_args.per_device_train_batch_size * (n_dev // model_par)
    steps_per_epoch = len(samples) // per_step // max(1, train_args.gradient_accumulation_steps)
    total_steps = (
        train_args.max_steps
        if train_args.max_steps > 0
        else int(train_args.num_train_epochs * max(1, steps_per_epoch))
    )
    tx = optim.make_optimizer(
        train_args.learning_rate,
        schedule=train_args.lr_scheduler_type,
        warmup_steps=train_args.warmup_steps,
        total_steps=total_steps,
        b1=train_args.adam_beta1,
        b2=train_args.adam_beta2,
        eps=train_args.adam_epsilon,
        weight_decay=train_args.weight_decay,
        max_grad_norm=train_args.max_grad_norm,
        grad_accum_steps=train_args.gradient_accumulation_steps,
    )
    state, frozen = tstep.create_state(params, tx)

    # shard params/frozen on mesh
    full_specs = pmesh.composite_param_specs(params)
    state = tstep.TrainState(
        state.step,
        pmesh.shard_params(state.params, mesh, {k: full_specs[k] for k in state.params}),
        state.opt_state,
    )
    frozen = pmesh.shard_params(frozen, mesh, {k: full_specs[k] for k in frozen})

    # ----- resume (reference :853-866, 1455-1467) -----
    start_epoch, done_steps = 0, 0
    resume = train_args.resume_from_checkpoint or ck.latest_checkpoint(train_args.output_dir)
    if resume and os.path.isdir(resume):
        payload, meta = ck.load_train_state(resume)
        opt_state = state.opt_state
        if "opt_state" in payload:
            # orbax restores plain dicts; rebuild optax NamedTuple structure
            opt_state = jax.tree.unflatten(
                jax.tree.structure(state.opt_state), jax.tree.leaves(payload["opt_state"])
            )
        state = tstep.TrainState(jnp.asarray(meta.get("step", 0), jnp.int32), payload["params"], opt_state)
        done_steps = int(meta.get("step", 0))
        start_epoch = int(meta.get("epoch", 0))
        print(f"resumed from {resume} at step {done_steps}, epoch {start_epoch}")

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[train_args.dtype]
    train_step = jax.jit(tstep.make_train_step(cfg, tx, dtype=dtype), donate_argnums=(0,))
    eval_step = jax.jit(tstep.make_eval_step(cfg, dtype=dtype))

    logger = MetricLogger(train_args.output_dir, report_to=train_args.report_to,
                          config={"total_steps": total_steps, "per_step_batch": per_step})

    # ----- loop (reference :1558-1752) -----
    micro = 0
    t_start = time.time()
    stop = False
    per_host_step = max(1, per_step // jax.process_count())
    for epoch in range(start_epoch, math.ceil(train_args.num_train_epochs)):
        for batch in batches(samples, collator, per_host_step, seed=train_args.seed + epoch):
            batch = dist.host_local_to_global(batch, mesh)
            state, metrics = train_step(state, frozen, batch)
            micro += 1
            if micro % max(1, train_args.gradient_accumulation_steps):
                continue
            step_i = int(metrics["step"]) + 1
            if step_i % train_args.logging_steps == 0:
                logger.log(
                    {"loss": metrics["loss"], "grad_norm": metrics["grad_norm"],
                     "steps_per_sec": step_i / max(1e-9, time.time() - t_start)},
                    step=step_i,
                )
            if train_args.save_steps and step_i % train_args.save_steps == 0:
                path = os.path.join(train_args.output_dir, ck.checkpoint_name(step_i, epoch))
                ck.save_train_state(path, params=state.params, opt_state=state.opt_state,
                                    step=step_i, epoch=epoch)
                ck.rotate_checkpoints(train_args.output_dir, train_args.save_total_limit)
            if train_args.do_eval and train_args.eval_steps and step_i % train_args.eval_steps == 0:
                losses = []
                eparams = tstep.merge_params(state.params, frozen)
                for ebatch in batches(samples[: 4 * per_step], collator, per_step, shuffle=False):
                    ebatch = dist.host_local_to_global(ebatch, mesh)
                    losses.append(float(eval_step(eparams, ebatch)["loss"]))
                emetrics = {"loss": float(np.mean(losses))}
                # generation pass (reference :1676-1744): sample a batch,
                # report generated-length stats (+ WER/CLAP when available)
                if train_args.generation_max_length:
                    from parler_tts_tpu.generation import generate as Ggen

                    gbatch = next(batches(samples[:per_step], collator, min(per_step, 4), shuffle=False))
                    gout = Ggen.generate(
                        eparams, cfg,
                        __import__("dataclasses").replace(
                            gen_cfg,
                            max_length=train_args.generation_max_length,
                            decoder_start_token_id=cfg.decoder.bos_token_id,
                            pad_token_id=cfg.decoder.pad_token_id,
                            bos_token_id=cfg.decoder.bos_token_id,
                            eos_token_id=cfg.decoder.eos_token_id,
                        ),
                        input_ids=gbatch["input_ids"],
                        attention_mask=gbatch["attention_mask"],
                        prompt_input_ids=gbatch["prompt_input_ids"],
                        prompt_attention_mask=gbatch["prompt_attention_mask"],
                        key=jax.random.PRNGKey(step_i),
                        vocode="audio_encoder" in eparams,
                        dtype=dtype,
                    )
                    emetrics["gen_code_len_mean"] = float(np.mean(np.asarray(gout.code_lengths)))
                logger.log(emetrics, step=step_i, prefix="eval")
            if train_args.max_steps > 0 and step_i >= train_args.max_steps:
                stop = True
                break
        if stop:
            break

    # ----- final artifact (reference :1436-1453) -----
    final = tstep.merge_params(jax.device_get(state.params), jax.device_get(frozen))
    final_dir = os.path.join(train_args.output_dir, "final")
    ck.save_model(final_dir, final, cfg, gen_cfg)
    if train_args.push_to_hub and train_args.hub_model_id and jax.process_index() == 0:
        # reference pushes during/after training (:1626-1630); egress-gated
        try:
            from huggingface_hub import HfApi

            HfApi().upload_folder(folder_path=final_dir, repo_id=train_args.hub_model_id)
            print(f"pushed final artifact to {train_args.hub_model_id}")
        except Exception as e:
            print(f"hub push skipped: {e}", file=sys.stderr)
    final_step = int(state.step)
    logger.log({"final_step": final_step, "wall_s": time.time() - t_start}, step=final_step)
    logger.close()
    return {"steps": final_step, "output_dir": train_args.output_dir}


if __name__ == "__main__":
    main()
