"""Subprocess entry point for the 2-process multi-host tests.

Each worker is a separate OS process joined into one JAX runtime via
``jax.distributed.initialize`` on localhost — the CPU-backend stand-in for
N TPU hosts (SURVEY.md §4: multi-host tests without a cluster).  Modes:

* ``train``  — run the training CLI on a synthetic corpus as one of N
  processes (2 local CPU devices each) and dump the per-step losses;
* ``single`` — the single-process control run with the same GLOBAL device
  count and batch, for bit-identical-loss comparison;
* ``prepare`` — run :func:`prepare_hf` over a tiny on-disk dataset and dump
  which rows this host encoded (proving per-host sharding of the frozen-codec
  pass, reference ``run_parler_tts_training.py:1137-1161``), plus the
  gathered full-order view every host reconstructs.

Invoked as::

    python tests/multihost_worker.py <mode> <process_id> <num_processes> \
        <coordinator_port> <workdir>

Writes ``<workdir>/result_p<process_id>.json``.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax
import jax._src.xla_bridge as _xb

# the image's sitecustomize registers the axon (TPU tunnel) backend and pins
# jax_platforms=axon; tests must run on CPU (same dance as tests/conftest.py)
_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    mode, pid, nproc, port, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5]
    )
    # "single" is the 1-process control for the 2x2-device distributed train
    # run: same 4 GLOBAL devices, no distributed runtime
    local_devices = 4 if mode == "single" else 2
    jax.config.update("jax_num_cpu_devices", local_devices)
    if mode != "single" and nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    result = {"mode": mode, "pid": pid}

    if mode in ("train", "single", "train_stream"):
        from parler_tts_tpu.training import run_training

        out = os.path.join(workdir, f"train_p{pid}")
        if mode.endswith("_stream"):
            # streaming-mode corpus training (round-3 VERDICT #7): rows flow
            # through an IterableDataset, each host keeps only its shard and
            # the loop runs lockstep host-local batches
            tok_dir = os.path.join(workdir, "tok")
            args = [
                "--model_name_or_path", os.path.join(workdir, "model"),
                "--train_dataset_name", os.path.join(workdir, "corpus"),
                "--streaming", "true",
                "--max_train_samples", "8",
                "--target_audio_column_name", "audio_raw",
                "--description_tokenizer_name", tok_dir,
                "--prompt_tokenizer_name", tok_dir,
                "--min_duration_in_seconds", "0.01",
                "--audio_encoder_batch_size", "2",
            ]
        else:
            args = [
                "--model_name_or_path", "dummy",
                "--train_dataset_name", "synthetic://32",
            ]
        run_training.main(args + [
            "--output_dir", out,
            "--per_device_train_batch_size", "1",
            "--max_steps", "3",
            "--logging_steps", "1",
            "--save_steps", "0",
            "--num_train_epochs", "1",
        ])
        losses = []
        with open(os.path.join(out, "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if "train/loss" in rec:
                    losses.append(rec["train/loss"])
        result["losses"] = losses

    elif mode == "prepare":
        import hashlib

        from parler_tts_tpu.core.config import (
            DACConfig, DecoderConfig, ParlerTTSConfig, T5EncoderConfig,
        )
        from parler_tts_tpu.models import parler
        from parler_tts_tpu.parallel import distributed as dist
        from parler_tts_tpu.training import data as D
        from parler_tts_tpu.training import run_training
        from parler_tts_tpu.training.args import DataTrainingArguments, ModelArguments

        cfg = ParlerTTSConfig(
            vocab_size=160,
            text_encoder=T5EncoderConfig(vocab_size=160, d_model=24, d_kv=6, d_ff=48,
                                         num_layers=1, num_heads=4),
            audio_encoder=DACConfig(
                num_codebooks=4, codebook_size=32, codebook_dim=4, latent_dim=16,
                encoder_hidden_size=8, downsampling_ratios=(2, 4),
                decoder_hidden_size=16, upsampling_ratios=(4, 2),
                sampling_rate=16000, frame_rate=2000,
            ),
            decoder=DecoderConfig(
                vocab_size=40, hidden_size=32, num_hidden_layers=1,
                num_attention_heads=4, ffn_dim=64, num_codebooks=4,
                max_position_embeddings=256, pad_token_id=32, eos_token_id=32,
                bos_token_id=33,
            ),
        )
        params = parler.init(jax.random.PRNGKey(0), cfg)

        # spy on the codec pass: which waveforms did THIS host encode?
        encoded_lengths: list[int] = []
        orig = D.tokenize_audio_batches

        def spy(dac_params, dac_cfg, arrays, **kw):
            encoded_lengths.extend(len(a) for a in arrays)
            return orig(dac_params, dac_cfg, arrays, **kw)

        D.tokenize_audio_batches = spy

        tok_dir = os.path.join(workdir, "tok")
        data_args = DataTrainingArguments(
            train_dataset_name=os.path.join(workdir, "corpus"),
            target_audio_column_name="audio_raw",
            min_duration_in_seconds=0.01,
            max_duration_in_seconds=10.0,
            audio_encoder_batch_size=2,
            temporary_save_to_disk=os.path.join(workdir, "codes_cache"),
        )
        model_args = ModelArguments(
            model_name_or_path=tok_dir,
            description_tokenizer_name=tok_dir,
            prompt_tokenizer_name=tok_dir,
        )
        samples = run_training.prepare_hf(
            data_args, model_args, cfg, params["audio_encoder"], split="train"
        )
        result["encoded"] = len(encoded_lengths)
        result["idx"] = [int(s["_idx"]) for s in samples]
        result["labels_md5"] = {
            int(s["_idx"]): hashlib.md5(np.ascontiguousarray(s["labels"]).tobytes()).hexdigest()
            for s in samples
        }
        # second pass: the incremental CodesCache must make re-preparation
        # encode nothing
        encoded_lengths.clear()
        run_training.prepare_hf(
            data_args, model_args, cfg, params["audio_encoder"], split="train"
        )
        result["encoded_rerun"] = len(encoded_lengths)
        # every host reconstructs the identical full-order dataset
        gathered = dist.gather_prepared(samples)
        result["gathered_idx"] = [int(s["_idx"]) for s in gathered]

    elif mode == "prepare_scale":
        # bounded-memory preparation at corpus scale (round-3 VERDICT #7):
        # 1000 streamed 1-second rows (64 MB of fp32 waveforms) flow through
        # prepare_hf; peak RSS must stay O(audio_encoder_batch_size), not
        # O(corpus).  The stream is injected as a generator so the
        # measurement sees prepare_hf's own buffering, not dataset mmap.
        import resource

        import datasets as hfds

        from parler_tts_tpu.core.config import DACConfig, DecoderConfig, ParlerTTSConfig, T5EncoderConfig
        from parler_tts_tpu.models import dac as dac_mod
        from parler_tts_tpu.training import data as D
        from parler_tts_tpu.training import run_training
        from parler_tts_tpu.training.args import DataTrainingArguments, ModelArguments

        n_rows, sr = 1000, 16000
        # hop-32 codec so prepared labels (int32 K x T/32) are ~1/16 of the
        # raw waveform bytes — keeps the retained-output small vs the corpus
        cfg = ParlerTTSConfig(
            vocab_size=160,
            text_encoder=T5EncoderConfig(vocab_size=160, d_model=24, d_kv=6, d_ff=48,
                                         num_layers=1, num_heads=4),
            audio_encoder=DACConfig(
                num_codebooks=2, codebook_size=32, codebook_dim=4, latent_dim=16,
                encoder_hidden_size=8, downsampling_ratios=(4, 8),
                decoder_hidden_size=16, upsampling_ratios=(8, 4),
                sampling_rate=sr, frame_rate=500,
            ),
            decoder=DecoderConfig(
                vocab_size=40, hidden_size=32, num_hidden_layers=1,
                num_attention_heads=4, ffn_dim=64, num_codebooks=2,
                max_position_embeddings=256, pad_token_id=32, eos_token_id=32,
                bos_token_id=33,
            ),
        )
        dac_params = dac_mod.init(jax.random.PRNGKey(0), cfg.audio_encoder)

        def rows():
            rng = np.random.default_rng(0)
            for i in range(n_rows):
                yield {
                    "audio_raw": {"array": rng.standard_normal(sr).astype(np.float32),
                                  "sampling_rate": sr},
                    "text": f"say row number {i}",
                    "description": "a female speaker with a low pitched voice",
                }

        D.load_multiple_datasets = lambda *a, **k: hfds.IterableDataset.from_generator(rows)

        tok_dir = os.path.join(workdir, "tok")
        data_args = DataTrainingArguments(
            train_dataset_name="generator://scale",
            target_audio_column_name="audio_raw",
            min_duration_in_seconds=0.01,
            max_duration_in_seconds=10.0,
            audio_encoder_batch_size=16,
            streaming=True,
        )
        model_args = ModelArguments(
            model_name_or_path=tok_dir,
            description_tokenizer_name=tok_dir,
            prompt_tokenizer_name=tok_dir,
        )
        # first pass warms every XLA:CPU compile (encoder at both batch
        # shapes, label build) — LLVM's one-time compile peak is ~350 MB of
        # maxrss and would mask the property under test; the SECOND pass is
        # the honest steady-state measurement of preparation buffering
        run_training.prepare_hf(
            data_args, model_args, cfg, dac_params, split="train", max_samples=n_rows
        )
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on linux
        samples = run_training.prepare_hf(
            data_args, model_args, cfg, dac_params, split="train", max_samples=n_rows
        )
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        result["n_samples"] = len(samples)
        result["corpus_wav_mb"] = round(n_rows * sr * 4 / 2**20, 1)
        result["rss_delta_mb"] = round((rss1 - rss0) / 1024, 1)
        result["retained_mb"] = round(
            sum(v.nbytes for s in samples for v in s.values() if isinstance(v, np.ndarray)) / 2**20, 1
        )
        result["label_frames"] = int(samples[0]["labels"].shape[1])
    else:
        raise SystemExit(f"unknown mode {mode!r}")

    with open(os.path.join(workdir, f"result_p{pid}.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
