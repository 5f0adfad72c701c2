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
