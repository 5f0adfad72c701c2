"""The user-facing example CLIs run end-to-end: init script -> artifact
(with bundled tokenizer) -> generate_speech.py -> playable WAV.

Covers the round-5 self-contained-artifact flow through the actual script
entry points (helpers/model_init_scripts + examples/)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_init_dummy_then_generate_example(tmp_path, monkeypatch):
    from parler_tts_tpu.utils.audio_io import read_wav
    from parler_tts_tpu.utils.toy_tokenizer import build_toy_tokenizer

    model_dir = str(tmp_path / "model")
    out_wav = str(tmp_path / "out.wav")

    init = _load("/root/repo/helpers/model_init_scripts/init_dummy_model.py", "init_dummy")
    monkeypatch.setattr(sys, "argv", ["init_dummy_model.py", model_dir])
    init.main()
    assert os.path.exists(os.path.join(model_dir, "config.json"))
    # artifact always records its audio contract
    assert os.path.exists(os.path.join(model_dir, "preprocessor_config.json"))

    # bundle a tokenizer like the 600M init script / converter do, then the
    # example runs with NO --tokenizer (bundled-artifact default)
    build_toy_tokenizer(model_dir, vocab_size=100)

    gen = _load("/root/repo/examples/generate_speech.py", "gen_example")
    monkeypatch.setattr(sys, "argv", [
        "generate_speech.py", model_dir,
        "--prompt", "hey how are you",
        "--description", "a female speaker with a low pitched voice",
        "--max-seconds", "0.05", "--out", out_wav,
    ])
    gen.main()
    audio, sr = read_wav(out_wav)
    assert sr > 0 and audio.ndim == 2
    assert np.isfinite(audio).all()
