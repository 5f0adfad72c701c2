"""Codec pluggability (reference init_dummy_model_with_encodec.py:11-18):
a non-DAC geometry (Encodec-like 24 kHz, 8 codebooks, 75 Hz, odd-stride
upsampling) flows through init -> save -> load -> generate end-to-end."""

import dataclasses
import importlib.util

import numpy as np


def test_encodec_geometry_end_to_end(tmp_path):
    import jax

    spec = importlib.util.spec_from_file_location(
        "init_encodec", "/root/repo/helpers/model_init_scripts/init_dummy_model_with_encodec.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import sys

    save_dir = str(tmp_path / "encodec_dummy")
    old_argv = sys.argv
    sys.argv = ["init", save_dir]
    try:
        mod.main()
    except SystemExit:
        pass
    finally:
        sys.argv = old_argv

    from parler_tts_tpu.core import checkpoint as ck
    from parler_tts_tpu.generation import generate as G

    params, cfg, gen = ck.load_model(save_dir)
    assert cfg.audio_encoder.num_codebooks == 8
    assert cfg.sampling_rate == 24000
    assert cfg.audio_encoder.hop_length == 320

    gen = dataclasses.replace(gen, max_length=24)
    rng = np.random.default_rng(0)
    out = G.generate(
        params, cfg, gen,
        input_ids=rng.integers(0, 32128, (1, 8)),
        prompt_input_ids=rng.integers(0, 32128, (1, 6)),
        key=jax.random.PRNGKey(0),
    )
    assert out.codes.shape == (1, 8, 24 - 8)  # undelay drops BOS col + K-1 tail
    # odd strides (5) give 5T-1 transposed-conv lengths, so the waveform is a
    # few samples short of T*hop — same conv arithmetic as torch
    assert 0 < out.audio.shape[1] <= (24 - 8) * 320
    assert np.isfinite(np.asarray(out.audio)).all()
