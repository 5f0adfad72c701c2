"""Checkpoint migration: a reference (HF parler-tts) checkpoint directory
loads into this framework and generates token-identical output."""

import dataclasses
import json
import os

import numpy as np
import torch

from parler_tts_tpu.core.from_reference import from_reference_pretrained
from parler_tts_tpu.generation import generate as G
from tests.test_generation import BOS, MAXLEN, PAD, build_models, reference_decode_loop


def _write_checkpoint(rmodel, path, *, safetensors: bool):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(rmodel.config.to_dict(), f)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump(
            {"max_length": MAXLEN, "do_sample": True, "bos_token_id": BOS,
             "pad_token_id": PAD, "eos_token_id": PAD, "decoder_start_token_id": BOS},
            f,
        )
    if safetensors:
        from safetensors.torch import save_file

        # drop aliased tied-embedding entry (real HF checkpoints do the same;
        # our loader accepts either key)
        sd = {
            k: v.clone().contiguous()
            for k, v in rmodel.state_dict().items()
            if k != "text_encoder.encoder.embed_tokens.weight"
        }
        save_file(sd, os.path.join(path, "model.safetensors"))
    else:
        torch.save(rmodel.state_dict(), os.path.join(path, "pytorch_model.bin"))


import pytest


@pytest.mark.parametrize("safetensors", [False, True])
def test_reference_checkpoint_roundtrip(tmp_path, safetensors):
    import jax

    rmodel, _, _ = build_models()
    ckpt = str(tmp_path / "ref_ckpt")
    _write_checkpoint(rmodel, ckpt, safetensors=safetensors)

    params, cfg, gen = from_reference_pretrained(ckpt)
    assert cfg.decoder.num_hidden_layers == 2
    assert gen.max_length == MAXLEN

    rng = np.random.default_rng(0)
    B = 2
    desc = rng.integers(0, 120, (B, 7))
    dm = np.ones((B, 7), np.int64)
    pr = rng.integers(0, 120, (B, 5))
    pm = np.ones((B, 5), np.int64)
    ref_tokens = reference_decode_loop(rmodel, desc, dm, pr, pm, guidance=None)

    out = G.generate(
        params, cfg, dataclasses.replace(gen, do_sample=False),
        input_ids=desc, attention_mask=dm, prompt_input_ids=pr, prompt_attention_mask=pm,
        key=jax.random.PRNGKey(0), vocode=False,
    )
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)
