"""Mesh / sharding: TP-sharded generation matches unsharded output;
partition specs cover every parameter; multi-chip training dryrun
(BASELINE configs 3 & 5, SURVEY.md §2.9)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from parler_tts_tpu.core.config import (
    DACConfig,
    DecoderConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5EncoderConfig,
    large_2b_config,
)
from parler_tts_tpu.generation import generate as G
from parler_tts_tpu.models import parler
from parler_tts_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = ParlerTTSConfig(
        vocab_size=120,
        text_encoder=T5EncoderConfig(vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4),
        audio_encoder=DACConfig(
            num_codebooks=4, codebook_size=32, codebook_dim=4, latent_dim=16,
            encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=16,
            upsampling_ratios=(4, 2),
        ),
        decoder=DecoderConfig(
            vocab_size=40, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            ffn_dim=64, num_codebooks=4, max_position_embeddings=128,
            pad_token_id=32, eos_token_id=32, bos_token_id=33, dropout=0.0,
        ),
    )
    params = parler.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_partition_specs_cover_all_params(tiny_setup):
    cfg, params = tiny_setup
    specs = pmesh.composite_param_specs(params)
    # same tree structure => every leaf has a spec
    jax.tree.map(lambda x, s: None, params, specs, is_leaf=lambda x: isinstance(x, P))


@pytest.mark.slow
def test_tp_sharded_generation_matches_unsharded(tiny_setup):
    """Greedy generation with weights sharded model=2 over an 8-device mesh
    equals the single-device result (GSPMD collectives are numerically
    transparent here)."""
    cfg, params = tiny_setup
    gen = GenerationConfig(
        max_length=14, do_sample=False,
        decoder_start_token_id=33, pad_token_id=32, bos_token_id=33, eos_token_id=32,
    )
    rng = np.random.default_rng(0)
    inputs = dict(
        input_ids=rng.integers(0, 120, (4, 7)),
        prompt_input_ids=rng.integers(0, 120, (4, 5)),
    )
    base = G.generate(params, cfg, gen, **inputs, key=jax.random.PRNGKey(0), vocode=False)

    mesh = pmesh.make_mesh(data=4, model=2)
    sharded = pmesh.shard_params(params, mesh, pmesh.composite_param_specs(params))
    batch = pmesh.shard_batch(inputs, mesh)
    out = G.generate(sharded, cfg, gen, **batch, key=jax.random.PRNGKey(0), vocode=False)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(base.tokens))


def test_large_2b_config_geometry():
    cfg = large_2b_config()
    d = cfg.decoder
    params_per_layer = 4 * d.hidden_size**2 * 2 + 2 * d.hidden_size * d.ffn_dim
    total = params_per_layer * d.num_hidden_layers
    assert 1.5e9 < total < 3e9  # "~2B class"
    assert d.hidden_size % d.num_attention_heads == 0
    # TP specs shard ffn/heads dims, replicate norms
    import jax

    from parler_tts_tpu.models import decoder as jdec

    # spec construction should not require materializing 2B params
    fake = {"layers": {"fc1": {"kernel": None}}, "lm_heads": {"kernel": None}}
    specs = pmesh.decoder_param_specs(fake)
    assert specs["layers"]["fc1"]["kernel"] == P(None, None, "model")
    assert specs["lm_heads"]["kernel"] == P(None, None, "model")


def test_train_step_dp_tp_mesh():
    """One sharded training step on (data=4, model=2) — the dryrun path."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
