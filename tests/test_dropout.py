"""Train-mode dropout/layerdrop semantics (reference applies dropout at
``modeling_parler_tts.py:363, 459-491, 888`` and layerdrop at ``:912-917``;
the Mini recipe trains with ``dropout=0.1``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parler_tts_tpu.core.config import DecoderConfig
from parler_tts_tpu.models import decoder as jdec
from parler_tts_tpu.ops.nn import dropout

K, H, LAYERS, V = 4, 32, 2, 99


def make_cfg(**kw):
    base = dict(
        vocab_size=V, max_position_embeddings=128, num_hidden_layers=LAYERS,
        ffn_dim=64, num_attention_heads=4, hidden_size=H, num_codebooks=K,
        pad_token_id=V, eos_token_id=V, bos_token_id=V + 1,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0, layerdrop=0.0,
    )
    base.update(kw)
    return DecoderConfig(**base)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    B, T, S = 2, 12, 7
    return dict(
        ids=rng.integers(0, V, (B, K, T)).astype(np.int32),
        enc=rng.standard_normal((B, S, H)).astype(np.float32),
        enc_mask=np.ones((B, S), np.int32),
    )


def _params(cfg):
    return jdec.init(jax.random.PRNGKey(0), cfg)


def _fwd(cfg, params, inputs, train_key=None):
    hidden, _ = jdec.forward(
        params, cfg, jnp.asarray(inputs["ids"]),
        encoder_hidden_states=jnp.asarray(inputs["enc"]),
        encoder_attention_mask=jnp.asarray(inputs["enc_mask"]),
        train_key=train_key,
    )
    return np.asarray(hidden)


def test_unit_dropout_semantics():
    x = jnp.ones((1000,), jnp.float32)
    key = jax.random.PRNGKey(1)
    # identity cases compile away entirely
    assert dropout(None, x, 0.5) is x
    assert dropout(key, x, 0.0) is x
    y = np.asarray(dropout(key, x, 0.25))
    kept = y != 0
    # inverted scaling: survivors are x / (1 - p)
    np.testing.assert_allclose(y[kept], 1.0 / 0.75, rtol=1e-6)
    assert 0.6 < kept.mean() < 0.9  # ~75% keep rate
    # deterministic per key
    np.testing.assert_array_equal(y, np.asarray(dropout(key, x, 0.25)))


def test_zero_rates_with_key_match_eval_exactly(inputs):
    """dropout=0 + train mode reproduces the eval graph bit-exactly — the
    guarantee that round-1 numerics (and all golden tests) are unchanged."""
    cfg = make_cfg()
    params = _params(cfg)
    h_eval = _fwd(cfg, params, inputs)
    h_train = _fwd(cfg, params, inputs, train_key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(h_train, h_eval)


def test_dropout_key_deterministic_and_varying(inputs):
    cfg = make_cfg(dropout=0.3, attention_dropout=0.1, activation_dropout=0.2)
    params = _params(cfg)
    h_eval = _fwd(cfg, params, inputs)
    h1 = _fwd(cfg, params, inputs, train_key=jax.random.PRNGKey(1))
    h1b = _fwd(cfg, params, inputs, train_key=jax.random.PRNGKey(1))
    h2 = _fwd(cfg, params, inputs, train_key=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(h1, h1b)  # same key -> same masks
    assert np.abs(h1 - h2).max() > 0  # different key -> different masks
    assert np.abs(h1 - h_eval).max() > 0  # train != eval when rate > 0


def test_layerdrop_skips_layers(inputs):
    """With layerdrop ~1 every layer is skipped: output == embeddings+positions
    passed through only the final layer norm."""
    cfg = make_cfg(layerdrop=0.999)
    params = _params(cfg)
    h = _fwd(cfg, params, inputs, train_key=jax.random.PRNGKey(3))

    from parler_tts_tpu.models.decoder import embed_codebooks, sinusoidal_positions
    from parler_tts_tpu.ops.nn import layer_norm

    x = embed_codebooks(params, jnp.asarray(inputs["ids"]))
    pos = sinusoidal_positions(cfg.max_position_embeddings, cfg.hidden_size)
    x = x + pos[None, : x.shape[1]]
    expect = np.asarray(layer_norm(params["final_ln"], x))
    np.testing.assert_allclose(h, expect, atol=1e-5)


def test_train_step_threads_dropout():
    """make_train_step with a dropout config: loss is deterministic per step
    index, and gradients flow (loss changes across steps as masks differ)."""
    import optax

    from parler_tts_tpu.core.config import dummy_config
    from parler_tts_tpu.models import parler
    from parler_tts_tpu.training import step as tstep
    from parler_tts_tpu.training.run_training import prepare_synthetic
    from parler_tts_tpu.training.data import Collator, batches

    cfg = dummy_config()
    cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(cfg.decoder, dropout=0.1))
    assert tstep.has_dropout(cfg)
    params = parler.init(jax.random.PRNGKey(0), cfg, with_audio_encoder=False)
    samples = prepare_synthetic(8, cfg, seed=0)
    coll = Collator(description_pad_id=0, prompt_pad_id=0,
                    max_description_len=24, max_prompt_len=16,
                    label_len=max(s["labels"].shape[1] for s in samples))
    batch = next(batches(samples, coll, 4, shuffle=False))

    tx = optax.adam(1e-3)
    state, frozen = tstep.create_state(params, tx)
    step_fn = jax.jit(tstep.make_train_step(cfg, tx, dtype=jnp.float32, dropout_seed=0))

    s1, m1 = step_fn(state, frozen, batch)
    _, m1b = step_fn(state, frozen, batch)  # same step index -> same loss
    assert float(m1["loss"]) == float(m1b["loss"])
    # the *same batch* at the next step index gets a different dropout mask
    s2, m2 = step_fn(s1, frozen, batch)
    # params changed, so loss differs anyway; check mask-dependence directly:
    state0 = tstep.TrainState(jnp.asarray(1, jnp.int32), state.params, state.opt_state)
    _, m_step1 = step_fn(state0, frozen, batch)
    assert float(m_step1["loss"]) != float(m1["loss"])
