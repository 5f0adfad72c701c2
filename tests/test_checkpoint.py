"""Checkpoint save/load/rotate/resume round-trips (SURVEY.md §5.4)."""

import os

import jax
import numpy as np
import pytest

from parler_tts_tpu.core import checkpoint as ck
from parler_tts_tpu.core.config import GenerationConfig, dummy_config
from parler_tts_tpu.models import parler
from parler_tts_tpu.training import optim, step as tstep


def test_rotation_and_discovery(tmp_path):
    out = str(tmp_path)
    for step, epoch in [(10, 0), (20, 0), (30, 1), (40, 1)]:
        os.makedirs(os.path.join(out, ck.checkpoint_name(step, epoch)))
    assert ck.latest_checkpoint(out).endswith("checkpoint-40-epoch-1")
    assert ck.parse_step_epoch(ck.latest_checkpoint(out)) == (40, 1)
    ck.rotate_checkpoints(out, 2)
    names = sorted(os.listdir(out))
    assert names == ["checkpoint-30-epoch-1", "checkpoint-40-epoch-1"]


@pytest.mark.slow
def test_train_state_roundtrip(tmp_path):
    cfg = dummy_config()
    params = parler.init(jax.random.PRNGKey(0), cfg, with_audio_encoder=False)
    tx = optim.make_optimizer(1e-4, warmup_steps=5)
    state, frozen = tstep.create_state(params, tx)

    path = str(tmp_path / ck.checkpoint_name(7, 2))
    ck.save_train_state(path, params=state.params, opt_state=state.opt_state, step=7, epoch=2)
    payload, meta = ck.load_train_state(path)
    assert meta["step"] == 7 and meta["epoch"] == 2

    before = jax.tree.leaves(state.params)
    after = jax.tree.leaves(payload["params"])
    assert len(before) == len(after)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_artifact_roundtrip(tmp_path):
    cfg = dummy_config()
    params = parler.init(jax.random.PRNGKey(1), cfg, with_audio_encoder=False)
    gen = GenerationConfig(max_length=123, top_k=7)
    path = str(tmp_path / "model")
    ck.save_model(path, params, cfg, gen)

    params2, cfg2, gen2 = ck.load_model(path)
    assert cfg2 == cfg
    assert gen2.max_length == 123 and gen2.top_k == 7
    a = np.asarray(params["decoder"]["lm_heads"]["kernel"])
    b = np.asarray(params2["decoder"]["lm_heads"]["kernel"])
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_multisteps_opt_state_template_restore(tmp_path):
    """Template restore preserves optax MultiSteps NamedTuple field order —
    untemplated orbax restore returns alphabetical dicts, which silently
    scrambles (mini_step, gradient_step, inner_opt_state, acc_grads) when
    rebuilt by flatten/unflatten (round-1 advisor finding)."""
    import jax.numpy as jnp

    cfg = dummy_config()
    params = parler.init(jax.random.PRNGKey(0), cfg, with_audio_encoder=False)
    tx = optim.make_optimizer(1e-4, warmup_steps=5, grad_accum_steps=4)
    state, frozen = tstep.create_state(params, tx)
    # advance a couple of micro steps so mini_step/acc_grads are nontrivial
    grads = jax.tree.map(jnp.ones_like, state.params)
    opt_state = state.opt_state
    for _ in range(2):
        _, opt_state = tx.update(grads, opt_state, state.params)
    assert int(opt_state.mini_step) == 2

    path = str(tmp_path / ck.checkpoint_name(1, 0))
    ck.save_train_state(path, params=state.params, opt_state=opt_state, step=1, epoch=0)
    template = {"params": state.params, "opt_state": state.opt_state}
    payload, _ = ck.load_train_state(path, template=template)
    restored = payload["opt_state"]
    assert type(restored) is type(opt_state)
    assert int(restored.mini_step) == 2 and int(restored.gradient_step) == 0
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
