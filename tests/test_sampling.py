"""Sampler / logits-processor parity vs the HF warpers the reference's
generate relies on (``modeling_parler_tts.py:2543-2620``)."""

import numpy as np
import torch

import jax.numpy as jnp

from parler_tts_tpu.core.config import GenerationConfig
from parler_tts_tpu.generation import sampling


def _np(x):
    return np.asarray(x)


def test_top_k_matches_hf():
    from transformers.generation.logits_process import TopKLogitsWarper

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((6, 97)).astype(np.float32)
    ours = _np(sampling.apply_top_k(jnp.asarray(logits), 10))
    theirs = TopKLogitsWarper(10, filter_value=sampling.NEG_INF)(None, torch.tensor(logits)).numpy()
    keep_ours = ours > sampling.NEG_INF / 2
    keep_theirs = theirs > sampling.NEG_INF / 2
    np.testing.assert_array_equal(keep_ours, keep_theirs)
    np.testing.assert_allclose(np.where(keep_ours, ours, 0), np.where(keep_theirs, theirs, 0), atol=1e-6)


def test_top_p_matches_hf():
    from transformers.generation.logits_process import TopPLogitsWarper

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((5, 64)).astype(np.float32) * 3
    for p in (0.3, 0.8, 0.95):
        ours = _np(sampling.apply_top_p(jnp.asarray(logits), p))
        theirs = TopPLogitsWarper(p, filter_value=sampling.NEG_INF)(None, torch.tensor(logits)).numpy()
        keep_ours = ours > sampling.NEG_INF / 2
        keep_theirs = theirs > sampling.NEG_INF / 2
        np.testing.assert_array_equal(keep_ours, keep_theirs, err_msg=f"p={p}")


def test_cfg_matches_hf():
    from transformers.generation.logits_process import ClassifierFreeGuidanceLogitsProcessor

    rng = np.random.default_rng(2)
    cond = rng.standard_normal((3, 50)).astype(np.float32)
    uncond = rng.standard_normal((3, 50)).astype(np.float32)
    ours = _np(sampling.apply_cfg(jnp.asarray(cond), jnp.asarray(uncond), 3.0))
    stacked = torch.tensor(np.concatenate([cond, uncond], axis=0))
    dummy_ids = torch.zeros((3, 1), dtype=torch.long)
    theirs = ClassifierFreeGuidanceLogitsProcessor(3.0)(dummy_ids, stacked).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_greedy_and_temperature():
    import jax

    logits = jnp.asarray(np.array([[[1.0, 5.0, 2.0], [0.1, 0.0, -1.0]]], np.float32))
    gen = GenerationConfig(do_sample=False)
    np.testing.assert_array_equal(_np(sampling.select_tokens(jax.random.PRNGKey(0), logits, gen)), [[1, 0]])

    # temperature -> sharper/flatter distribution but valid sampling
    gen_s = GenerationConfig(do_sample=True, temperature=0.01, top_k=0)
    processed = sampling.process_logits(logits, gen_s)
    toks = _np(sampling.select_tokens(jax.random.PRNGKey(0), processed, gen_s))
    np.testing.assert_array_equal(toks, [[1, 0]])  # ~deterministic at T->0
