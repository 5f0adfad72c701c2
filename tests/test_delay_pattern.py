"""Delay-pattern scheduler parity vs the PyTorch reference
(`/root/reference/parler_tts/modeling_parler_tts.py:68-139`)."""

import numpy as np
import pytest
import torch

from parler_tts_tpu.models.delay_pattern import (
    apply_delay_pattern,
    build_delay_pattern,
    build_delay_pattern_labels,
    labels_to_decoder_inputs,
    undelay_pattern,
)
from tests.reference_loader import load_reference

ref = load_reference()

BOS, PAD, EOS = 1025, 1024, 1024


@pytest.mark.parametrize("bsz,K,seq_len,max_len", [(1, 4, 1, 8), (2, 9, 1, 40), (3, 4, 5, 16), (1, 9, 12, 64)])
def test_build_matches_reference(bsz, K, seq_len, max_len):
    rng = np.random.default_rng(42)
    ids = rng.integers(0, 1024, size=(bsz, K, seq_len))

    ref_in, ref_pat = ref.build_delay_pattern_mask(
        torch.tensor(ids.reshape(bsz * K, seq_len)), BOS, PAD, max_len, K
    )
    my_in, my_pat, start = build_delay_pattern(
        np.asarray(ids), bos_token_id=BOS, pad_token_id=PAD, max_length=max_len
    )

    np.testing.assert_array_equal(np.asarray(my_pat).reshape(bsz * K, -1), ref_pat.numpy())
    np.testing.assert_array_equal(np.asarray(my_in).reshape(bsz * K, -1), ref_in.numpy())
    assert start == ref_in.shape[-1]


def test_short_sequence_escape():
    # max_length < 2K-1 returns inputs unmodified (reference :104-106)
    ids = np.arange(2 * 9 * 3).reshape(2, 9, 3) % 1024
    my_in, my_pat, start = build_delay_pattern(ids, bos_token_id=BOS, pad_token_id=PAD, max_length=10)
    ref_in, ref_pat = ref.build_delay_pattern_mask(torch.tensor(ids.reshape(18, 3)), BOS, PAD, 10, 9)
    np.testing.assert_array_equal(np.asarray(my_in).reshape(18, -1), ref_in.numpy())
    np.testing.assert_array_equal(np.asarray(my_pat).reshape(18, -1), ref_pat.numpy())


def test_apply_matches_reference():
    rng = np.random.default_rng(0)
    bsz, K, max_len = 2, 9, 32
    ids = rng.integers(0, 1024, size=(bsz, K, 1))
    _, pat, _ = build_delay_pattern(ids, bos_token_id=BOS, pad_token_id=PAD, max_length=max_len)
    cur = rng.integers(0, 1024, size=(bsz, K, 17))
    mine = apply_delay_pattern(cur, np.asarray(pat))
    theirs = ref.apply_delay_pattern_mask(
        torch.tensor(cur.reshape(bsz * K, -1)), torch.tensor(np.asarray(pat).reshape(bsz * K, -1))
    )
    np.testing.assert_array_equal(np.asarray(mine).reshape(bsz * K, -1), theirs.numpy())


def test_undelay_roundtrip():
    """Manually delaying codes then undelaying recovers them exactly."""
    rng = np.random.default_rng(1)
    bsz, K, T = 2, 9, 20
    codes = rng.integers(0, 1024, size=(bsz, K, T))
    delayed = np.full((bsz, K, T + K - 1), PAD)
    for k in range(K):
        delayed[:, k, k : k + T] = codes[:, k]
    und = np.asarray(undelay_pattern(delayed))
    assert und.shape == (bsz, K, T)
    np.testing.assert_array_equal(und, codes)


def test_undelay_matches_reference_generate_shape():
    """Mirror the reference's end-of-generate undelay (modeling:2636-2645):
    rebuild mask at output length, apply, keep positions where mask != BOS/PAD."""
    rng = np.random.default_rng(7)
    bsz, K, out_len = 2, 4, 12
    # simulate generated ids: start token + sampled tokens, delay enforced
    start = np.full((bsz, K, 1), BOS)
    _, pat, _ = build_delay_pattern(start, bos_token_id=BOS, pad_token_id=PAD, max_length=out_len)
    sampled = rng.integers(0, 1024, size=(bsz, K, out_len))
    output_ids = np.asarray(apply_delay_pattern(sampled, np.asarray(pat)))

    # reference path
    t_out = torch.tensor(output_ids.reshape(bsz * K, out_len))
    _, mask = ref.build_delay_pattern_mask(t_out[:, :1], BOS, PAD, out_len, K)
    t_out = ref.apply_delay_pattern_mask(t_out, mask)
    keep = (mask != BOS) & (mask != PAD)
    ref_ids = t_out[keep].reshape(bsz, K, -1).numpy()

    # ours: drop the BOS start column then left-shift
    mine = np.asarray(undelay_pattern(output_ids[..., 1:]))
    np.testing.assert_array_equal(mine, ref_ids)


def test_labels_and_decoder_inputs():
    """Label construction matches the training script semantics
    (run_parler_tts_training.py:1164-1213): BOS prepend, per-codebook delay,
    single EOS per codebook, -100 elsewhere."""
    rng = np.random.default_rng(3)
    bsz, K, t_codes, max_len = 2, 4, 6, 14
    codes = rng.integers(0, 1024, size=(bsz, K, t_codes))
    lengths = np.array([6, 4])
    labels = np.asarray(
        build_delay_pattern_labels(
            codes, lengths, bos_token_id=BOS, eos_token_id=EOS, max_length=max_len
        )
    )
    # emulate reference: prepend bos, build mask with max_len, apply over pads,
    # replace remaining -1/BOS with -100 (loss-mask view)
    for b in range(bsz):
        L = lengths[b]
        for k in range(K):
            row = labels[b, k]
            # BOS region is input-only → ignore
            assert (row[: 1 + k] == -100).all()
            np.testing.assert_array_equal(row[1 + k : 1 + k + L], codes[b, k, :L])
            assert row[1 + k + L] == EOS
            assert (row[1 + k + L + 1 :] == -100).all()

    dec_in = np.asarray(
        labels_to_decoder_inputs(labels, bos_token_id=BOS, pad_token_id=PAD)
    )
    assert (dec_in[..., 0] == BOS).all()
    np.testing.assert_array_equal(
        dec_in[..., 1:], np.where(labels[..., :-1] == -100, PAD, labels[..., :-1])
    )


def test_jit_static_shapes():
    import jax

    f = jax.jit(
        lambda ids: build_delay_pattern(ids, bos_token_id=BOS, pad_token_id=PAD, max_length=24)[1]
    )
    out = f(np.full((1, 9, 1), BOS))
    assert out.shape == (1, 9, 24)
