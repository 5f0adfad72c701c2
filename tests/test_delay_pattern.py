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


def test_labels_match_reference_postprocess():
    """Label construction is bit-exact vs the reference training script's
    ``postprocess_dataset`` (run_parler_tts_training.py:1179-1205): BOS
    prepend, delay-pattern build, fill -1 with EOS, drop the all-BOS first
    timestep, then -100 batch padding (collator, :551-555)."""
    rng = np.random.default_rng(3)
    bsz, K, t_codes, max_len = 2, 4, 6, 14
    codes = rng.integers(0, 1024, size=(bsz, K, t_codes))
    lengths = np.array([6, 4])
    labels = np.asarray(
        build_delay_pattern_labels(
            codes, lengths, bos_token_id=BOS, eos_token_id=EOS, max_length=max_len
        )
    )

    for b in range(bsz):
        L = int(lengths[b])
        # reference postprocess_dataset on this sample's true-length codes
        sample = torch.tensor(codes[b : b + 1, :, :L])
        with_bos = torch.cat([torch.full((1, K, 1), BOS), sample], dim=-1)
        ref_lab, mask = ref.build_delay_pattern_mask(
            with_bos.reshape(K, -1), BOS, EOS, with_bos.shape[-1] + K, K
        )
        ref_rows = torch.where(mask == -1, torch.tensor(EOS), mask)[:, 1:].numpy()
        np.testing.assert_array_equal(labels[b, :, : L + K], ref_rows)
        assert (labels[b, :, L + K :] == -100).all()  # collator padding

    # shift_tokens_right parity (modeling:2023-2026): BOS start, -100 -> PAD
    dec_in = np.asarray(
        labels_to_decoder_inputs(labels, bos_token_id=BOS, pad_token_id=PAD)
    )
    assert (dec_in[..., 0] == BOS).all()
    np.testing.assert_array_equal(
        dec_in[..., 1:], np.where(labels[..., :-1] == -100, PAD, labels[..., :-1])
    )


def test_train_inputs_match_inference_prefix():
    """Decoder inputs built from labels must equal the token sequence the
    delay pattern forces at inference (generate's BOS region) — the silent
    train/inference mismatch flagged in round 1: codebook k must see BOS,
    not PAD, at positions 1..k."""
    rng = np.random.default_rng(5)
    bsz, K, L = 1, 9, 10
    codes = rng.integers(0, 1024, size=(bsz, K, L))
    labels = np.asarray(
        build_delay_pattern_labels(
            codes, np.array([L]), bos_token_id=BOS, eos_token_id=EOS, max_length=L + K
        )
    )
    dec_in = np.asarray(labels_to_decoder_inputs(labels, bos_token_id=BOS, pad_token_id=PAD))
    # inference: pattern forces BOS at t <= k for codebook k
    start = np.full((bsz, K, 1), BOS)
    _, pat, _ = build_delay_pattern(start, bos_token_id=BOS, pad_token_id=PAD, max_length=L + K)
    pat = np.asarray(pat)
    for k in range(K):
        np.testing.assert_array_equal(dec_in[0, k, : k + 1], np.full(k + 1, BOS))
        np.testing.assert_array_equal(dec_in[0, k, k + 1 : k + 1 + L], codes[0, k])
        # and the BOS prefix agrees with what apply_delay_pattern would force
        forced = pat[0, k, : k + 1]
        np.testing.assert_array_equal(dec_in[0, k, : k + 1], forced)


def test_jit_static_shapes():
    import jax

    f = jax.jit(
        lambda ids: build_delay_pattern(ids, bos_token_id=BOS, pad_token_id=PAD, max_length=24)[1]
    )
    out = f(np.full((1, 9, 1), BOS))
    assert out.shape == (1, 9, 24)
