"""Full Mini-600M-geometry parity vs the PyTorch reference.

Round-1 goldens were all toy-geometry (2 layers, K=4, tiny vocab); this file
re-runs the decoder logits/loss and composite greedy-generation parity at the
REAL Parler-TTS Mini decoder geometry — 24 layers x 1024 hidden x 16 heads,
9 codebooks, vocab 1088, 4096 positions (reference ``init_model_600M.py:25-47``
/ ``helpers/model_init_scripts``) — so scale-dependent numerics (deep-stack
error accumulation, 1088-row head gathers, high sinusoidal position indices)
are covered without the real checkpoint (no network egress on this box; the
real-weight allclose gate runs via ``helpers/convert_reference_checkpoint.py``
when weights exist on disk).

Heavy (~650M-param torch init + import): kept to a handful of forwards.
"""

import numpy as np
import pytest
import torch

from parler_tts_tpu.core.config import DecoderConfig
from parler_tts_tpu.core.torch_import import import_decoder
from parler_tts_tpu.models import decoder as jdec
from tests.reference_loader import load_reference

ref = load_reference()

# real Mini decoder geometry (reference init_model_600M.py)
LAYERS, HID, HEADS, FFN = 24, 1024, 16, 4096
K, V, PAD, BOS = 9, 1088, 1088, 1089
MAXPOS = 4096


@pytest.fixture(scope="module")
def models():
    rcfg = ref.ParlerTTSDecoderConfig(
        vocab_size=V, max_position_embeddings=MAXPOS, num_hidden_layers=LAYERS,
        ffn_dim=FFN, num_attention_heads=HEADS, hidden_size=HID, num_codebooks=K,
        pad_token_id=PAD, eos_token_id=PAD, bos_token_id=BOS,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(0)
    rmodel = ref.ParlerTTSForCausalLM(rcfg).eval()
    cfg = DecoderConfig(
        vocab_size=V, max_position_embeddings=MAXPOS, num_hidden_layers=LAYERS,
        ffn_dim=FFN, num_attention_heads=HEADS, hidden_size=HID, num_codebooks=K,
        pad_token_id=PAD, eos_token_id=PAD, bos_token_id=BOS, dropout=0.0,
    )
    params = import_decoder(rmodel.state_dict(), LAYERS, K)
    return rmodel, cfg, params


@pytest.fixture(scope="module")
def batch():
    B, T, P, S = 1, 12, 6, 8
    rng = np.random.default_rng(0)
    return dict(
        B=B, T=T, P=P, S=S,
        ids=rng.integers(0, V, size=(B, K, T)),
        prompt=(rng.standard_normal((B, P, HID)) * 0.02).astype(np.float32),
        enc=(rng.standard_normal((B, S, HID)) * 0.02).astype(np.float32),
        enc_mask=np.concatenate([np.ones((B, 6), np.int64), np.zeros((B, 2), np.int64)], axis=1),
        prompt_mask=np.ones((B, P), np.int64),
        dec_mask=np.ones((B, T), np.int64),
    )


def test_mini_decoder_logits_and_loss_parity(models, batch):
    rmodel, cfg, params = models
    b = batch
    rng = np.random.default_rng(1)
    labels = rng.integers(0, V, size=(b["B"], b["T"], K))
    labels[0, -2:, :] = -100
    with torch.no_grad():
        out = rmodel(
            input_ids=torch.tensor(b["ids"]),
            attention_mask=torch.tensor(b["dec_mask"]),
            encoder_hidden_states=torch.tensor(b["enc"]),
            encoder_attention_mask=torch.tensor(b["enc_mask"]),
            prompt_hidden_states=torch.tensor(b["prompt"]),
            prompt_attention_mask=torch.tensor(b["prompt_mask"]),
            labels=torch.tensor(labels),
        )
    ref_logits = out.logits.numpy().reshape(b["B"], K, -1, V)[:, :, -b["T"]:]

    fused_mask = np.concatenate([b["prompt_mask"], b["dec_mask"]], axis=1)
    hidden, _ = jdec.forward(
        params, cfg, b["ids"],
        prompt_hidden_states=b["prompt"],
        encoder_hidden_states=b["enc"],
        encoder_attention_mask=b["enc_mask"],
        attention_mask=fused_mask,
    )
    mine = np.asarray(jdec.logits(params, hidden, num_labels=b["T"]))
    # 24-layer fp32 stacks accumulate ~1 more decimal digit of error than the
    # toy goldens (5e-5); scale-dependent bound, not a correctness loosening
    np.testing.assert_allclose(mine, ref_logits, atol=5e-4, rtol=5e-4)

    my_loss = jdec.loss_fn(
        jdec.logits(params, hidden, num_labels=b["T"]),
        np.transpose(labels, (0, 2, 1)), b["ids"], cfg,
    )
    np.testing.assert_allclose(float(my_loss), float(out.loss), rtol=1e-4)


def test_mini_decoder_cached_decode_matches_full(models, batch):
    """Static-KV-cache greedy decode == full forward at Mini depth (the
    decode engine's core invariant, at scale)."""
    import jax.numpy as jnp

    rmodel, cfg, params = models
    b = batch
    B, T = b["B"], 8
    ids = b["ids"][:, :, :T]
    fused_mask = np.concatenate([b["prompt_mask"], np.ones((B, T), np.int64)], axis=1)

    hidden_full, _ = jdec.forward(
        params, cfg, ids,
        prompt_hidden_states=b["prompt"],
        encoder_hidden_states=b["enc"],
        encoder_attention_mask=b["enc_mask"],
        attention_mask=fused_mask,
    )

    cache = jdec.init_cache(cfg, B, b["P"] + T, b["S"], dtype=jnp.float32)
    hidden_pre, cache = jdec.forward(
        params, cfg, ids[:, :, :1],
        prompt_hidden_states=b["prompt"],
        encoder_hidden_states=b["enc"],
        encoder_attention_mask=b["enc_mask"],
        attention_mask=fused_mask,
        cache=cache, prefill=True,
    )
    outs = [np.asarray(hidden_pre)]
    for t in range(1, T):
        h, cache = jdec.forward(
            params, cfg, ids[:, :, t : t + 1],
            encoder_attention_mask=b["enc_mask"],
            attention_mask=fused_mask,
            cache=cache,
        )
        outs.append(np.asarray(h))
    hidden_inc = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(hidden_inc, np.asarray(hidden_full), atol=2e-4, rtol=2e-4)
