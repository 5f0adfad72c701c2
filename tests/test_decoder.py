"""Golden-value parity: JAX decoder LM vs the PyTorch reference
``ParlerTTSForCausalLM`` (``/root/reference/parler_tts/modeling_parler_tts.py:
755-1552``), plus static-KV-cache self-consistency."""

import numpy as np
import pytest
import torch

from parler_tts_tpu.core.config import DecoderConfig
from parler_tts_tpu.core.torch_import import import_decoder
from parler_tts_tpu.models import decoder as jdec
from tests.reference_loader import load_reference

ref = load_reference()

K, H, LAYERS = 4, 32, 2
V, PAD, BOS = 99, 99, 100


@pytest.fixture(scope="module")
def models():
    rcfg = ref.ParlerTTSDecoderConfig(
        vocab_size=V,
        max_position_embeddings=128,
        num_hidden_layers=LAYERS,
        ffn_dim=64,
        num_attention_heads=4,
        hidden_size=H,
        num_codebooks=K,
        pad_token_id=PAD,
        eos_token_id=PAD,
        bos_token_id=BOS,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
    )
    torch.manual_seed(0)
    rmodel = ref.ParlerTTSForCausalLM(rcfg).eval()
    cfg = DecoderConfig(
        vocab_size=V,
        max_position_embeddings=128,
        num_hidden_layers=LAYERS,
        ffn_dim=64,
        num_attention_heads=4,
        hidden_size=H,
        num_codebooks=K,
        pad_token_id=PAD,
        eos_token_id=PAD,
        bos_token_id=BOS,
        dropout=0.0,
    )
    params = import_decoder(rmodel.state_dict(), LAYERS, K)
    return rmodel, cfg, params


@pytest.fixture(scope="module")
def batch():
    B, T, P, S = 2, 10, 5, 7
    rng = np.random.default_rng(0)
    return dict(
        B=B, T=T, P=P, S=S,
        ids=rng.integers(0, V, size=(B, K, T)),
        prompt=rng.standard_normal((B, P, H)).astype(np.float32),
        enc=rng.standard_normal((B, S, H)).astype(np.float32),
        enc_mask=np.concatenate([np.ones((B, 5), np.int64), np.zeros((B, 2), np.int64)], axis=1),
        prompt_mask=np.stack([np.array([0, 0, 1, 1, 1]), np.ones(5, np.int64)]),
        dec_mask=np.ones((B, T), np.int64),
    )


def test_logits_match_reference(models, batch):
    rmodel, cfg, params = models
    b = batch
    with torch.no_grad():
        out = rmodel(
            input_ids=torch.tensor(b["ids"].reshape(-1, b["T"])),
            attention_mask=torch.tensor(b["dec_mask"]),
            encoder_hidden_states=torch.tensor(b["enc"]),
            encoder_attention_mask=torch.tensor(b["enc_mask"]),
            prompt_hidden_states=torch.tensor(b["prompt"]),
            prompt_attention_mask=torch.tensor(b["prompt_mask"]),
        )
    ref_logits = out.logits.numpy().reshape(b["B"], K, b["P"] + b["T"], -1)

    fused_mask = np.concatenate([b["prompt_mask"], b["dec_mask"]], axis=1)
    hidden, _ = jdec.forward(
        params, cfg, b["ids"],
        prompt_hidden_states=b["prompt"],
        encoder_hidden_states=b["enc"],
        encoder_attention_mask=b["enc_mask"],
        attention_mask=fused_mask,
    )
    mine = np.asarray(jdec.logits(params, hidden))
    np.testing.assert_allclose(mine, ref_logits, atol=5e-5, rtol=1e-4)


def test_loss_matches_reference(models, batch):
    rmodel, cfg, params = models
    b = batch
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    labels = rng.integers(0, V, size=(b["B"], b["T"], K))
    labels[0, -2:, :] = -100
    with torch.no_grad():
        out = rmodel(
            input_ids=torch.tensor(b["ids"]),  # 3-D: training-path layout
            attention_mask=torch.tensor(b["dec_mask"]),
            encoder_hidden_states=torch.tensor(b["enc"]),
            encoder_attention_mask=torch.tensor(b["enc_mask"]),
            prompt_hidden_states=torch.tensor(b["prompt"]),
            prompt_attention_mask=torch.tensor(b["prompt_mask"]),
            labels=torch.tensor(labels),
        )
    fused_mask = np.concatenate([b["prompt_mask"], b["dec_mask"]], axis=1)
    hidden, _ = jdec.forward(
        params, cfg, b["ids"],
        prompt_hidden_states=b["prompt"],
        encoder_hidden_states=b["enc"],
        encoder_attention_mask=b["enc_mask"],
        attention_mask=fused_mask,
    )
    lm_logits = jdec.logits(params, hidden, num_labels=b["T"])
    my_loss = jdec.loss_fn(lm_logits, jnp.asarray(labels.transpose(0, 2, 1)), jnp.asarray(b["ids"]), cfg)
    np.testing.assert_allclose(float(my_loss), float(out.loss), atol=1e-5, rtol=1e-5)


def test_cached_decode_matches_full_forward(models, batch):
    """Prefill (prompt + first frames) then single-token steps reproduce the
    full-sequence logits — validates the static cache layout, masks, and
    position offsets."""
    rmodel, cfg, params = models
    b = batch
    B, T, P = b["B"], b["T"], b["P"]
    fused_mask = np.concatenate([b["prompt_mask"], b["dec_mask"]], axis=1)

    hidden_full, _ = jdec.forward(
        params, cfg, b["ids"],
        prompt_hidden_states=b["prompt"],
        encoder_hidden_states=b["enc"],
        encoder_attention_mask=b["enc_mask"],
        attention_mask=fused_mask,
    )
    full_logits = np.asarray(jdec.logits(params, hidden_full, num_labels=T))

    max_len = P + T + 4
    cache = jdec.init_cache(cfg, B, max_len, b["S"])
    # prefill: prompt + first 3 frames
    t0 = 3
    hidden, cache = jdec.forward(
        params, cfg, b["ids"][:, :, :t0],
        prompt_hidden_states=b["prompt"],
        encoder_hidden_states=b["enc"],
        encoder_attention_mask=b["enc_mask"],
        attention_mask=fused_mask[:, : P + t0],
        cache=cache,
        prefill=True,
    )
    step_logits = [np.asarray(jdec.logits(params, hidden, num_labels=t0))]
    for t in range(t0, T):
        hidden, cache = jdec.forward(
            params, cfg, b["ids"][:, :, t : t + 1],
            encoder_attention_mask=b["enc_mask"],
            attention_mask=fused_mask[:, : P + t + 1],
            cache=cache,
        )
        step_logits.append(np.asarray(jdec.logits(params, hidden)))
    stepped = np.concatenate(step_logits, axis=2)
    np.testing.assert_allclose(stepped, full_logits, atol=2e-5, rtol=1e-4)


def test_grow_cache_mid_decode_matches_full_forward(models, batch):
    """grow_cache (the growing-buffer length buckets) mid-decode: start with a
    minimal buffer, zero-pad it after a few steps, and finish — logits must
    match the full-sequence forward (growth preserves contents, flush offsets,
    and read masking)."""
    rmodel, cfg, params = models
    b = batch
    B, T, P = b["B"], b["T"], b["P"]
    fused_mask = np.concatenate([b["prompt_mask"], b["dec_mask"]], axis=1)

    hidden_full, _ = jdec.forward(
        params, cfg, b["ids"],
        prompt_hidden_states=b["prompt"],
        encoder_hidden_states=b["enc"],
        encoder_attention_mask=b["enc_mask"],
        attention_mask=fused_mask,
    )
    full_logits = np.asarray(jdec.logits(params, hidden_full, num_labels=T))

    t0, grow_at = 3, T // 2
    cache = jdec.init_cache(cfg, B, P + t0 + grow_at, b["S"])  # minimal start
    hidden, cache = jdec.forward(
        params, cfg, b["ids"][:, :, :t0],
        prompt_hidden_states=b["prompt"],
        encoder_hidden_states=b["enc"],
        encoder_attention_mask=b["enc_mask"],
        attention_mask=fused_mask[:, : P + t0],
        cache=cache,
        prefill=True,
    )
    step_logits = [np.asarray(jdec.logits(params, hidden, num_labels=t0))]
    for t in range(t0, T):
        if t == grow_at:
            old = cache.self_k.shape[4]
            cache = jdec.grow_cache(cache, P + T + 4)
            assert cache.self_k.shape[4] > old
        hidden, cache = jdec.forward(
            params, cfg, b["ids"][:, :, t : t + 1],
            encoder_attention_mask=b["enc_mask"],
            attention_mask=fused_mask[:, : P + t + 1],
            cache=cache,
        )
        step_logits.append(np.asarray(jdec.logits(params, hidden)))
    stepped = np.concatenate(step_logits, axis=2)
    np.testing.assert_allclose(stepped, full_logits, atol=2e-5, rtol=1e-4)


def test_embed_codebooks_sums():
    cfg = DecoderConfig(vocab_size=V, num_codebooks=K, hidden_size=H, num_hidden_layers=1)
    import jax

    params = jdec.init(jax.random.PRNGKey(0), cfg)
    ids = np.random.default_rng(0).integers(0, V, (2, K, 3))
    out = np.asarray(jdec.embed_codebooks(params, ids))
    tables = np.asarray(params["embed_tokens"]["embedding"])
    want = sum(tables[k][ids[:, k]] for k in range(K))
    np.testing.assert_allclose(out, want, atol=1e-6)
