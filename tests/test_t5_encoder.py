"""Golden-value parity: JAX T5 encoder vs HF torch T5EncoderModel
(random weights, imported) — SURVEY.md §4 golden-test strategy."""

import numpy as np
import pytest
import torch

from parler_tts_tpu.core.config import T5EncoderConfig
from parler_tts_tpu.core.torch_import import import_t5_encoder
from parler_tts_tpu.models import t5_encoder


def small_cfgs(gated=True):
    from transformers import T5Config

    hf = T5Config(
        vocab_size=256,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=3,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        is_gated_act=gated,
        dense_act_fn="gelu_new" if gated else "relu",
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0,
    )
    mine = T5EncoderConfig(
        vocab_size=256,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=3,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        dense_act_fn="gelu_new" if gated else "relu",
        is_gated_act=gated,
    )
    return hf, mine


@pytest.mark.parametrize("gated", [True, False])
def test_t5_encoder_allclose(gated):
    from transformers import T5EncoderModel

    hf_cfg, my_cfg = small_cfgs(gated)
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()

    params = import_t5_encoder(model.state_dict(), my_cfg.num_layers)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, size=(2, 11))
    mask = np.ones((2, 11), dtype=np.int64)
    mask[1, 7:] = 0  # padded sample

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    out = np.asarray(t5_encoder.encode(params, my_cfg, ids, mask))
    # residual diff ~3e-5 comes from tanh-gelu implementation differences
    # between jax and torch; matmuls are exact (HIGHEST precision)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_relative_position_bucket_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    rel = np.arange(-300, 300).reshape(1, -1)
    got = np.asarray(
        t5_encoder.relative_position_bucket(rel, num_buckets=32, max_distance=128)
    )
    want = T5Attention._relative_position_bucket(
        torch.tensor(rel), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(got, want)


def test_flan_t5_base_shapes():
    """Default config init produces the flan-t5-base parameter shapes."""
    import jax

    cfg = T5EncoderConfig()
    params = t5_encoder.init(jax.random.PRNGKey(0), cfg)
    assert params["token_embed"]["embedding"].shape == (32128, 768)
    assert len(params["layers"]) == 12
    assert params["layers"][0]["ffn"]["wi_0"]["kernel"].shape == (768, 2048)
    out = t5_encoder.encode(params, cfg, np.zeros((1, 5), np.int32), np.ones((1, 5), np.int32))
    assert out.shape == (1, 5, 768)
