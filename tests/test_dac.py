"""Golden-value parity: JAX DAC codec vs transformers ``DacModel`` (a
faithful port of descript-audio-codec, which the reference wraps at
``/root/reference/parler_tts/dac_wrapper/modeling_dac.py``)."""

import numpy as np
import pytest
import torch

from parler_tts_tpu.core.config import DACConfig
from parler_tts_tpu.core.torch_import import import_dac
from parler_tts_tpu.models import dac as jdac


@pytest.fixture(scope="module")
def tiny():
    from transformers import DacConfig as HFDacConfig, DacModel as HFDacModel

    hf_cfg = HFDacConfig(
        encoder_hidden_size=16,
        downsampling_ratios=[2, 4],
        decoder_hidden_size=32,
        upsampling_ratios=[4, 2],
        n_codebooks=3,
        codebook_size=32,
        codebook_dim=4,
        hidden_size=24,
        sampling_rate=16000,
    )
    torch.manual_seed(0)
    m = HFDacModel(hf_cfg).eval()
    cfg = DACConfig(
        num_codebooks=3,
        codebook_size=32,
        codebook_dim=4,
        latent_dim=24,
        encoder_hidden_size=16,
        downsampling_ratios=(2, 4),
        decoder_hidden_size=32,
        upsampling_ratios=(4, 2),
        sampling_rate=16000,
    )
    params = import_dac(m.state_dict(), num_down=2, num_up=2, num_codebooks=3)
    return m, cfg, params


def test_encode_codes_match(tiny):
    m, cfg, params = tiny
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 64)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_codes = m.encode(torch.tensor(audio)[:, None, :]).audio_codes.numpy()
    my_codes = np.asarray(jdac.encode(params, cfg, audio))
    np.testing.assert_array_equal(my_codes, ref_codes)


def test_decode_waveform_allclose(tiny):
    m, cfg, params = tiny
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 32, size=(2, 3, 8))
    with torch.no_grad():
        ref = m.decode(audio_codes=torch.tensor(codes)).audio_values.numpy()
    mine = np.asarray(jdac.decode(params, cfg, codes))
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_roundtrip_and_padding(tiny):
    """Non-multiple-of-hop audio is right-padded like descript preprocess."""
    m, cfg, params = tiny
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((1, 60)).astype(np.float32) * 0.1  # hop=8, 60 -> 64
    codes = np.asarray(jdac.encode(params, cfg, audio))
    assert codes.shape == (1, 3, 8)
    wav = np.asarray(jdac.decode(params, cfg, codes))
    assert wav.shape == (1, 64)
    assert np.abs(wav).max() <= 1.0  # tanh output range


def test_weight_norm_folding(tiny):
    """Descript-style weight-normed checkpoints fold to identical params."""
    import copy

    m, cfg, params = tiny
    m = copy.deepcopy(m)  # don't mutate the shared fixture
    m.apply_weight_norm()
    params_wn = import_dac(m.state_dict(), num_down=2, num_up=2, num_codebooks=3)
    a = params["decoder"]["blocks"][0]["conv_up"]["kernel"]
    b = params_wn["decoder"]["blocks"][0]["conv_up"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    a = params["encoder"]["conv_in"]["kernel"]
    b = params_wn["encoder"]["conv_in"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_bf16_vocoder_quality():
    """The bf16 serving path stays within listening-transparent error of the
    fp32 quality path (fp32 remains the default / allclose-gate path)."""
    import jax
    import jax.numpy as jnp

    cfg = DACConfig()
    params = jdac.init(jax.random.PRNGKey(0), cfg)
    codes = np.random.default_rng(0).integers(0, 1024, (1, 9, 20))
    w32 = np.asarray(jdac.decode(params, cfg, codes))
    w16 = np.asarray(jdac.decode(params, cfg, codes, dtype=jnp.bfloat16))
    err = w16 - w32
    snr = 10 * np.log10((w32**2).mean() / max((err**2).mean(), 1e-20))
    assert snr > 30.0, f"bf16 vocoder SNR too low: {snr:.1f} dB"


def test_snake_fast_matches_exact():
    """Polynomial snake (serving path) tracks the transcendental snake to
    ~1e-5 abs on realistic activation ranges (fit error 4e-7; the rest is
    fp32 argument rounding, which the exact path shares)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 5, (2, 512, 64)).astype(np.float32))
    a = jnp.asarray(rng.uniform(0.05, 3.0, (64,)).astype(np.float32))
    y0 = np.asarray(jdac.snake(x, a))
    y1 = np.asarray(jdac.snake_fast(x, a))
    assert np.abs(y1 - y0).max() < 1e-4
    # bf16 in/out (the serving dtype): identical after bf16 rounding almost
    # everywhere
    xb = x.astype(jnp.bfloat16)
    y0 = np.asarray(jdac.snake(xb, a), np.float32)
    y1 = np.asarray(jdac.snake_fast(xb, a), np.float32)
    denom = np.maximum(np.abs(y0), 1.0)
    assert (np.abs(y1 - y0) / denom).max() < 1e-2


def test_default_config_shapes():
    """Default (44.1 kHz Mini) geometry: hop 512, 86 frames/s."""
    cfg = DACConfig()
    assert cfg.hop_length == 512
    assert cfg.num_codebooks == 9
    import jax

    params = jdac.init(jax.random.PRNGKey(0), cfg)
    audio = np.zeros((1, 512 * 4), np.float32)
    codes = np.asarray(jdac.encode(params, cfg, audio))
    assert codes.shape == (1, 9, 4)
    wav = np.asarray(jdac.decode(params, cfg, codes))
    assert wav.shape == (1, 512 * 4)
