"""Golden-value parity: JAX EnCodec codec vs ``transformers.EncodecModel``.

The reference's codec-pluggability capability loads ``facebook/encodec_24khz``
through the HF Auto registry
(``/root/reference/helpers/model_init_scripts/init_dummy_model_with_encodec.py:11-18``);
these tests pin this repo's from-scratch EnCodec (``models/encodec.py``) to
the HF implementation on both published variants' architectures:

* 24 kHz style — causal convs, reflect pad, weight_norm, whole-input encode;
* 48 kHz style — non-causal, ``time_group_norm``, stereo, normalized,
  chunked encode with overlap-add decode.
"""

import numpy as np
import pytest
import torch

from parler_tts_tpu.core.config import EncodecConfig
from parler_tts_tpu.core.torch_import import import_encodec
from parler_tts_tpu.models import encodec as jenc


def _pair(hf_kwargs, **our_kwargs):
    from transformers import EncodecConfig as HFEncodecConfig, EncodecModel as HFEncodecModel

    hf_cfg = HFEncodecConfig(**hf_kwargs)
    torch.manual_seed(0)
    m = HFEncodecModel(hf_cfg).eval()
    # HF zero-inits codebooks (they are EMA buffers loaded from checkpoints);
    # randomize so the RVQ actually discriminates
    with torch.no_grad():
        for layer in m.quantizer.layers:
            layer.codebook.embed.normal_(generator=torch.Generator().manual_seed(7))
    cfg = EncodecConfig(**{**hf_kwargs, **our_kwargs})
    params = import_encodec(m.state_dict(), cfg)
    return m, cfg, params


TINY_24K = dict(
    target_bandwidths=[0.1, 0.2, 0.4],
    sampling_rate=160,
    audio_channels=1,
    normalize=False,
    hidden_size=16,
    num_filters=4,
    num_residual_layers=1,
    upsampling_ratios=[4, 2],
    norm_type="weight_norm",
    codebook_size=32,
    use_causal_conv=True,
)

TINY_48K = dict(
    target_bandwidths=[0.2, 0.4],
    sampling_rate=160,
    audio_channels=2,
    normalize=True,
    chunk_length_s=0.5,  # 80 samples/chunk
    overlap=0.25,  # stride 60
    hidden_size=16,
    num_filters=4,
    num_residual_layers=1,
    upsampling_ratios=[4, 2],
    norm_type="time_group_norm",
    codebook_size=32,
    use_causal_conv=False,
)


@pytest.fixture(scope="module")
def tiny24():
    return _pair(TINY_24K)


@pytest.fixture(scope="module")
def tiny48():
    return _pair(TINY_48K)


def test_config_properties_match_hf(tiny24):
    m, cfg, _ = tiny24
    assert cfg.hop_length == m.config.hop_length == 8
    assert cfg.frame_rate == m.config.frame_rate == 20
    assert cfg.num_quantizers == m.config.num_quantizers == 4
    assert cfg.codebook_nbits == 5
    # composite K defaults to the full quantizer stack
    assert cfg.num_codebooks == 4


@pytest.mark.parametrize("bandwidth", [0.1, 0.2, 0.4])
def test_encode_codes_bit_exact(tiny24, bandwidth):
    m, cfg, params = tiny24
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 67)) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = m.encode(torch.tensor(audio)[:, None, :], bandwidth=bandwidth)
    ref = out.audio_codes[0].numpy()  # (B, K, T)
    mine = np.asarray(jenc.encode(params, cfg, audio, bandwidth=bandwidth))
    np.testing.assert_array_equal(mine, ref)


def test_decode_waveform_allclose(tiny24):
    m, cfg, params = tiny24
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 32, size=(2, 4, 9))
    with torch.no_grad():
        ref = m.decode(torch.tensor(codes)[None], audio_scales=[None]).audio_values.numpy()
    mine = np.asarray(jenc.decode(params, cfg, codes))
    assert mine.shape == (2, ref.shape[-1])
    np.testing.assert_allclose(mine, ref[:, 0, :], atol=1e-5)


def test_decode_partial_codebooks(tiny24):
    """RVQ decode sums however many streams it is given — the reference dummy
    assembly models 8 of EnCodec's 32 codebooks (its decoder K < n_q)."""
    m, cfg, params = tiny24
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 32, size=(1, 2, 6))  # 2 of 4 codebooks
    with torch.no_grad():
        ref = m.decode(torch.tensor(codes)[None], audio_scales=[None]).audio_values.numpy()
    mine = np.asarray(jenc.decode(params, cfg, codes))
    np.testing.assert_allclose(mine, ref[:, 0, :], atol=1e-5)


def test_roundtrip_output_length(tiny24):
    _, cfg, params = tiny24
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal((1, 60)) * 0.1).astype(np.float32)
    # default bandwidth = target_bandwidths[0] -> 1 quantizer (HF semantics);
    # n_quantizers pins the stream count explicitly (the composite's usage)
    codes = np.asarray(jenc.encode(params, cfg, audio))
    assert codes.shape == (1, 1, -(-60 // cfg.hop_length))
    codes = np.asarray(jenc.encode(params, cfg, audio, n_quantizers=cfg.num_quantizers))
    assert codes.shape == (1, cfg.num_quantizers, -(-60 // cfg.hop_length))
    wav = np.asarray(jenc.decode(params, cfg, codes))
    assert wav.shape == (1, codes.shape[-1] * cfg.hop_length)


@pytest.mark.slow
def test_48k_chunked_normalized_stereo(tiny48):
    """Full 48 kHz-style path: stereo, time_group_norm, per-chunk loudness
    scales, chunked encode, triangular overlap-add decode."""
    m, cfg, params = tiny48
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal((2, 140, 2)) * 0.1).astype(np.float32)
    taudio = torch.tensor(audio).permute(0, 2, 1)  # (B, C, T)
    with torch.no_grad():
        enc = m.encode(taudio)
        ref_wav = m.decode(
            enc.audio_codes, enc.audio_scales, last_frame_pad_length=enc.last_frame_pad_length
        ).audio_values.numpy()
    codes, scales, last_pad = jenc.encode_chunked(params, cfg, audio)
    np.testing.assert_array_equal(np.asarray(codes), enc.audio_codes.numpy())
    assert last_pad == enc.last_frame_pad_length
    ref_scales = np.stack([s.numpy() for s in enc.audio_scales])
    np.testing.assert_allclose(np.asarray(scales), ref_scales, rtol=1e-6)
    wav = np.asarray(
        jenc.decode_chunked(params, cfg, codes, scales=scales, last_frame_pad_length=last_pad)
    )
    np.testing.assert_allclose(wav, ref_wav.transpose(0, 2, 1), atol=1e-5)


def test_config_json_roundtrip_dispatch():
    """codec_type discriminates the codec family through composite JSON."""
    from parler_tts_tpu.core.config import ParlerTTSConfig

    cfg = ParlerTTSConfig(audio_encoder=EncodecConfig(num_codebooks=8))
    d = cfg.to_dict()
    assert d["audio_encoder"]["codec_type"] == "encodec"
    back = ParlerTTSConfig.from_dict(d)
    assert isinstance(back.audio_encoder, EncodecConfig)
    assert back.audio_encoder.num_codebooks == 8
    assert back.audio_encoder.frame_rate == 75
    # DAC configs stay DAC
    back2 = ParlerTTSConfig.from_dict(ParlerTTSConfig().to_dict())
    assert back2.audio_encoder.codec_type == "dac"
