"""Codec pluggability (reference init_dummy_model_with_encodec.py:11-18):
the composite can carry a REAL EnCodec codec — init -> save -> load ->
generate end-to-end on the facebook/encodec_24khz architecture, and the
composite's vocode output matches ``transformers.EncodecModel`` bit-for-bit
on the same generated codes."""

import dataclasses
import importlib.util

import numpy as np
import pytest
import torch

from tests.test_encodec import TINY_24K

pytestmark = pytest.mark.slow


def test_encodec_dummy_script_end_to_end(tmp_path):
    import jax

    spec = importlib.util.spec_from_file_location(
        "init_encodec", "/root/repo/helpers/model_init_scripts/init_dummy_model_with_encodec.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import sys

    save_dir = str(tmp_path / "encodec_dummy")
    old_argv = sys.argv
    sys.argv = ["init", save_dir]
    try:
        mod.main()
    except SystemExit:
        pass
    finally:
        sys.argv = old_argv

    from parler_tts_tpu.core import checkpoint as ck
    from parler_tts_tpu.core.config import EncodecConfig
    from parler_tts_tpu.generation import generate as G

    params, cfg, gen = ck.load_model(save_dir)
    assert isinstance(cfg.audio_encoder, EncodecConfig)
    assert cfg.audio_encoder.num_codebooks == 8
    assert cfg.audio_encoder.num_quantizers == 32  # full encodec_24khz RVQ
    assert cfg.sampling_rate == 24000
    assert cfg.audio_encoder.hop_length == 320
    # the codec params really are EnCodec (LSTM stacks, unprojected codebooks)
    assert "lstm" in params["audio_encoder"]["encoder"]
    assert params["audio_encoder"]["quantizer"]["codebooks"].shape[0] == 32

    gen = dataclasses.replace(gen, max_length=24)
    rng = np.random.default_rng(0)
    out = G.generate(
        params, cfg, gen,
        input_ids=rng.integers(0, 32128, (1, 8)),
        prompt_input_ids=rng.integers(0, 32128, (1, 6)),
        key=jax.random.PRNGKey(0),
    )
    assert out.codes.shape == (1, 8, 24 - 8)  # undelay drops BOS col + K-1 tail
    # causal EnCodec decode upsamples exactly T*hop
    assert out.audio.shape[1] == (24 - 8) * 320
    assert np.isfinite(np.asarray(out.audio)).all()


@pytest.fixture(scope="module")
def encodec_composite():
    """Tiny composite whose audio_encoder is an imported HF EncodecModel."""
    import jax

    from parler_tts_tpu.core.config import (
        DecoderConfig,
        EncodecConfig,
        ParlerTTSConfig,
        T5EncoderConfig,
    )
    from parler_tts_tpu.core.torch_import import import_encodec
    from parler_tts_tpu.models import parler
    from transformers import EncodecConfig as HFEncodecConfig, EncodecModel as HFEncodecModel

    hf_cfg = HFEncodecConfig(**TINY_24K)
    torch.manual_seed(0)
    m = HFEncodecModel(hf_cfg).eval()
    with torch.no_grad():
        for layer in m.quantizer.layers:
            layer.codebook.embed.normal_(generator=torch.Generator().manual_seed(7))

    codec = EncodecConfig(**TINY_24K)  # num_codebooks -> num_quantizers = 4
    vocab = codec.codebook_size  # 32
    cfg = ParlerTTSConfig(
        vocab_size=100,
        text_encoder=T5EncoderConfig(vocab_size=100, d_model=24, d_kv=8, d_ff=32, num_layers=2, num_heads=3),
        audio_encoder=codec,
        decoder=DecoderConfig(
            vocab_size=vocab + 1, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            ffn_dim=48, num_codebooks=codec.num_codebooks, max_position_embeddings=256,
            pad_token_id=vocab, eos_token_id=vocab, bos_token_id=vocab + 1,
        ),
    )
    params = parler.init(jax.random.PRNGKey(0), cfg, with_audio_encoder=False)
    params["audio_encoder"] = import_encodec(m.state_dict(), codec)
    return m, cfg, params


def test_composite_vocode_matches_hf_encodec(encodec_composite):
    import jax

    from parler_tts_tpu.core.config import GenerationConfig
    from parler_tts_tpu.generation import generate as G

    m, cfg, params = encodec_composite
    rng = np.random.default_rng(1)
    gen = GenerationConfig(max_length=16, do_sample=False)
    out = G.generate(
        params, cfg, gen,
        input_ids=rng.integers(0, 100, (2, 5)),
        prompt_input_ids=rng.integers(0, 100, (2, 4)),
        key=jax.random.PRNGKey(1),
    )
    assert out.codes.shape == (2, 4, 16 - 4)
    with torch.no_grad():
        ref = m.decode(torch.tensor(np.asarray(out.codes))[None], audio_scales=[None]).audio_values.numpy()
    np.testing.assert_allclose(np.asarray(out.audio), ref[:, 0, :], atol=1e-5)


def test_composite_voice_continuation_through_encodec(encodec_composite):
    """input_values flow through EnCodec encode (the composite's audio-prompt
    path) with codes bit-equal to HF at the decoder's pinned stream count."""
    import jax

    from parler_tts_tpu.core.config import GenerationConfig
    from parler_tts_tpu.generation import generate as G

    m, cfg, params = encodec_composite
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal((1, 50)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref_codes = m.encode(torch.tensor(audio)[:, None, :], bandwidth=0.4).audio_codes[0].numpy()

    from parler_tts_tpu.models import codec as codec_mod

    my_codes = np.asarray(codec_mod.encode(params["audio_encoder"], cfg.audio_encoder, audio))
    np.testing.assert_array_equal(my_codes, ref_codes)

    gen = GenerationConfig(max_length=20, do_sample=False)
    out = G.generate(
        params, cfg, gen,
        input_ids=rng.integers(0, 100, (1, 5)),
        prompt_input_ids=rng.integers(0, 100, (1, 4)),
        input_values=audio,
        key=jax.random.PRNGKey(2),
    )
    n_prompt = ref_codes.shape[-1]
    np.testing.assert_array_equal(np.asarray(out.codes)[..., :n_prompt], ref_codes)
    assert np.isfinite(np.asarray(out.audio)).all()


def test_reference_checkpoint_with_encodec_migrates(tmp_path):
    """A reference checkpoint whose audio encoder is a real EnCodec (the
    Auto-registry assembly of init_dummy_model_with_encodec.py) migrates
    through from_reference_pretrained: EncodecConfig detected via
    model_type, EnCodec weights imported, generation vocoded through it."""
    import json
    import os

    import jax

    from tests.reference_loader import load_reference
    from transformers import EncodecConfig as HFEncodecConfig, T5Config

    ref = load_reference()
    t5c = T5Config(
        vocab_size=100, d_model=24, d_kv=6, d_ff=48, num_layers=1, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
    )
    enc_c = HFEncodecConfig(**TINY_24K)
    vocab = enc_c.codebook_size  # 32
    decc = ref.ParlerTTSDecoderConfig(
        vocab_size=vocab + 1, max_position_embeddings=128, num_hidden_layers=1,
        ffn_dim=48, num_attention_heads=4, hidden_size=24, num_codebooks=4,
        pad_token_id=vocab, eos_token_id=vocab, bos_token_id=vocab + 1,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    rcfg = ref.ParlerTTSConfig.from_sub_models_config(t5c, enc_c, decc, vocab_size=100)
    torch.manual_seed(0)
    rmodel = ref.ParlerTTSForConditionalGeneration(rcfg).eval()
    with torch.no_grad():
        for layer in rmodel.audio_encoder.quantizer.layers:
            layer.codebook.embed.normal_(generator=torch.Generator().manual_seed(7))

    ckpt = str(tmp_path / "ref_encodec")
    os.makedirs(ckpt)
    with open(os.path.join(ckpt, "config.json"), "w") as f:
        json.dump(rmodel.config.to_dict(), f)
    with open(os.path.join(ckpt, "generation_config.json"), "w") as f:
        json.dump({"max_length": 16, "do_sample": False, "bos_token_id": vocab + 1,
                   "pad_token_id": vocab, "eos_token_id": vocab,
                   "decoder_start_token_id": vocab + 1}, f)
    from safetensors.torch import save_file
    sd = {k: v.clone().contiguous() for k, v in rmodel.state_dict().items()
          if k != "text_encoder.encoder.embed_tokens.weight"}
    save_file(sd, os.path.join(ckpt, "model.safetensors"))

    from parler_tts_tpu.core.config import EncodecConfig
    from parler_tts_tpu.core.from_reference import from_reference_pretrained
    from parler_tts_tpu.core.config import GenerationConfig
    from parler_tts_tpu.generation import generate as G

    params, cfg, gen = from_reference_pretrained(ckpt)
    assert isinstance(cfg.audio_encoder, EncodecConfig)
    assert cfg.audio_encoder.num_codebooks == 4  # pinned to the decoder's K
    assert "lstm" in params["audio_encoder"]["encoder"]

    rng = np.random.default_rng(0)
    out = G.generate(
        params, cfg, gen,
        input_ids=rng.integers(0, 100, (1, 5)),
        prompt_input_ids=rng.integers(0, 100, (1, 4)),
        key=jax.random.PRNGKey(0),
    )
    with torch.no_grad():
        ref_wav = rmodel.audio_encoder.decode(
            torch.tensor(np.asarray(out.codes))[None], audio_scales=[None]
        ).audio_values.numpy()
    np.testing.assert_allclose(np.asarray(out.audio), ref_wav[:, 0, :], atol=1e-5)
