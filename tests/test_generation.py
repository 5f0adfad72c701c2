"""Generation-engine parity vs the PyTorch reference composite model.

The reference's own ``generate`` calls legacy HF APIs (``greedy_search``)
removed from modern transformers, so these tests hand-roll the HF decode loop
using the reference's *own* ``prepare_inputs_for_generation`` + ``forward`` +
delay-pattern utilities (``/root/reference/parler_tts/modeling_parler_tts.py:
2081-2148, 2342-2686``) and compare token streams with our static-shape
``lax.while_loop`` engine.
"""

import numpy as np
import pytest
import torch

from parler_tts_tpu.core.config import (
    DACConfig,
    DecoderConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5EncoderConfig,
)
from parler_tts_tpu.generation import generate as G
from parler_tts_tpu.models import parler
from tests.reference_loader import load_reference

ref = load_reference()

K = 4
DEC_V, PAD, BOS = 40, 32, 33  # 32 codes + specials
MAXLEN = 14


def build_models():
    from transformers import DacConfig as HFDacConfig, T5Config
    from transformers.modeling_outputs import BaseModelOutput  # noqa: F401

    t5c = T5Config(
        vocab_size=120, d_model=24, d_kv=6, d_ff=48, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
    )
    dacc = HFDacConfig(
        encoder_hidden_size=8, downsampling_ratios=[2, 4], decoder_hidden_size=16,
        upsampling_ratios=[4, 2], n_codebooks=K, codebook_size=32, codebook_dim=4,
        hidden_size=16, sampling_rate=16000,
    )
    decc = ref.ParlerTTSDecoderConfig(
        vocab_size=DEC_V, max_position_embeddings=128, num_hidden_layers=2,
        ffn_dim=64, num_attention_heads=4, hidden_size=32, num_codebooks=K,
        pad_token_id=PAD, eos_token_id=PAD, bos_token_id=BOS,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    rcfg = ref.ParlerTTSConfig.from_sub_models_config(t5c, dacc, decc, vocab_size=120)
    torch.manual_seed(0)
    rmodel = ref.ParlerTTSForConditionalGeneration(rcfg).eval()

    cfg = ParlerTTSConfig(
        vocab_size=120,
        text_encoder=T5EncoderConfig(
            vocab_size=120, d_model=24, d_kv=6, d_ff=48, num_layers=2, num_heads=4,
            relative_attention_num_buckets=8, relative_attention_max_distance=20,
        ),
        audio_encoder=DACConfig(
            num_codebooks=K, codebook_size=32, codebook_dim=4, latent_dim=16,
            encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=16,
            upsampling_ratios=(4, 2), sampling_rate=16000,
        ),
        decoder=DecoderConfig(
            vocab_size=DEC_V, max_position_embeddings=128, num_hidden_layers=2,
            ffn_dim=64, num_attention_heads=4, hidden_size=32, num_codebooks=K,
            pad_token_id=PAD, eos_token_id=PAD, bos_token_id=BOS, dropout=0.0,
        ),
    )
    params = parler.import_composite(rmodel.state_dict(), cfg)
    return rmodel, cfg, params


def reference_decode_loop(rmodel, desc_ids, desc_mask, prompt_ids, prompt_mask, *, guidance=None, max_length=MAXLEN):
    """Hand-rolled HF greedy loop using the reference's own step machinery."""
    from transformers.modeling_outputs import BaseModelOutput

    B = desc_ids.shape[0]
    with torch.no_grad():
        enc = rmodel.text_encoder(
            input_ids=torch.tensor(desc_ids), attention_mask=torch.tensor(desc_mask)
        ).last_hidden_state
        am = torch.tensor(desc_mask)
        if guidance is not None and guidance > 1:
            enc = torch.concatenate([enc, torch.zeros_like(enc)], dim=0)
            am = torch.concatenate([am, torch.zeros_like(am)], dim=0)
        prompt_hidden = rmodel.embed_prompts(torch.tensor(prompt_ids))

        input_ids = torch.full((B * K, 1), BOS, dtype=torch.long)
        input_ids, delay_mask = ref.build_delay_pattern_mask(input_ids, BOS, PAD, max_length, K)

        kwargs = dict(
            encoder_outputs=BaseModelOutput(last_hidden_state=enc),
            attention_mask=am,
            prompt_hidden_states=prompt_hidden,
            prompt_attention_mask=torch.tensor(prompt_mask),
            decoder_delay_pattern_mask=delay_mask,
            use_cache=True,
            guidance_scale=guidance,
        )
        cfg_proc = None
        if guidance is not None and guidance > 1:
            from transformers.generation.logits_process import ClassifierFreeGuidanceLogitsProcessor

            cfg_proc = ClassifierFreeGuidanceLogitsProcessor(guidance)

        while input_ids.shape[1] < max_length:
            inputs = rmodel.prepare_inputs_for_generation(input_ids, **kwargs)
            out = rmodel(
                **{k: v for k, v in inputs.items() if v is not None or k == "input_ids"},
                return_dict=True,
            )
            logits = out.logits[:, -1, :]
            if cfg_proc is not None:
                logits = cfg_proc(input_ids, logits)
            next_tok = torch.argmax(logits, dim=-1)
            input_ids = torch.cat([input_ids, next_tok[:, None]], dim=-1)
            kwargs["past_key_values"] = out.past_key_values
        final = ref.apply_delay_pattern_mask(input_ids, delay_mask)
    return final.numpy().reshape(B, K, -1)


@pytest.mark.parametrize("guidance", [None, 3.0])
def test_greedy_generation_matches_reference(guidance):
    import jax

    rmodel, cfg, params = build_models()
    rng = np.random.default_rng(0)
    B = 2
    desc_ids = rng.integers(0, 120, (B, 7))
    desc_mask = np.ones((B, 7), np.int64); desc_mask[1, 5:] = 0
    prompt_ids = rng.integers(0, 120, (B, 5))
    prompt_mask = np.ones((B, 5), np.int64); prompt_mask[0, :2] = 0  # left pad

    ref_tokens = reference_decode_loop(
        rmodel, desc_ids, desc_mask, prompt_ids, prompt_mask, guidance=guidance
    )

    gen = GenerationConfig(
        max_length=MAXLEN, do_sample=False, guidance_scale=guidance or 1.0,
        decoder_start_token_id=BOS, pad_token_id=PAD, bos_token_id=BOS, eos_token_id=PAD,
    )
    out = G.generate(
        params, cfg, gen,
        input_ids=desc_ids, attention_mask=desc_mask,
        prompt_input_ids=prompt_ids, prompt_attention_mask=prompt_mask,
        key=jax.random.PRNGKey(0), vocode=False,
    )
    np.testing.assert_array_equal(np.asarray(out.tokens), ref_tokens)


@pytest.mark.slow
def test_sampled_generation_valid():
    """Sampling path: correct shapes, specials only where the pattern forces
    them, codes in range after postprocess."""
    import jax

    import jax as _jax

    from parler_tts_tpu.models import dac as dac_mod

    rmodel, cfg, params = build_models()
    # imported reference composite has no real DAC weights (stub); attach
    # random ones so the vocode path runs
    params["audio_encoder"] = dac_mod.init(_jax.random.PRNGKey(3), cfg.audio_encoder)
    rng = np.random.default_rng(1)
    B = 2
    gen = GenerationConfig(
        max_length=MAXLEN, do_sample=True, temperature=0.8, top_k=20,
        decoder_start_token_id=BOS, pad_token_id=PAD, bos_token_id=BOS, eos_token_id=PAD,
    )
    out = G.generate(
        params, cfg, gen,
        input_ids=rng.integers(0, 120, (B, 7)),
        prompt_input_ids=rng.integers(0, 120, (B, 5)),
        key=jax.random.PRNGKey(7),
    )
    codes = np.asarray(out.codes)
    assert codes.shape == (B, K, MAXLEN - K)
    assert codes.min() >= 0 and codes.max() < 32
    assert out.audio.shape == (B, (MAXLEN - K) * cfg.audio_encoder.hop_length)
    # two different seeds differ (sampling is live)
    out2 = G.generate(
        params, cfg, gen,
        input_ids=rng.integers(0, 120, (B, 7)),
        prompt_input_ids=rng.integers(0, 120, (B, 5)),
        key=jax.random.PRNGKey(8),
    )
    assert not np.array_equal(np.asarray(out.tokens), np.asarray(out2.tokens))
