"""Composite Parler-TTS model: frozen T5 text encoder + prompt embedding +
codec-token decoder LM + DAC audio codec.

TPU-native equivalent of ``ParlerTTSForConditionalGeneration``
(``/root/reference/parler_tts/modeling_parler_tts.py:1560-2686``):

* ``encode_text`` — T5 encode, optional ``enc_to_dec_proj`` (created only
  when dims differ, reference ``:1634-1639``), padded positions zeroed
  (reference ``:2016-2017``);
* ``embed_prompts`` — plain embedding table over the *prompt tokenizer*
  vocab (reference ``:1641-1642``);
* ``train_forward`` — teacher-forced full-sequence loss exactly matching the
  reference training step (``training/run_parler_tts_training.py:1491-1516``).

Generation lives in ``parler_tts_tpu/generation``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parler_tts_tpu.core.config import ParlerTTSConfig
from parler_tts_tpu.models import decoder as decoder_mod
from parler_tts_tpu.models import t5_encoder
from parler_tts_tpu.models.delay_pattern import labels_to_decoder_inputs
from parler_tts_tpu.ops.nn import Params, dense, embed, normal_init


def has_proj(cfg: ParlerTTSConfig) -> bool:
    return cfg.text_encoder.d_model != cfg.decoder.hidden_size


def encode_text(
    params: Params,
    cfg: ParlerTTSConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None,
    *,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Description ids -> decoder-dim encoder hidden states, padding zeroed."""
    h = t5_encoder.encode(params["text_encoder"], cfg.text_encoder, input_ids, attention_mask, dtype=dtype)
    if "enc_to_dec_proj" in params:
        h = dense(params["enc_to_dec_proj"], h)
    if attention_mask is not None:
        h = h * attention_mask[..., None].astype(h.dtype)
    return h


def embed_prompts(params: Params, prompt_input_ids: jnp.ndarray, *, dtype=jnp.float32) -> jnp.ndarray:
    return embed(params["embed_prompts"], prompt_input_ids, dtype=dtype)


def train_forward(
    params: Params,
    cfg: ParlerTTSConfig,
    *,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    prompt_input_ids: jnp.ndarray,
    prompt_attention_mask: jnp.ndarray,
    labels: jnp.ndarray,
    decoder_attention_mask: jnp.ndarray | None = None,
    train_key: jnp.ndarray | None = None,
    remat: bool | str = False,
    scan_unroll: int | str | None = None,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced loss (reference composite ``forward`` ``:1927-2079``).

    labels: (B, K, T) delay-pattern labels with -100 holes (see
    ``delay_pattern.build_delay_pattern_labels``).  ``train_key`` enables
    decoder dropout/layerdrop (the frozen text encoder always runs in eval
    mode, like the reference's ``freeze_encoders``).  ``remat`` enables
    per-layer gradient checkpointing (reference ``gradient_checkpointing``,
    ``modeling_parler_tts.py:921-933``).  Returns (loss, lm_logits).
    """
    dcfg = cfg.decoder
    enc_hidden = encode_text(params, cfg, input_ids, attention_mask, dtype=dtype)
    prompt_hidden = embed_prompts(params, prompt_input_ids, dtype=dtype)

    decoder_input_ids = labels_to_decoder_inputs(
        labels, bos_token_id=dcfg.bos_token_id, pad_token_id=dcfg.pad_token_id
    )

    t = labels.shape[-1]
    if decoder_attention_mask is None:
        decoder_attention_mask = jnp.ones((labels.shape[0], t), jnp.int32)
    fused_mask = jnp.concatenate([prompt_attention_mask, decoder_attention_mask], axis=1)

    hidden, _ = decoder_mod.forward(
        params["decoder"],
        dcfg,
        decoder_input_ids,
        prompt_hidden_states=prompt_hidden,
        encoder_hidden_states=enc_hidden,
        encoder_attention_mask=attention_mask,
        attention_mask=fused_mask,
        train_key=train_key,
        remat=remat,
        scan_unroll=scan_unroll,
        dtype=dtype,
    )
    lm_logits = decoder_mod.logits(params["decoder"], hidden, num_labels=t)
    loss = decoder_mod.loss_fn(lm_logits, labels, decoder_input_ids, dcfg)
    return loss, lm_logits


def init(key, cfg: ParlerTTSConfig, *, with_audio_encoder: bool = True) -> Params:
    """From-scratch init mirroring ``helpers/model_init_scripts`` assembly
    (decoder randomly initialized; T5/codec would normally be imported).
    The codec family (DAC or EnCodec) follows ``cfg.audio_encoder``."""
    from parler_tts_tpu.models import codec as codec_mod

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params: Params = {
        "text_encoder": t5_encoder.init(k1, cfg.text_encoder),
        "decoder": decoder_mod.init(k2, cfg.decoder),
        "embed_prompts": {
            "embedding": normal_init(k3, (cfg.vocab_size, cfg.decoder.hidden_size), cfg.decoder.initializer_factor)
        },
    }
    if has_proj(cfg):
        params["enc_to_dec_proj"] = {
            "kernel": normal_init(k4, (cfg.text_encoder.d_model, cfg.decoder.hidden_size), cfg.decoder.initializer_factor),
            "bias": jnp.zeros((cfg.decoder.hidden_size,)),
        }
    if with_audio_encoder:
        params["audio_encoder"] = codec_mod.init(k5, cfg.audio_encoder)
    return params


def import_composite(sd, cfg: ParlerTTSConfig) -> Params:
    """Reference ``ParlerTTSForConditionalGeneration`` state_dict -> params.

    Sub-model prefixes per the reference assembly (``:1595-1642``):
    ``text_encoder.*`` (T5 encoder), ``audio_encoder.model.*`` (descript DAC),
    ``decoder.*`` (ParlerTTSForCausalLM), ``enc_to_dec_proj.{weight,bias}``,
    ``embed_prompts.weight``.
    """
    import numpy as np

    from parler_tts_tpu.core import torch_import as ti

    params: Params = {
        "text_encoder": ti.import_t5_encoder(
            ti.strip_prefix(sd, "text_encoder"), cfg.text_encoder.num_layers
        ),
        "decoder": ti.import_decoder(
            ti.strip_prefix(sd, "decoder"), cfg.decoder.num_hidden_layers, cfg.decoder.num_codebooks
        ),
        "embed_prompts": {"embedding": ti._np(sd["embed_prompts.weight"])},
    }
    if "enc_to_dec_proj.weight" in sd:
        params["enc_to_dec_proj"] = {
            "kernel": ti._np(sd["enc_to_dec_proj.weight"]).T,
            "bias": ti._np(sd["enc_to_dec_proj.bias"]),
        }
    # codec weights: the reference's DACModel wrapper nests the descript
    # model under ``audio_encoder.model.*``; checkpoints assembled with the
    # HF-native ``DacModel`` / ``EncodecModel`` (the encodec dummy assembly,
    # reference ``init_dummy_model_with_encodec.py``) put the identical
    # tensors directly under ``audio_encoder.*``
    from parler_tts_tpu.models import codec as codec_mod

    codec_sd = ti.strip_prefix(sd, "audio_encoder.model") or ti.strip_prefix(sd, "audio_encoder")
    if codec_sd:
        params["audio_encoder"] = codec_mod.import_torch(codec_sd, cfg.audio_encoder)
    return params
