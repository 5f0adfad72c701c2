"""Codec dispatch: route encode/decode/init to the DAC or EnCodec family by
config type.

The reference achieves codec pluggability through the HF Auto registry — any
codec registered as an ``AutoModel`` can be assembled into the composite
(``/root/reference/parler_tts/modeling_parler_tts.py:1854-1879``, exercised
with ``facebook/encodec_24khz`` in
``helpers/model_init_scripts/init_dummy_model_with_encodec.py:11-18``).  Here
the same capability is a typed dispatch over the two codec config
dataclasses; the generation/training/streaming paths call this module so a
composite can carry either codec.
"""

from __future__ import annotations

import jax.numpy as jnp

from parler_tts_tpu.core.config import DACConfig, EncodecConfig
from parler_tts_tpu.models import dac as dac_mod
from parler_tts_tpu.models import encodec as encodec_mod
from parler_tts_tpu.ops.nn import Params


def is_encodec(cfg) -> bool:
    return isinstance(cfg, EncodecConfig) or getattr(cfg, "codec_type", "dac") == "encodec"


def encode(params: Params, cfg, audio: jnp.ndarray, *, n_quantizers: int | None = None) -> jnp.ndarray:
    """(B, T) waveform -> (B, K, T_frames) codes, K = the composite's
    codebook count (``cfg.num_codebooks``)."""
    if is_encodec(cfg):
        if cfg.normalize or cfg.chunk_length is not None:
            raise ValueError(
                "composite models require a codes-only codec (normalize=False, "
                "unchunked) — the 48 kHz normalized EnCodec carries per-chunk "
                "scales the token LM cannot model; use models/encodec.py directly"
            )
        return encodec_mod.encode(params, cfg, audio, n_quantizers=n_quantizers or cfg.num_codebooks)
    return dac_mod.encode(params, cfg, audio, n_quantizers=n_quantizers)


def decode(params: Params, cfg, codes: jnp.ndarray, *, dtype=None) -> jnp.ndarray:
    """(B, K, T_frames) codes -> (B, T_frames * hop) waveform."""
    if is_encodec(cfg):
        return encodec_mod.decode(params, cfg, codes, dtype=dtype)
    return dac_mod.decode(params, cfg, codes, dtype=dtype)


def init(key, cfg) -> Params:
    return (encodec_mod if is_encodec(cfg) else dac_mod).init(key, cfg)


def import_torch(sd, cfg) -> Params:
    """torch codec state_dict -> params (weight-norm folded)."""
    from parler_tts_tpu.core import torch_import as ti

    if is_encodec(cfg):
        return ti.import_encodec(sd, cfg)
    return ti.import_dac(
        sd,
        num_down=len(cfg.downsampling_ratios),
        num_up=len(cfg.upsampling_ratios),
        num_codebooks=cfg.num_codebooks,
    )
