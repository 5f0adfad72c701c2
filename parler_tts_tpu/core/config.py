"""Typed configuration system for the TPU-native Parler-TTS framework.

Design: plain frozen dataclasses + JSON round-trip, replacing the HF
``PretrainedConfig`` hierarchy used by the reference
(``/root/reference/parler_tts/configuration_parler_tts.py:29-238``).  The
composite config nests the three sub-model configs the same way the reference
nests ``text_encoder`` / ``audio_encoder`` / ``decoder`` sub-configs
(reference ``configuration_parler_tts.py:193-210``), and carries the
prompt-tokenizer vocab in ``ParlerTTSConfig.vocab_size``
(reference ``configuration_parler_tts.py:140-142``).

All fields that shape compiled computations (layers, dims, codebooks, max
lengths) are static Python ints so every model function can be ``jit``-ed with
static shapes.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def _fromdict(cls, d: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})


@dataclass(frozen=True)
class T5EncoderConfig:
    """Flan-T5 encoder hyper-parameters.

    Mirrors the fields of HF ``T5Config`` that the encoder path uses
    (the reference loads any ``AutoModelForTextEncoding``; in practice
    ``google/flan-t5-base`` — reference ``training/README.md:85``).
    Defaults = flan-t5-base.
    """

    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dense_act_fn: str = "gelu_new"  # flan-t5 uses gated-gelu
    is_gated_act: bool = True
    dropout_rate: float = 0.1

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv

    to_dict = _asdict
    from_dict = classmethod(_fromdict)


@dataclass(frozen=True)
class DACConfig:
    """Descript Audio Codec (44.1 kHz / 8 kbps) hyper-parameters.

    Field semantics follow the reference wrapper config
    (``/root/reference/parler_tts/dac_wrapper/configuration_dac.py:5-25``) and
    the descript-audio-codec model architecture it wraps
    (``/root/reference/parler_tts/dac_wrapper/modeling_dac.py:19-23``).
    """

    codec_type: str = "dac"  # discriminator for codec pluggability
    num_codebooks: int = 9
    model_bitrate: int = 8  # kbps
    codebook_size: int = 1024
    codebook_dim: int = 8
    latent_dim: int = 1024
    frame_rate: int = 86
    sampling_rate: int = 44100
    # encoder/decoder conv stacks (descript 44khz defaults)
    encoder_hidden_size: int = 64
    downsampling_ratios: tuple[int, ...] = (2, 4, 8, 8)
    decoder_hidden_size: int = 1536
    upsampling_ratios: tuple[int, ...] = (8, 8, 4, 2)

    def __post_init__(self):
        object.__setattr__(self, "downsampling_ratios", tuple(self.downsampling_ratios))
        object.__setattr__(self, "upsampling_ratios", tuple(self.upsampling_ratios))

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.downsampling_ratios:
            out *= r
        return out

    to_dict = _asdict
    from_dict = classmethod(_fromdict)


@dataclass(frozen=True)
class EncodecConfig:
    """Meta EnCodec neural codec hyper-parameters (defaults =
    ``facebook/encodec_24khz``).

    The reference proves codec pluggability by swapping EnCodec in for DAC
    through the HF Auto registry
    (``/root/reference/helpers/model_init_scripts/init_dummy_model_with_encodec.py:11-18``,
    ``/root/reference/parler_tts/modeling_parler_tts.py:1854-1879``); here the
    same capability is a second first-class codec family (``models/encodec.py``)
    selected by ``codec_type``.  Field semantics mirror HF
    ``transformers.EncodecConfig``.
    """

    codec_type: str = "encodec"
    target_bandwidths: tuple[float, ...] = (1.5, 3.0, 6.0, 12.0, 24.0)
    sampling_rate: int = 24000
    audio_channels: int = 1
    normalize: bool = False
    chunk_length_s: float | None = None
    overlap: float | None = None
    hidden_size: int = 128
    num_filters: int = 32
    num_residual_layers: int = 1
    upsampling_ratios: tuple[int, ...] = (8, 5, 4, 2)
    norm_type: str = "weight_norm"  # or "time_group_norm" (48 kHz model)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    use_causal_conv: bool = True
    pad_mode: str = "reflect"
    compress: int = 2
    num_lstm_layers: int = 2
    trim_right_ratio: float = 1.0
    codebook_size: int = 1024
    codebook_dim: int | None = None  # None -> hidden_size
    use_conv_shortcut: bool = True
    # how many codebook streams the composite's decoder LM models; EnCodec
    # itself carries num_quantizers codebooks and its RVQ decode sums however
    # many streams it is given (the reference dummy uses 8 of 32 at 24 kHz)
    num_codebooks: int | None = None  # None -> num_quantizers

    def __post_init__(self):
        object.__setattr__(self, "target_bandwidths", tuple(self.target_bandwidths))
        object.__setattr__(self, "upsampling_ratios", tuple(self.upsampling_ratios))
        if self.codebook_dim is None:
            object.__setattr__(self, "codebook_dim", self.hidden_size)
        if self.num_codebooks is None:
            object.__setattr__(self, "num_codebooks", self.num_quantizers)
        if self.norm_type not in ("weight_norm", "time_group_norm"):
            raise ValueError(f"norm_type must be weight_norm|time_group_norm, got {self.norm_type}")

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.upsampling_ratios:
            out *= r
        return out

    @property
    def frame_rate(self) -> int:
        return -(-self.sampling_rate // self.hop_length)  # ceil

    @property
    def codebook_nbits(self) -> int:
        return max(1, (self.codebook_size - 1).bit_length())

    @property
    def num_quantizers(self) -> int:
        """Total codebooks the model carries (HF ``EncodecConfig.num_quantizers``)."""
        return int(1000 * self.target_bandwidths[-1] // (self.frame_rate * self.codebook_nbits))

    @property
    def chunk_length(self) -> int | None:
        return None if self.chunk_length_s is None else int(self.chunk_length_s * self.sampling_rate)

    @property
    def chunk_stride(self) -> int | None:
        if self.chunk_length_s is None or self.overlap is None:
            return None
        return max(1, int((1.0 - self.overlap) * self.chunk_length))

    to_dict = _asdict
    from_dict = classmethod(_fromdict)


def _codec_from_dict(d: dict):
    cls = EncodecConfig if d.get("codec_type") == "encodec" else DACConfig
    return cls.from_dict(d)


@dataclass(frozen=True)
class DecoderConfig:
    """The MusicGen-style codec-token decoder LM.

    Field-for-field semantic equivalent of ``ParlerTTSDecoderConfig``
    (reference ``configuration_parler_tts.py:29-127``); Mini-600M values in
    ``helpers/model_init_scripts/init_model_600M.py:25-42``.
    """

    vocab_size: int = 1088  # codebook 1024 + 64 specials (Mini)
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    ffn_dim: int = 4096
    num_codebooks: int = 9
    max_position_embeddings: int = 4096
    activation_function: str = "gelu"
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    layerdrop: float = 0.0
    scale_embedding: bool = False
    use_cache: bool = True
    audio_channels: int = 1  # 2 = stereo (MusicGen-style interleaved
    # codebooks; mono codec codes are repeat_interleaved, reference
    # ``modeling_parler_tts.py:2042-2044``)
    initializer_factor: float = 0.02
    pad_token_id: int = 1024
    bos_token_id: int = 1025
    eos_token_id: int = 1024
    tie_word_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_attention_heads == 0
        return self.hidden_size // self.num_attention_heads

    to_dict = _asdict
    from_dict = classmethod(_fromdict)


@dataclass(frozen=True)
class ParlerTTSConfig:
    """Composite model config (text encoder + audio codec + decoder).

    ``vocab_size`` is the *prompt tokenizer* vocab (the T5 tokenizer's 32128
    in the Mini recipe) used for the ``embed_prompts`` table — reference
    ``configuration_parler_tts.py:140-142`` and
    ``modeling_parler_tts.py:1641-1642``.
    """

    vocab_size: int = 32128
    text_encoder: T5EncoderConfig = field(default_factory=T5EncoderConfig)
    audio_encoder: "DACConfig | EncodecConfig" = field(default_factory=DACConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)

    def __post_init__(self):
        if isinstance(self.text_encoder, dict):
            object.__setattr__(self, "text_encoder", T5EncoderConfig.from_dict(self.text_encoder))
        if isinstance(self.audio_encoder, dict):
            object.__setattr__(self, "audio_encoder", _codec_from_dict(self.audio_encoder))
        if isinstance(self.decoder, dict):
            object.__setattr__(self, "decoder", DecoderConfig.from_dict(self.decoder))

    @property
    def sampling_rate(self) -> int:
        # proxies the audio encoder, reference configuration_parler_tts.py:235-238
        return self.audio_encoder.sampling_rate

    @property
    def frame_rate(self) -> int:
        return self.audio_encoder.frame_rate

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "ParlerTTSConfig":
        return cls(
            vocab_size=d.get("vocab_size", 32128),
            text_encoder=d.get("text_encoder", T5EncoderConfig()),
            audio_encoder=d.get("audio_encoder", DACConfig()),
            decoder=d.get("decoder", DecoderConfig()),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "ParlerTTSConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))


@dataclass(frozen=True)
class GenerationConfig:
    """Decode-time defaults, mirroring the HF ``GenerationConfig`` the
    reference attaches to checkpoints (``init_model_600M.py:55-62``)."""

    max_length: int = 2580  # 30 s x 86 Hz
    do_sample: bool = True
    temperature: float = 1.0
    top_k: int = 0  # 0 = disabled
    top_p: float = 1.0
    guidance_scale: float = 1.0  # 1.0 = CFG off
    decoder_start_token_id: int = 1025
    pad_token_id: int = 1024
    bos_token_id: int = 1025
    eos_token_id: int = 1024
    # TPU-side runtime knobs (no reference equivalent — the torch stack has
    # neither):  "int8" KV cache halves decode HBM traffic + cache memory;
    # int8 weights halve the weight-streaming term that dominates small-batch
    # latency.  Both use exact scale folding (ops/quantization.py).
    kv_cache_dtype: str | None = None  # None = compute dtype, or "int8"
    int8_weights: bool = False
    # Growing-buffer KV length buckets: the decode loop runs one while_loop
    # per length bucket with the cache buffers PHYSICALLY sized to the bucket
    # (zero-padded at each transition), so attention HBM traffic scales with
    # generated length instead of max_length.  Value = max number of buckets
    # (compile cost is one loop body per bucket); <= 1 disables.  v5e, int8
    # cache, Mini batch 32: 10 s 4.48 ms/step@8 vs 4.77@1, 30 s 7.16@8 vs
    # 10.07@1, 3 s neutral (see PERFORMANCE.md).  (An earlier design that
    # statically SLICED reads from a full-size buffer lost across the board —
    # XLA materializes minor-axis slices per step.)
    kv_read_buckets: int = 8

    to_dict = _asdict
    from_dict = classmethod(_fromdict)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "GenerationConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))


def mini_600m_config() -> ParlerTTSConfig:
    """The Parler-TTS Mini v0.1 assembly (reference init_model_600M.py:25-62)."""
    return ParlerTTSConfig(
        vocab_size=32128,
        text_encoder=T5EncoderConfig(),  # flan-t5-base
        audio_encoder=DACConfig(),
        decoder=DecoderConfig(
            vocab_size=1088,
            max_position_embeddings=4096,
            num_hidden_layers=24,
            ffn_dim=4096,
            num_attention_heads=16,
            hidden_size=1024,
            num_codebooks=9,
            pad_token_id=1024,
            eos_token_id=1024,
            bos_token_id=1025,
        ),
    )


def large_2b_config() -> ParlerTTSConfig:
    """Large-class decoder (~2B params: 36L x 2048h x 32 heads, ffn 8192) for
    tensor-parallel sharding across chips (BASELINE.json config 3).  Text
    encoder steps up to flan-t5-large geometry."""
    return ParlerTTSConfig(
        vocab_size=32128,
        text_encoder=T5EncoderConfig(d_model=1024, d_kv=64, d_ff=2816, num_layers=24, num_heads=16),
        audio_encoder=DACConfig(),
        decoder=DecoderConfig(
            vocab_size=1088,
            max_position_embeddings=4096,
            num_hidden_layers=36,
            ffn_dim=8192,
            num_attention_heads=32,
            hidden_size=2048,
            num_codebooks=9,
            pad_token_id=1024,
            eos_token_id=1024,
            bos_token_id=1025,
        ),
    )


def dummy_config(num_codebooks: int = 9) -> ParlerTTSConfig:
    """Tiny smoke-test assembly mirroring reference init_dummy_model.py:25-42."""
    return ParlerTTSConfig(
        vocab_size=32128,
        text_encoder=T5EncoderConfig(
            vocab_size=32128, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4
        ),
        audio_encoder=DACConfig(),
        decoder=DecoderConfig(
            vocab_size=1088,
            max_position_embeddings=1024,
            num_hidden_layers=4,
            ffn_dim=512,
            num_attention_heads=8,
            hidden_size=512,
            num_codebooks=num_codebooks,
            pad_token_id=1024,
            eos_token_id=1024,
            bos_token_id=1025,
        ),
    )
