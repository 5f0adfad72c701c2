"""parler_tts_tpu — TPU-native (JAX/XLA/Pallas) text-to-speech framework with
the capabilities of Parler-TTS (reference: danlyth/parler-tts).

Public API mirrors the reference package surface
(``/root/reference/parler_tts/__init__.py:4-16``) in functional JAX form.
"""

from parler_tts_tpu.core.config import (
    DACConfig,
    DecoderConfig,
    EncodecConfig,
    GenerationConfig,
    ParlerTTSConfig,
    T5EncoderConfig,
    dummy_config,
    mini_600m_config,
)
from parler_tts_tpu.models.delay_pattern import (
    apply_delay_pattern,
    build_delay_pattern,
    build_delay_pattern_labels,
    undelay_pattern,
)

__version__ = "0.1.0"

__all__ = [
    "DACConfig",
    "DecoderConfig",
    "EncodecConfig",
    "GenerationConfig",
    "ParlerTTSConfig",
    "T5EncoderConfig",
    "apply_delay_pattern",
    "build_delay_pattern",
    "build_delay_pattern_labels",
    "dummy_config",
    "mini_600m_config",
    "undelay_pattern",
]
