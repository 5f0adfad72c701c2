"""Runtime kernel-selection flags.

Pallas TPU kernels are used automatically on TPU backends; tests on the CPU
backend use the XLA fallbacks (or pallas interpret mode where exercised
explicitly).  ``set_pallas(...)`` overrides the auto-detection.
"""

from __future__ import annotations

import jax

_PALLAS_OVERRIDE: bool | None = None
_PALLAS_DECODE_OVERRIDE: bool | None = None


def set_pallas(enabled: bool | None) -> None:
    """True/False forces pallas kernels on/off; None restores auto."""
    global _PALLAS_OVERRIDE
    _PALLAS_OVERRIDE = enabled


def use_pallas() -> bool:
    if _PALLAS_OVERRIDE is not None:
        return _PALLAS_OVERRIDE
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# NOTE: there is deliberately no pallas decode-attention kernel (and no flag
# for one).  Two designs were measured on v5e at production decode shapes
# (batch 32, T ~300-900): a per-(batch,head) sequential grid (13.7 ms/step)
# and a head-folded (batch, kv-block) grid with VPU multiply-reduce
# (20-23 ms/step with int8 or bf16 KV).  XLA's fused batched single-query
# attention over the (L, B, H, D, T) time-minor cache wins (< 9 ms/step), so
# the kernel was removed rather than shipped as a slower opt-in.
