"""Runtime kernel-selection flags.

Pallas TPU kernels are used automatically on TPU backends; tests on the CPU
backend use the XLA fallbacks (or pallas interpret mode where exercised
explicitly).  ``set_pallas(...)`` overrides the auto-detection.
"""

from __future__ import annotations

import jax

_PALLAS_OVERRIDE: bool | None = None


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
