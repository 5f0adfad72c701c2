"""1-D convolution ops in NWC layout (TPU-friendly: channels-last keeps the
contraction on the MXU lane dimension).

Kernels are stored ``(width, in_channels, out_channels)`` (WIO).  Semantics
match ``torch.nn.Conv1d`` / ``torch.nn.ConvTranspose1d`` with integer
symmetric padding — the DAC codec stack is specified in torch terms
(reference ``parler_tts/dac_wrapper/modeling_dac.py`` wrapping descript's
conv stacks; architecture mirrored by transformers ``DacModel``).

The transposed conv expects its kernel **already time-flipped and
in/out-transposed at import** (see ``core/torch_import.import_dac``), so the
forward pass is a single ``conv_general_dilated`` with ``lhs_dilation`` —
exactly the form XLA lowers best on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from parler_tts_tpu.ops.nn import Params, _precision


def conv1d(
    params: Params,
    x: jnp.ndarray,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """torch ``Conv1d`` equivalent. x: (B, T, C_in) -> (B, T', C_out)."""
    y = lax.conv_general_dilated(
        x,
        params["kernel"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=_precision(x),
    )
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def conv_transpose1d(
    params: Params,
    x: jnp.ndarray,
    *,
    stride: int,
    padding: int = 0,
) -> jnp.ndarray:
    """torch ``ConvTranspose1d`` equivalent (output_padding=0).

    Implemented as a stride-1 conv over the input dilated by ``stride`` with
    edge padding ``width - 1 - padding`` — identical output:
    ``out_len = (T-1)*stride - 2*padding + width``.
    """
    width = params["kernel"].shape[0]
    pad = width - 1 - padding
    y = lax.conv_general_dilated(
        x,
        params["kernel"].astype(x.dtype),
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=_precision(x),
    )
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y
