"""Device mesh + sharding rules — the TPU-native replacement for the
reference's Accelerate/DDP/NCCL distribution layer (SURVEY.md §2.9, §5.8).

Two logical mesh axes:

* ``data``  — batch parallelism (the reference's only strategy: DDP over 8
  GPUs, ``training/run_parler_tts_training.py:1389``); gradients are
  all-reduced by GSPMD over ICI instead of NCCL ring all-reduce.
* ``model`` — tensor parallelism over attention heads / FFN columns /
  vocab, for decoders that exceed one chip (the ~2B "Large-class" config in
  BASELINE.json; the reference only anticipates TP in a comment,
  ``modeling_parler_tts.py:376-377``).

Parameter placement is expressed as ``PartitionSpec`` trees mirroring the
parameter trees; activations are annotated in-model with
``with_sharding_constraint`` where it matters and otherwise left to GSPMD.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int | None = None, model: int = 1, *, devices=None) -> Mesh:
    """Build a (data, model) mesh.  ``data=None`` uses all remaining devices.
    Axis sizes of 1 keep the axis present so specs stay valid unsharded."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} needs {data*model} devices, have {n}"
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])


# ---------------------------------------------------------------------------
# Parameter partition specs (tensor parallelism layout)
# ---------------------------------------------------------------------------

_REPLICATED = P()


def _attn_specs(stacked: bool) -> dict:
    """q/k/v shard output features (head dim); o shards input features —
    the Megatron column/row split, collectives ride ICI after the o-proj."""
    l = (None,) if stacked else ()
    return {
        "q": {"kernel": P(*l, None, MODEL_AXIS)},
        "k": {"kernel": P(*l, None, MODEL_AXIS)},
        "v": {"kernel": P(*l, None, MODEL_AXIS)},
        "o": {"kernel": P(*l, MODEL_AXIS, None)},
    }


def decoder_param_specs(params: Any) -> Any:
    """PartitionSpec tree for ``models/decoder.py`` params (stacked layers:
    every layer leaf has a leading L axis)."""
    specs = {
        "embed_tokens": {"embedding": _REPLICATED},
        "layers": {
            "self_attn": _attn_specs(stacked=True),
            "ln_self": {"scale": _REPLICATED, "bias": _REPLICATED},
            "cross_attn": _attn_specs(stacked=True),
            "ln_cross": {"scale": _REPLICATED, "bias": _REPLICATED},
            "fc1": {"kernel": P(None, None, MODEL_AXIS)},
            "fc2": {"kernel": P(None, MODEL_AXIS, None)},
            "ln_ffn": {"scale": _REPLICATED, "bias": _REPLICATED},
        },
        "final_ln": {"scale": _REPLICATED, "bias": _REPLICATED},
    }
    if "lm_heads" in params:
        specs["lm_heads"] = {"kernel": P(None, None, MODEL_AXIS)}
    return specs


def t5_param_specs(params: Any) -> Any:
    layer_spec = {
        "attn": _attn_specs(stacked=False),
        "ln_attn": {"scale": _REPLICATED},
        "ffn": (
            {
                "wi_0": {"kernel": P(None, MODEL_AXIS)},
                "wi_1": {"kernel": P(None, MODEL_AXIS)},
                "wo": {"kernel": P(MODEL_AXIS, None)},
            }
            if "wi_0" in params["layers"][0]["ffn"]
            else {
                "wi": {"kernel": P(None, MODEL_AXIS)},
                "wo": {"kernel": P(MODEL_AXIS, None)},
            }
        ),
        "ln_ffn": {"scale": _REPLICATED},
    }
    return {
        "token_embed": {"embedding": _REPLICATED},
        "rel_attn_bias": {"embedding": _REPLICATED},
        "layers": [layer_spec for _ in params["layers"]],
        "final_ln": {"scale": _REPLICATED},
    }


def composite_param_specs(params: Any) -> Any:
    """Spec tree for the full composite model params (models/parler.py)."""
    specs: dict = {
        "text_encoder": t5_param_specs(params["text_encoder"]),
        "decoder": decoder_param_specs(params["decoder"]),
        "embed_prompts": {"embedding": _REPLICATED},
    }
    if "enc_to_dec_proj" in params:
        specs["enc_to_dec_proj"] = {"kernel": _REPLICATED, "bias": _REPLICATED}
    if "audio_encoder" in params:
        # codec is small (~75M) and bandwidth-bound: replicate
        specs["audio_encoder"] = jax.tree.map(lambda _: _REPLICATED, params["audio_encoder"])
    return specs


def shard_params(params: Any, mesh: Mesh, specs: Any = None) -> Any:
    """Place a parameter tree on the mesh according to its spec tree."""
    if specs is None:
        specs = composite_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def data_sharding(mesh: Mesh, *trailing_none: int) -> NamedSharding:
    """Batch-dim sharding for inputs: (data, None, ...)."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * len(trailing_none))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array in a batch dict along its leading (batch) axis."""
    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)
