"""PyTorch → JAX weight importers.

Maps HF/PyTorch state_dicts onto this framework's parameter pytrees so real
checkpoints (``parler-tts/parler_tts_mini_v0.1``, ``google/flan-t5-base``,
``parler-tts/dac_44khZ_8kbps``) can be loaded for the allclose quality gate
(BASELINE.md).  Works on plain ``{name: numpy array}`` dicts, so callers can
feed ``torch_model.state_dict()`` or safetensors files without torch at
runtime.

Layout conversions:
* torch ``nn.Linear`` weight (out, in) → dense kernel (in, out): transpose
* torch ``nn.Conv1d`` weight (out, in, width) → (width, in, out)
* torch ``nn.ConvTranspose1d`` weight (in, out, width) → (width, in, out)
  (handled by the DAC importer; see models/dac.py for the conv semantics)
"""

from __future__ import annotations

from typing import Callable, Mapping

import numpy as np

Array = np.ndarray


def _np(t) -> np.ndarray:
    """torch tensor | ndarray -> float32 ndarray (detached)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _lin(sd: Mapping[str, Array], name: str, bias: bool = False) -> dict:
    p = {"kernel": _np(sd[f"{name}.weight"]).T}
    if bias:
        p["bias"] = _np(sd[f"{name}.bias"])
    return p


def _ln(sd: Mapping[str, Array], name: str) -> dict:
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _rms(sd: Mapping[str, Array], name: str) -> dict:
    return {"scale": _np(sd[f"{name}.weight"])}


def _emb(sd: Mapping[str, Array], name: str) -> dict:
    return {"embedding": _np(sd[f"{name}.weight"])}


def import_t5_encoder(sd: Mapping[str, Array], num_layers: int, prefix: str = "encoder") -> dict:
    """HF ``T5EncoderModel`` / the encoder of ``T5Model`` → t5_encoder params.

    Key layout per HF: ``shared.weight``,
    ``encoder.block.{i}.layer.0.SelfAttention.{q,k,v,o}.weight``,
    ``encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight``,
    ``encoder.block.{i}.layer.{0,1}.layer_norm.weight``,
    ``encoder.block.{i}.layer.1.DenseReluDense.{wi_0,wi_1,wo}.weight``,
    ``encoder.final_layer_norm.weight``.
    """
    shared_key = "shared.weight" if "shared.weight" in sd else f"{prefix}.embed_tokens.weight"
    layers = []
    for i in range(num_layers):
        b = f"{prefix}.block.{i}"
        ff = f"{b}.layer.1.DenseReluDense"
        if f"{ff}.wi_0.weight" in sd:
            ffn = {"wi_0": _lin(sd, f"{ff}.wi_0"), "wi_1": _lin(sd, f"{ff}.wi_1"), "wo": _lin(sd, f"{ff}.wo")}
        else:  # non-gated t5 v1.0
            ffn = {"wi": _lin(sd, f"{ff}.wi"), "wo": _lin(sd, f"{ff}.wo")}
        layers.append(
            {
                "attn": {
                    "q": _lin(sd, f"{b}.layer.0.SelfAttention.q"),
                    "k": _lin(sd, f"{b}.layer.0.SelfAttention.k"),
                    "v": _lin(sd, f"{b}.layer.0.SelfAttention.v"),
                    "o": _lin(sd, f"{b}.layer.0.SelfAttention.o"),
                },
                "ln_attn": _rms(sd, f"{b}.layer.0.layer_norm"),
                "ffn": ffn,
                "ln_ffn": _rms(sd, f"{b}.layer.1.layer_norm"),
            }
        )
    return {
        "token_embed": {"embedding": _np(sd[shared_key])},
        "rel_attn_bias": _emb(sd, f"{prefix}.block.0.layer.0.SelfAttention.relative_attention_bias"),
        "layers": layers,
        "final_ln": _rms(sd, f"{prefix}.final_layer_norm"),
    }


def import_decoder(sd: Mapping[str, Array], num_layers: int, num_codebooks: int, prefix: str = "model.decoder") -> dict:
    """Reference ``ParlerTTSForCausalLM`` state_dict → decoder params.

    Key layout per the reference (``modeling_parler_tts.py:755-978, 1069``):
    ``model.decoder.embed_tokens.{k}.weight`` (K tables),
    ``model.decoder.layers.{i}.self_attn.{k,v,q,out}_proj.weight`` (bias-free),
    ``...encoder_attn...``, ``...fc1/fc2.weight``,
    ``...{self_attn,encoder_attn,final}_layer_norm.{weight,bias}``,
    ``model.decoder.layer_norm.{weight,bias}``, ``lm_heads.{k}.weight``.
    """

    def attn(base: str) -> dict:
        return {
            "q": _lin(sd, f"{base}.q_proj"),
            "k": _lin(sd, f"{base}.k_proj"),
            "v": _lin(sd, f"{base}.v_proj"),
            "o": _lin(sd, f"{base}.out_proj"),
        }

    layers = []
    for i in range(num_layers):
        b = f"{prefix}.layers.{i}"
        layers.append(
            {
                "self_attn": attn(f"{b}.self_attn"),
                "ln_self": _ln(sd, f"{b}.self_attn_layer_norm"),
                "cross_attn": attn(f"{b}.encoder_attn"),
                "ln_cross": _ln(sd, f"{b}.encoder_attn_layer_norm"),
                "fc1": _lin(sd, f"{b}.fc1"),
                "fc2": _lin(sd, f"{b}.fc2"),
                "ln_ffn": _ln(sd, f"{b}.final_layer_norm"),
            }
        )
    # stack per-layer trees into leading (L, ...) axes (models/decoder.py
    # scans over layers)
    stacked = {}
    for key in layers[0]:
        if isinstance(layers[0][key], dict) and "kernel" not in layers[0][key] and "scale" not in layers[0][key]:
            stacked[key] = {
                sub: {leaf: np.stack([lyr[key][sub][leaf] for lyr in layers]) for leaf in layers[0][key][sub]}
                for sub in layers[0][key]
            }
        else:
            stacked[key] = {leaf: np.stack([lyr[key][leaf] for lyr in layers]) for leaf in layers[0][key]}

    embeds = np.stack([_np(sd[f"{prefix}.embed_tokens.{k}.weight"]) for k in range(num_codebooks)])
    heads = None
    if any(k.startswith("lm_heads.") for k in sd):
        heads = np.stack([_np(sd[f"lm_heads.{k}.weight"]).T for k in range(num_codebooks)])
    return {
        "embed_tokens": {"embedding": embeds},  # (K, vocab+1, hidden)
        "layers": stacked,
        "final_ln": _ln(sd, f"{prefix}.layer_norm"),
        **({"lm_heads": {"kernel": heads}} if heads is not None else {}),  # (K, hidden, vocab)
    }


def _conv_weight(sd: Mapping[str, Array], name: str) -> np.ndarray:
    """Conv weight with weight-norm folding.

    HF ``DacModel`` checkpoints store plain ``{name}.weight``; original
    descript checkpoints store weight_norm parametrizations
    (``{name}.parametrizations.weight.original0`` = g,
    ``...original1`` = v; w = g * v / ||v||, norm over all dims but 0).
    Inference never needs the decomposition, so fold at import.
    """
    if f"{name}.weight" in sd:
        return _np(sd[f"{name}.weight"])
    if f"{name}.weight_g" in sd:  # pre-parametrizations torch weight_norm
        g = _np(sd[f"{name}.weight_g"]).astype(np.float64)
        v = _np(sd[f"{name}.weight_v"]).astype(np.float64)
        norm = np.sqrt(np.sum(v**2, axis=tuple(range(1, v.ndim)), keepdims=True))
        return (g * v / norm).astype(np.float32)
    g = _np(sd[f"{name}.parametrizations.weight.original0"]).astype(np.float64)
    v = _np(sd[f"{name}.parametrizations.weight.original1"]).astype(np.float64)
    norm = np.sqrt(np.sum(v**2, axis=tuple(range(1, v.ndim)), keepdims=True))
    return (g * v / norm).astype(np.float32)


def _conv(sd: Mapping[str, Array], name: str) -> dict:
    """torch Conv1d (out, in, W) -> WIO (W, in, out)."""
    return {"kernel": _conv_weight(sd, name).transpose(2, 1, 0), "bias": _np(sd[f"{name}.bias"])}


def _conv_t(sd: Mapping[str, Array], name: str) -> dict:
    """torch ConvTranspose1d (in, out, W) -> WIO (W, in, out), time-flipped so
    the forward pass is a plain lhs-dilated conv (see ops/conv.py)."""
    w = _conv_weight(sd, name).transpose(2, 0, 1)[::-1].copy()
    return {"kernel": w, "bias": _np(sd[f"{name}.bias"])}


def _snake(sd: Mapping[str, Array], name: str) -> dict:
    return {"alpha": _np(sd[f"{name}.alpha"]).reshape(-1)}


def import_dac(sd: Mapping[str, Array], num_down: int = 4, num_up: int = 4, num_codebooks: int = 9) -> dict:
    """HF ``transformers.DacModel`` (or weight-normed descript) state_dict →
    models/dac.py params.  Key layout per transformers' DAC port:
    ``encoder.conv1``, ``encoder.block.{i}.{res_unit{1..3},snake1,conv1}``,
    ``encoder.{snake1,conv2}``; ``decoder.conv1``,
    ``decoder.block.{i}.{snake1,conv_t1,res_unit{1..3}}``,
    ``decoder.{snake1,conv2}``; ``quantizer.quantizers.{k}.{in_proj,out_proj,
    codebook}``.
    """

    def res(base: str) -> dict:
        return {
            "snake1": _snake(sd, f"{base}.snake1"),
            "conv1": _conv(sd, f"{base}.conv1"),
            "snake2": _snake(sd, f"{base}.snake2"),
            "conv2": _conv(sd, f"{base}.conv2"),
        }

    encoder = {
        "conv_in": _conv(sd, "encoder.conv1"),
        "blocks": [
            {
                "res1": res(f"encoder.block.{i}.res_unit1"),
                "res2": res(f"encoder.block.{i}.res_unit2"),
                "res3": res(f"encoder.block.{i}.res_unit3"),
                "snake": _snake(sd, f"encoder.block.{i}.snake1"),
                "conv_down": _conv(sd, f"encoder.block.{i}.conv1"),
            }
            for i in range(num_down)
        ],
        "snake_out": _snake(sd, "encoder.snake1"),
        "conv_out": _conv(sd, "encoder.conv2"),
    }
    decoder = {
        "conv_in": _conv(sd, "decoder.conv1"),
        "blocks": [
            {
                "snake": _snake(sd, f"decoder.block.{i}.snake1"),
                "conv_up": _conv_t(sd, f"decoder.block.{i}.conv_t1"),
                "res1": res(f"decoder.block.{i}.res_unit1"),
                "res2": res(f"decoder.block.{i}.res_unit2"),
                "res3": res(f"decoder.block.{i}.res_unit3"),
            }
            for i in range(num_up)
        ],
        "snake_out": _snake(sd, "decoder.snake1"),
        "conv_out": _conv(sd, "decoder.conv2"),
    }
    quantizer = {
        "codebooks": np.stack(
            [_np(sd[f"quantizer.quantizers.{k}.codebook.weight"]) for k in range(num_codebooks)]
        ),
        "in_proj": {
            "kernel": np.stack(
                [_conv_weight(sd, f"quantizer.quantizers.{k}.in_proj")[:, :, 0].T for k in range(num_codebooks)]
            ),
            "bias": np.stack([_np(sd[f"quantizer.quantizers.{k}.in_proj.bias"]) for k in range(num_codebooks)]),
        },
        "out_proj": {
            "kernel": np.stack(
                [_conv_weight(sd, f"quantizer.quantizers.{k}.out_proj")[:, :, 0].T for k in range(num_codebooks)]
            ),
            "bias": np.stack([_np(sd[f"quantizer.quantizers.{k}.out_proj.bias"]) for k in range(num_codebooks)]),
        },
    }
    return {"encoder": encoder, "decoder": decoder, "quantizer": quantizer}


def import_encodec(sd: Mapping[str, Array], cfg) -> dict:
    """HF ``transformers.EncodecModel`` state_dict → models/encodec.py params.

    The HF module lists interleave parameter-free ``nn.ELU`` entries, so the
    flat ``encoder.layers.{i}`` / ``decoder.layers.{i}`` indices are walked
    with the same loop structure HF builds them with (``EncodecEncoder`` /
    ``EncodecDecoder``).  Weight-norm is folded; ``bias_ih + bias_hh`` of each
    LSTM layer fold into one bias.  ``cfg`` is a
    ``parler_tts_tpu.core.config.EncodecConfig``.
    """
    gn = cfg.norm_type == "time_group_norm"

    def conv(name: str) -> dict:
        p = _conv(sd, f"{name}.conv")
        if gn:
            p["norm"] = _ln(sd, f"{name}.norm")
        return p

    def conv_t(name: str) -> dict:
        p = _conv_t(sd, f"{name}.conv")
        if gn:
            p["norm"] = _ln(sd, f"{name}.norm")
        return p

    def res(name: str) -> dict:
        # EncodecResnetBlock.block = [ELU, conv, ELU, conv] — convs at 1, 3
        p = {"conv1": conv(f"{name}.block.1"), "conv2": conv(f"{name}.block.3")}
        if cfg.use_conv_shortcut:
            p["shortcut"] = conv(f"{name}.shortcut")
        return p

    def lstm(name: str) -> list[dict]:
        out = []
        for k in range(cfg.num_lstm_layers):
            out.append(
                {
                    "wi": _np(sd[f"{name}.weight_ih_l{k}"]).T,  # (C, 4H)
                    "wh": _np(sd[f"{name}.weight_hh_l{k}"]).T,  # (H, 4H)
                    "bias": _np(sd[f"{name}.bias_ih_l{k}"]) + _np(sd[f"{name}.bias_hh_l{k}"]),
                }
            )
        return out

    i = 0
    encoder: dict = {"conv_in": conv(f"encoder.layers.{i}")}
    i += 1
    blocks = []
    for _ratio in reversed(cfg.upsampling_ratios):
        rs = []
        for _ in range(cfg.num_residual_layers):
            rs.append(res(f"encoder.layers.{i}"))
            i += 1
        i += 1  # ELU
        blocks.append({"res": rs, "conv_down": conv(f"encoder.layers.{i}")})
        i += 1
    encoder["blocks"] = blocks
    encoder["lstm"] = lstm(f"encoder.layers.{i}.lstm")
    i += 2  # lstm, ELU
    encoder["conv_out"] = conv(f"encoder.layers.{i}")

    i = 0
    decoder: dict = {"conv_in": conv(f"decoder.layers.{i}")}
    i += 1
    decoder["lstm"] = lstm(f"decoder.layers.{i}.lstm")
    i += 1
    blocks = []
    for _ratio in cfg.upsampling_ratios:
        i += 1  # ELU
        up = conv_t(f"decoder.layers.{i}")
        i += 1
        rs = []
        for _ in range(cfg.num_residual_layers):
            rs.append(res(f"decoder.layers.{i}"))
            i += 1
        blocks.append({"conv_up": up, "res": rs})
    decoder["blocks"] = blocks
    i += 1  # ELU
    decoder["conv_out"] = conv(f"decoder.layers.{i}")

    quantizer = {
        "codebooks": np.stack(
            [_np(sd[f"quantizer.layers.{k}.codebook.embed"]) for k in range(cfg.num_quantizers)]
        )
    }
    return {"encoder": encoder, "decoder": decoder, "quantizer": quantizer}


def strip_prefix(sd: Mapping[str, Array], prefix: str) -> dict[str, Array]:
    pl = prefix + "."
    return {k[len(pl):]: v for k, v in sd.items() if k.startswith(pl)}
