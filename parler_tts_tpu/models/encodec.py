"""Meta EnCodec neural codec, TPU-native.

Second first-class codec family next to DAC (``models/dac.py``) — the
reference proves codec pluggability by swapping ``facebook/encodec_24khz``
in for DAC through the HF Auto registry
(``/root/reference/helpers/model_init_scripts/init_dummy_model_with_encodec.py:11-18``,
``/root/reference/parler_tts/modeling_parler_tts.py:1854-1879``).  This is a
from-scratch JAX implementation of the full EnCodec architecture (verified
bit-exact-codes / allclose-waveform against ``transformers.EncodecModel`` in
``tests/test_encodec.py``):

* **SEANet encoder** — causal (or asymmetric) convs with reflect padding,
  ELU resnet blocks, strided downsampling, a 2-layer residual LSTM, final
  conv to the 128-dim latent (24 kHz: hop 320, 75 frames/s).
* **RVQ** — plain Euclidean residual vector quantization in the full latent
  space (no factorized projections, unlike DAC); the active codebook count
  follows the target bandwidth.
* **SEANet decoder** — mirrored LSTM + transposed-conv upsampling stack.

Both EnCodec variants are covered: the causal weight-normed 24 kHz model and
the non-causal ``time_group_norm`` chunked/normalized 48 kHz stereo model
(chunk overlap-add with triangular fade, per-chunk loudness scales).

TPU notes: everything is NWC (B, T, C) so channel contractions ride the MXU
lane dim; the LSTM input projection for all timesteps is hoisted into one
batched matmul, leaving only the (B, C)x(C, 4C) recurrent matmul inside the
``lax.scan``.  All padding/trim arithmetic is static Python on static shapes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from parler_tts_tpu.core.config import EncodecConfig
from parler_tts_tpu.ops.conv import conv1d, conv_transpose1d
from parler_tts_tpu.ops.nn import Params, _precision


# ---------------------------------------------------------------------------
# Conv layers with EnCodec's padding semantics
# ---------------------------------------------------------------------------


def _pad1d(x: jnp.ndarray, left: int, right: int, mode: str) -> jnp.ndarray:
    """Pad (B, T, C) along time.  Reflect mode replicates torch's
    small-input escape: when T <= max(pad), zero-pad right first so the
    reflection is well-defined, then drop the extra tail."""
    if left == 0 and right == 0:
        return x
    if mode != "reflect":
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    t = x.shape[1]
    max_pad = max(left, right)
    extra = 0
    if t <= max_pad:
        extra = max_pad - t + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    y = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    if extra:
        y = y[:, : y.shape[1] - extra]
    return y


def _group_norm(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """torch ``GroupNorm(1, C)`` over (B, T, C): normalize jointly over
    (T, C) per sample, per-channel affine (the 48 kHz ``time_group_norm``)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + 1e-5)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _ec_conv(p: Params, cfg: EncodecConfig, x: jnp.ndarray, *, stride: int = 1, dilation: int = 1) -> jnp.ndarray:
    """EnCodec Conv1d: auto extra-padding to land on whole output frames,
    causal (all-left) or asymmetric padding, optional time-group-norm
    (HF ``EncodecConv1d.forward``)."""
    width = p["kernel"].shape[0]
    eff_k = (width - 1) * dilation + 1
    pad_total = eff_k - stride
    t = x.shape[1]
    n_frames = math.ceil((t - eff_k + pad_total) / stride + 1) - 1
    extra = n_frames * stride + eff_k - pad_total - t
    if cfg.use_causal_conv:
        left, right = pad_total, extra
    else:
        pr = pad_total // 2
        left, right = pad_total - pr, pr + extra
    x = _pad1d(x, left, right, cfg.pad_mode)
    y = conv1d(p, x, stride=stride, dilation=dilation)
    if "norm" in p:
        y = _group_norm(p["norm"], y)
    return y


def _ec_conv_t(p: Params, cfg: EncodecConfig, x: jnp.ndarray, *, stride: int) -> jnp.ndarray:
    """EnCodec ConvTranspose1d: full transposed conv then fixed-padding trim —
    causal trims ``ceil(pad_total * trim_right_ratio)`` from the right
    (HF ``EncodecConvTranspose1d.forward``)."""
    width = p["kernel"].shape[0]
    pad_total = width - stride
    y = conv_transpose1d(p, x, stride=stride, padding=0)
    if "norm" in p:
        y = _group_norm(p["norm"], y)
    if cfg.use_causal_conv:
        pr = math.ceil(pad_total * cfg.trim_right_ratio)
    else:
        pr = pad_total // 2
    pl = pad_total - pr
    return y[:, pl : y.shape[1] - pr]


def _resnet(p: Params, cfg: EncodecConfig, x: jnp.ndarray, j: int) -> jnp.ndarray:
    """SEANet residual block: ELU → dilated conv (dim→dim/compress) → ELU →
    1x1 conv (→dim); conv or identity shortcut."""
    y = jax.nn.elu(x)
    y = _ec_conv(p["conv1"], cfg, y, dilation=cfg.dilation_growth_rate**j)
    y = jax.nn.elu(y)
    y = _ec_conv(p["conv2"], cfg, y)
    shortcut = _ec_conv(p["shortcut"], cfg, x) if "shortcut" in p else x
    return shortcut + y


def _lstm(layers, x: jnp.ndarray) -> jnp.ndarray:
    """torch ``nn.LSTM(dim, dim, L)`` + residual around the whole stack
    (HF ``EncodecLSTM``).  Input projections for all timesteps are one big
    (B·T, C)x(C, 4H) MXU matmul; the scan carries only the recurrent part."""
    y = x
    for p in layers:
        wi = p["wi"].astype(y.dtype)  # (C, 4H)
        wh = p["wh"].astype(y.dtype)  # (H, 4H)
        b = p["bias"].astype(y.dtype)  # (4H,) = b_ih + b_hh folded at import
        xp = (
            jnp.einsum("btc,ch->bth", y, wi, precision=_precision(y)) + b
        ).transpose(1, 0, 2)  # (T, B, 4H)
        h = xp.shape[2] // 4
        b_sz = y.shape[0]

        def step(carry, xt):
            hs, cs = carry
            gates = xt + hs @ wh
            i, f, g, o = jnp.split(gates, 4, axis=-1)  # torch gate order
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            cs = f * cs + i * jnp.tanh(g)
            hs = o * jnp.tanh(cs)
            return (hs, cs), hs

        init = (jnp.zeros((b_sz, h), y.dtype), jnp.zeros((b_sz, h), y.dtype))
        _, out = lax.scan(step, init, xp)
        y = out.transpose(1, 0, 2)  # (B, T, H)
    return y + x


# ---------------------------------------------------------------------------
# Encoder / decoder stacks
# ---------------------------------------------------------------------------


def encoder_forward(p: Params, cfg: EncodecConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """(B, T) mono or (B, T, channels) waveform -> (B, T/hop, hidden)."""
    x = audio[..., None] if audio.ndim == 2 else audio
    x = _ec_conv(p["conv_in"], cfg, x)
    for block, ratio in zip(p["blocks"], reversed(cfg.upsampling_ratios)):
        for j, r in enumerate(block["res"]):
            x = _resnet(r, cfg, x, j)
        x = jax.nn.elu(x)
        x = _ec_conv(block["conv_down"], cfg, x, stride=ratio)
    x = _lstm(p["lstm"], x)
    x = jax.nn.elu(x)
    return _ec_conv(p["conv_out"], cfg, x)


def decoder_forward(p: Params, cfg: EncodecConfig, z: jnp.ndarray, *, dtype=None) -> jnp.ndarray:
    """(B, T75, hidden) quantized latents -> (B, T75*hop[, channels]) waveform.

    ``dtype=jnp.bfloat16`` selects the serving compute path (output returned
    fp32); default fp32 is the golden-parity path.
    """
    if dtype is not None:
        z = z.astype(dtype)
    x = _ec_conv(p["conv_in"], cfg, z)
    x = _lstm(p["lstm"], x)
    for block, ratio in zip(p["blocks"], cfg.upsampling_ratios):
        x = jax.nn.elu(x)
        x = _ec_conv_t(block["conv_up"], cfg, x, stride=ratio)
        for j, r in enumerate(block["res"]):
            x = _resnet(r, cfg, x, j)
    x = jax.nn.elu(x)
    x = _ec_conv(p["conv_out"], cfg, x).astype(jnp.float32)
    return x[..., 0] if cfg.audio_channels == 1 else x


# ---------------------------------------------------------------------------
# Residual vector quantizer (Euclidean, unprojected)
# ---------------------------------------------------------------------------


def num_quantizers_for_bandwidth(cfg: EncodecConfig, bandwidth: float | None) -> int:
    """HF ``EncodecResidualVectorQuantizer.get_num_quantizers_for_bandwidth``."""
    if bandwidth is None or bandwidth <= 0.0:
        return cfg.num_quantizers
    bw_per_q = cfg.codebook_nbits * cfg.frame_rate
    return int(max(1, math.floor(bandwidth * 1000 / bw_per_q)))


def rvq_encode(p: Params, z: jnp.ndarray, *, n_quantizers: int) -> jnp.ndarray:
    """Continuous latents (B, T, D) -> codes (B, K, T) by residual
    nearest-neighbour in plain Euclidean distance (HF
    ``EncodecEuclideanCodebook.quantize``: argmax of -(|x|² - 2x·e + |e|²))."""
    residual = z.astype(jnp.float32)
    codes = []
    for k in range(n_quantizers):
        cb = p["quantizer"]["codebooks"][k].astype(jnp.float32)  # (N, D)
        dist = (
            2.0 * jnp.einsum("btd,nd->btn", residual, cb, precision=_precision(residual))
            - jnp.sum(jnp.square(residual), axis=-1, keepdims=True)
            - jnp.sum(jnp.square(cb), axis=-1)[None, None, :]
        )
        idx = jnp.argmax(dist, axis=-1)  # (B, T)
        codes.append(idx)
        residual = residual - jnp.take(cb, idx, axis=0)
    return jnp.stack(codes, axis=1).astype(jnp.int32)


def rvq_from_codes(p: Params, codes: jnp.ndarray) -> jnp.ndarray:
    """Codes (B, K, T) -> summed latents (B, T, D) (HF RVQ ``decode`` —
    plain embedding-sum, works for any K <= num_quantizers).  One batched
    gather over the stacked codebooks instead of K sequential lookups."""
    k = codes.shape[1]
    cbs = p["quantizer"]["codebooks"][:k][None]  # (1, K, N, D)
    zp = jnp.take_along_axis(cbs, codes[..., None].astype(jnp.int32), axis=2)
    return jnp.sum(zp.astype(jnp.float32), axis=1)  # (B, T, D)


# ---------------------------------------------------------------------------
# Public codec API
# ---------------------------------------------------------------------------


def _frame_scale(cfg: EncodecConfig, frame: jnp.ndarray) -> jnp.ndarray:
    """Per-sample loudness scale over the mono mix (HF ``_encode_frame``)."""
    x = frame if frame.ndim == 3 else frame[..., None]
    mono = jnp.mean(x.astype(jnp.float32), axis=-1)  # (B, T)
    return jnp.sqrt(jnp.mean(jnp.square(mono), axis=-1, keepdims=True)) + 1e-8  # (B, 1)


def _encode_frame(params: Params, cfg: EncodecConfig, frame: jnp.ndarray, n_q: int):
    scale = None
    if cfg.normalize:
        scale = _frame_scale(cfg, frame)
        frame = frame / (scale[..., None] if frame.ndim == 3 else scale)
    emb = encoder_forward(params["encoder"], cfg, frame)
    return rvq_encode(params, emb, n_quantizers=n_q), scale


def encode(
    params: Params,
    cfg: EncodecConfig,
    audio: jnp.ndarray,
    *,
    bandwidth: float | None = None,
    n_quantizers: int | None = None,
):
    """(B, T)[, (B, T, ch)] waveform -> (B, K, T/hop) codes.

    For the whole-input (24 kHz) configuration.  Returns ``codes`` when
    ``cfg.normalize`` is False, else ``(codes, scales)`` with scales (B, 1).
    ``n_quantizers`` overrides the bandwidth-derived codebook count (the
    composite pins it to the decoder LM's K).
    """
    if cfg.chunk_length is not None:
        raise ValueError("chunked EnCodec config: use encode_chunked / decode_chunked")
    n_q = n_quantizers or num_quantizers_for_bandwidth(
        cfg, bandwidth if bandwidth is not None else cfg.target_bandwidths[0]
    )
    codes, scale = _encode_frame(params, cfg, audio, n_q)
    return (codes, scale) if cfg.normalize else codes


def decode(
    params: Params,
    cfg: EncodecConfig,
    codes: jnp.ndarray,
    *,
    scales: jnp.ndarray | None = None,
    dtype=None,
) -> jnp.ndarray:
    """(B, K, T75) codes -> (B, T75*hop[, ch]) waveform."""
    z = rvq_from_codes(params, codes)
    audio = decoder_forward(params["decoder"], cfg, z, dtype=dtype)
    if scales is not None:
        s = scales.astype(jnp.float32)
        audio = audio * (s[..., None] if audio.ndim == 3 else s)
    return audio


def encode_chunked(
    params: Params,
    cfg: EncodecConfig,
    audio: jnp.ndarray,
    *,
    bandwidth: float | None = None,
    padding_mask: jnp.ndarray | None = None,
):
    """Chunked encode for the 48 kHz configuration (HF ``EncodecModel.encode``
    with ``chunk_length_s`` set): split into overlapping chunks, encode each.

    Returns ``(codes, scales, last_frame_pad_length)`` with codes
    (F, B, K, Tf) — the last frame zero-padded to stack — and scales
    (F, B, 1) (or None when not normalizing).
    """
    x = audio if audio.ndim == 3 else audio[..., None]
    t = x.shape[1]
    chunk, stride = cfg.chunk_length, cfg.chunk_stride
    if chunk is None:
        chunk = stride = t
    n_q = num_quantizers_for_bandwidth(
        cfg, bandwidth if bandwidth is not None else cfg.target_bandwidths[0]
    )
    if padding_mask is None:
        padding_mask = jnp.ones(x.shape[:2], bool)
    frames, scales = [], []
    for off in range(0, t, stride):
        piece = x[:, off : off + chunk] * padding_mask[:, off : off + chunk, None].astype(x.dtype)
        codes, scale = _encode_frame(params, cfg, piece, n_q)
        frames.append(codes)
        scales.append(scale)
    last_pad = frames[0].shape[-1] - frames[-1].shape[-1]
    if last_pad > 0:
        frames[-1] = jnp.pad(frames[-1], ((0, 0), (0, 0), (0, last_pad)))
    codes = jnp.stack(frames)
    return codes, (jnp.stack(scales) if cfg.normalize else None), last_pad


def _overlap_add(frames: list[jnp.ndarray], stride: int) -> jnp.ndarray:
    """Linear-fade overlap-add (HF ``_linear_overlap_add``): triangular
    weights peaking mid-chunk, normalized by the summed weight."""
    total = stride * (len(frames) - 1) + frames[-1].shape[1]
    shape = (frames[0].shape[0], total) + frames[0].shape[2:]
    flen = frames[0].shape[1]
    tvec = jnp.linspace(0.0, 1.0, flen + 2, dtype=jnp.float32)[1:-1]
    weight = 0.5 - jnp.abs(tvec - 0.5)
    out = jnp.zeros(shape, jnp.float32)
    sum_w = jnp.zeros((total,), jnp.float32)
    off = 0
    for f in frames:
        n = f.shape[1]
        w = weight[:n]
        wf = w[:, None] * f if f.ndim == 3 else w * f
        out = out.at[:, off : off + n].add(wf)
        sum_w = sum_w.at[off : off + n].add(w)
        off += stride
    return out / (sum_w[:, None] if out.ndim == 3 else sum_w)


def decode_chunked(
    params: Params,
    cfg: EncodecConfig,
    codes: jnp.ndarray,
    *,
    scales: jnp.ndarray | None = None,
    last_frame_pad_length: int = 0,
    dtype=None,
) -> jnp.ndarray:
    """(F, B, K, Tf) chunked codes -> overlap-added waveform."""
    n_frames = codes.shape[0]
    pieces = []
    for i in range(n_frames):
        frame = codes[i]
        if i == n_frames - 1 and last_frame_pad_length > 0:
            frame = frame[..., :-last_frame_pad_length]
        pieces.append(
            decode(params, cfg, frame, scales=None if scales is None else scales[i], dtype=dtype)
        )
    if n_frames == 1:
        return pieces[0]
    return _overlap_add(pieces, cfg.chunk_stride or 1)


# ---------------------------------------------------------------------------
# Init (for tests / demos; real use imports HF EncodecModel weights)
# ---------------------------------------------------------------------------


def init(key, cfg: EncodecConfig) -> Params:
    k_iter = iter(jax.random.split(key, 512))
    gn = cfg.norm_type == "time_group_norm"

    def conv(cin, cout, width):
        p = {
            "kernel": 0.02 * jax.random.truncated_normal(next(k_iter), -2, 2, (width, cin, cout), jnp.float32),
            "bias": jnp.zeros((cout,)),
        }
        if gn:
            p["norm"] = {"scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,))}
        return p

    def res(dim):
        hidden = dim // cfg.compress
        p = {
            "conv1": conv(dim, hidden, cfg.residual_kernel_size),
            "conv2": conv(hidden, dim, 1),
        }
        if cfg.use_conv_shortcut:
            p["shortcut"] = conv(dim, dim, 1)
        return p

    def lstm(dim):
        return [
            {
                "wi": 0.02 * jax.random.normal(next(k_iter), (dim, 4 * dim), jnp.float32),
                "wh": 0.02 * jax.random.normal(next(k_iter), (dim, 4 * dim), jnp.float32),
                "bias": jnp.zeros((4 * dim,)),
            }
            for _ in range(cfg.num_lstm_layers)
        ]

    scaling = 1
    enc_blocks = []
    for ratio in reversed(cfg.upsampling_ratios):
        dim = scaling * cfg.num_filters
        enc_blocks.append(
            {
                "res": [res(dim) for _ in range(cfg.num_residual_layers)],
                "conv_down": conv(dim, dim * 2, ratio * 2),
            }
        )
        scaling *= 2
    encoder = {
        "conv_in": conv(cfg.audio_channels, cfg.num_filters, cfg.kernel_size),
        "blocks": enc_blocks,
        "lstm": lstm(scaling * cfg.num_filters),
        "conv_out": conv(scaling * cfg.num_filters, cfg.hidden_size, cfg.last_kernel_size),
    }

    dec_blocks = []
    for ratio in cfg.upsampling_ratios:
        dim = scaling * cfg.num_filters
        dec_blocks.append(
            {
                "conv_up": conv(dim, dim // 2, ratio * 2),
                "res": [res(dim // 2) for _ in range(cfg.num_residual_layers)],
            }
        )
        scaling //= 2
    decoder = {
        "conv_in": conv(cfg.hidden_size, (2 ** len(cfg.upsampling_ratios)) * cfg.num_filters, cfg.kernel_size),
        "lstm": lstm((2 ** len(cfg.upsampling_ratios)) * cfg.num_filters),
        "blocks": dec_blocks,
        "conv_out": conv(cfg.num_filters, cfg.audio_channels, cfg.last_kernel_size),
    }

    quantizer = {
        "codebooks": jax.random.normal(
            next(k_iter), (cfg.num_quantizers, cfg.codebook_size, cfg.codebook_dim), jnp.float32
        )
    }
    return {"encoder": encoder, "decoder": decoder, "quantizer": quantizer}
