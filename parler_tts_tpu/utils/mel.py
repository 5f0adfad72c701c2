"""Log-mel spectrogram utility for the BASELINE quality gate.

BASELINE.md's gate is "output mels/waveform allclose to the PyTorch
reference" (``/root/repo/BASELINE.md:29``); this module provides the mel
representation both stacks are compared in.  Pure numpy (runs identically on
any host, no torch/librosa dependency): Hann-windowed reflect-centered STFT +
a Slaney-normalized HTK-breakpoint mel filterbank (librosa's defaults, so the
numbers are comparable to the ecosystem's), log10-compressed with a -80 dB
floor relative to peak.

Used by ``helpers/quality_gate.py`` and ``tests/test_quality_gate.py``.
"""

from __future__ import annotations

import numpy as np


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    f = np.asarray(f, np.float64)
    mel = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    logstep = np.log(6.4) / 27.0
    return np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / logstep, mel)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float64)
    f = m * (200.0 / 3.0)
    logstep = np.log(6.4) / 27.0
    return np.where(m >= 15.0, 1000.0 * np.exp(logstep * (m - 15.0)), f)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) triangular filterbank, Slaney area-normalized."""
    fmax = fmax if fmax is not None else sr / 2.0
    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fb = np.zeros((n_mels, len(fft_freqs)))
    for i in range(n_mels):
        lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)  # Slaney normalization
    return fb


def stft_power(wave: np.ndarray, n_fft: int = 1024, hop: int = 256) -> np.ndarray:
    """Power spectrogram |STFT|^2 of a mono waveform (T,) -> (frames, bins);
    Hann window, reflect-padded center framing."""
    wave = np.asarray(wave, np.float64)
    pad = n_fft // 2
    if len(wave) == 0:
        wave = np.zeros(1)
    x = np.pad(wave, pad, mode="reflect" if len(wave) > pad else "constant")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(max(n_frames, 0))[:, None]
    frames = x[idx] * np.hanning(n_fft + 1)[:-1]
    spec = np.fft.rfft(frames, axis=-1)
    return (spec.real**2 + spec.imag**2)


def log_mel_spectrogram(wave: np.ndarray, sr: int, *, n_fft: int = 1024,
                        hop: int = 256, n_mels: int = 80) -> np.ndarray:
    """Mono waveform -> (frames, n_mels) log10 mel spectrogram, floored at
    -80 dB below the utterance peak (so silence compares as silence instead
    of as log(eps) noise)."""
    power = stft_power(wave, n_fft=n_fft, hop=hop)
    mel = power @ mel_filterbank(sr, n_fft, n_mels).T
    log_mel = 10.0 * np.log10(np.maximum(mel, 1e-10))
    return np.maximum(log_mel, log_mel.max() - 80.0) if log_mel.size else log_mel


def mel_distance(a: np.ndarray, b: np.ndarray, sr: int, **kw) -> dict:
    """Compare two waveforms in mel space; returns max/mean absolute log-mel
    difference (dB) + max absolute waveform deviation."""
    n = min(len(a), len(b))
    ma = log_mel_spectrogram(np.asarray(a)[:n], sr, **kw)
    mb = log_mel_spectrogram(np.asarray(b)[:n], sr, **kw)
    d = np.abs(ma - mb)
    return {
        "mel_max_abs_db": float(d.max()) if d.size else 0.0,
        "mel_mean_abs_db": float(d.mean()) if d.size else 0.0,
        "wave_max_abs": float(np.abs(np.asarray(a)[:n] - np.asarray(b)[:n]).max()) if n else 0.0,
        "length_mismatch": int(abs(len(a) - len(b))),
    }
