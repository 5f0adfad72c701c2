"""Quality-metric hooks: WER (ASR) and CLAP text-audio similarity.

Equivalent of the reference's eval metrics
(``/root/reference/training/run_parler_tts_training.py:1285-1331``): WER via
an ASR pipeline (``distil-whisper/distil-large-v2``) + CLAP cosine similarity
(``laion/larger_clap_music_and_speech``).  Both depend on torch model
downloads; in a zero-egress image the hooks gate on local checkpoint paths
and report availability honestly instead of crashing the training loop.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np


class WerMetric:
    """Word-error-rate of ASR transcriptions vs prompts (reference
    ``:1307-1318``).  Requires a local ASR checkpoint + torch.

    Deployment posture: the reference runs the ASR on the training GPU
    (``run_parler_tts_training.py:253-260`` + device placement via
    Accelerate); a TPU host has no CUDA device, so the default is host CPU
    with BATCHED pipeline calls (``batch_size``) — the encoder forward over
    a batch of padded 30 s mel windows amortizes torch's per-call overhead.
    Pass ``device`` through for deployments with a sidecar GPU."""

    def __init__(self, asr_model_name_or_path: str, *, device: str = "cpu",
                 batch_size: int = 8):
        self.available = False
        self.batch_size = batch_size
        try:
            from transformers import pipeline

            self.pipe = pipeline("automatic-speech-recognition", model=asr_model_name_or_path, device=device)
            self.available = True
        except Exception as e:  # pragma: no cover - depends on local files
            self.error = str(e)

    def __call__(self, prompts: Sequence[str], audio: Sequence[np.ndarray], sampling_rate: int) -> dict:
        if not self.available:
            return {"wer": float("nan"), "wer_available": 0.0}
        outs = self.pipe(
            [{"array": np.asarray(a, np.float32), "sampling_rate": sampling_rate}
             for a in audio],
            batch_size=self.batch_size,
        )
        hyps = [o["text"] for o in outs]
        return {"wer": word_error_rate(prompts, hyps), "wer_available": 1.0}


class ClapMetric:
    """CLAP text-audio cosine similarity (reference ``:1292-1305``)."""

    def __init__(self, clap_model_name_or_path: str):
        self.available = False
        try:
            import torch  # noqa: F401
            from transformers import AutoProcessor, ClapModel

            self.model = ClapModel.from_pretrained(clap_model_name_or_path).eval()
            self.processor = AutoProcessor.from_pretrained(clap_model_name_or_path)
            self.available = True
        except Exception as e:  # pragma: no cover
            self.error = str(e)

    def __call__(self, descriptions: Sequence[str], audio: Sequence[np.ndarray], sampling_rate: int) -> dict:
        if not self.available:
            return {"clap": float("nan"), "clap_available": 0.0}
        import torch

        # CLAP's feature extractor is trained at a fixed rate (48 kHz for
        # laion/larger_clap_*) and REJECTS other rates — generated Parler
        # audio is 44.1 kHz, so resample first (the reference feeds 44.1 kHz
        # through the same processor, run_parler_tts_training.py:1292-1305)
        clap_sr = getattr(getattr(self.processor, "feature_extractor", None),
                          "sampling_rate", sampling_rate)
        clips = [np.asarray(a, np.float32) for a in audio]
        if clap_sr != sampling_rate:
            from parler_tts_tpu.utils.audio_io import resample_linear

            clips = [resample_linear(c[None], sampling_rate, clap_sr)[0] for c in clips]
        inputs = self.processor(
            text=list(descriptions),
            audios=clips,
            sampling_rate=clap_sr,
            return_tensors="pt",
            padding=True,
        )
        with torch.no_grad():
            out = self.model(**inputs)
        sim = torch.nn.functional.cosine_similarity(out.audio_embeds, out.text_embeds).mean()
        return {"clap": float(sim), "clap_available": 1.0}


def word_error_rate(refs: Sequence[str], hyps: Sequence[str]) -> float:
    """Corpus-level WER (Levenshtein over words) — replaces the ``jiwer``
    dependency (``evaluate.load("wer")`` in the reference ``:1290``)."""
    total_err, total_words = 0, 0
    for ref, hyp in zip(refs, hyps):
        r, h = _norm(ref), _norm(hyp)
        total_err += _edit_distance(r, h)
        total_words += len(r)
    return total_err / max(total_words, 1)


def _norm(s: str) -> list[str]:
    return "".join(c.lower() if c.isalnum() or c.isspace() else " " for c in s).split()


def _edit_distance(a: list[str], b: list[str]) -> int:
    dp = list(range(len(b) + 1))
    for i, wa in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, wb in enumerate(b, 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1, prev + (wa != wb))
            prev, dp[j] = dp[j], cur
    return dp[len(b)]
