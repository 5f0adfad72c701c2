"""High-level inference pipeline: text in, waveform out.

The user-facing convenience layer matching the reference README usage
(``/root/reference/README.md:40-56``): load a model artifact + tokenizers,
then ``tts(description, prompt) -> (sr, waveform)``.  Jit-cached per
(batch, desc_len, prompt_len, max_len) bucket so repeated calls with similar
shapes reuse compilations.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from parler_tts_tpu.core import checkpoint as ck
from parler_tts_tpu.core.config import GenerationConfig, ParlerTTSConfig
from parler_tts_tpu.generation import generate as G


def _bucket(n: int, sizes=(16, 32, 64, 128, 256)) -> int:
    for s in sizes:
        if n <= s:
            return s
    # beyond the largest fixed bucket, round up to 64 (rare giant inputs
    # get their own compilation instead of a negative-pad crash)
    return ((n + 63) // 64) * 64


@dataclasses.dataclass
class ParlerTTSPipeline:
    params: Any
    cfg: ParlerTTSConfig
    gen: GenerationConfig
    description_tokenizer: Any = None
    prompt_tokenizer: Any = None
    dtype: Any = jnp.bfloat16
    # device-side 16-bit PCM conversion: waveforms come back as int16
    # (exactly what a WAV body holds) instead of float32, halving the
    # device->host transfer.  Serving measurement (batch 128 x 3 s through
    # the axon tunnel): the f32 readback was ~1.4 s of a 5.3 s batch.
    # Opt-in because float callers (quality gates, tests) expect [-1, 1].
    pcm16: bool = False

    @classmethod
    def from_pretrained(cls, model_dir: str, *, tokenizer_name: str | None = None,
                        dtype=jnp.bfloat16, pcm16: bool = False):
        """Load a model artifact dir.  ``tokenizer_name=None`` auto-loads the
        tokenizer saved INSIDE the artifact (``save_model(tokenizer=...)``
        writes it there, matching the reference's self-contained
        ``save_pretrained`` dirs, ``run_parler_tts_training.py:1436-1453``)."""
        import os

        from parler_tts_tpu.ops.nn import astype_tree
        from parler_tts_tpu.utils.compilation_cache import enable_persistent_cache

        enable_persistent_cache()
        params, cfg, gen = ck.load_model(model_dir)
        if dtype != jnp.float32:
            # inference holds ONLY compute-dtype weights on device — fp32
            # masters doubled the decode HBM envelope (and weight-stream
            # traffic) in round 1
            params = astype_tree(params, dtype)
        if tokenizer_name is None and any(
            os.path.exists(os.path.join(model_dir, f))
            for f in ("tokenizer.json", "tokenizer_config.json", "spiece.model")
        ):
            tokenizer_name = model_dir
        tok = None
        if tokenizer_name is not None:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(tokenizer_name)
        return cls(params, cfg, gen, tok, tok, dtype=dtype, pcm16=pcm16)

    def __post_init__(self):
        self._jitted: dict = {}

    def _run(self, desc_ids, desc_mask, prompt_ids, prompt_mask, max_length: int, key):
        sig = (desc_ids.shape, prompt_ids.shape, max_length)
        if sig not in self._jitted:
            cfg, gen_base, dtype, pcm16 = self.cfg, self.gen, self.dtype, self.pcm16

            @jax.jit
            def fn(params, desc_ids, desc_mask, prompt_ids, prompt_mask, key):
                gen = dataclasses.replace(gen_base, max_length=max_length)
                out = G.generate(
                    params, cfg, gen,
                    input_ids=desc_ids, attention_mask=desc_mask,
                    prompt_input_ids=prompt_ids, prompt_attention_mask=prompt_mask,
                    key=key, dtype=dtype,
                )
                audio = out.audio
                if pcm16:
                    # same rounding as utils.audio_io.write_wav (truncating
                    # cast), so pcm16 WAV bytes are identical either way
                    audio = (jnp.clip(audio.astype(jnp.float32), -1.0, 1.0)
                             * 32767.0).astype(jnp.int16)
                return audio, out.audio_lengths

            self._jitted[sig] = fn
        return self._jitted[sig](self.params, desc_ids, desc_mask, prompt_ids, prompt_mask, key)

    def tts(
        self,
        description: str | list[str],
        prompt: str | list[str],
        *,
        seed: int = 0,
        max_seconds: float | None = None,
    ) -> tuple[int, list[np.ndarray]]:
        """-> (sampling_rate, [waveform per sample])."""
        if self.description_tokenizer is None:
            raise RuntimeError("pipeline needs tokenizers; pass tokenizer_name to from_pretrained")
        descs = [description] if isinstance(description, str) else list(description)
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        assert len(descs) == len(prompts)

        d = self.description_tokenizer(descs, padding=True, return_tensors="np")
        p = self.prompt_tokenizer(prompts, padding=True, return_tensors="np")
        dl = _bucket(d.input_ids.shape[1])
        pl = _bucket(p.input_ids.shape[1])

        def pad_to(x, n, v=0):
            return np.pad(x, ((0, 0), (0, n - x.shape[1])), constant_values=v)

        desc_ids, desc_mask = pad_to(d.input_ids, dl), pad_to(d.attention_mask, dl)
        # prompts pad LEFT (reference tokenizer padding side :910-917)
        pp = p.input_ids.shape[1]
        prompt_ids = np.pad(p.input_ids, ((0, 0), (pl - pp, 0)))
        prompt_mask = np.pad(p.attention_mask, ((0, 0), (pl - pp, 0)))

        max_len = self.gen.max_length
        if max_seconds is not None:
            max_len = int(max_seconds * self.cfg.frame_rate) + self.cfg.decoder.num_codebooks

        audio, lengths = self._run(
            desc_ids, desc_mask, prompt_ids, prompt_mask, max_len, jax.random.PRNGKey(seed)
        )
        audio = np.asarray(audio)
        lengths = np.asarray(lengths)
        return self.cfg.sampling_rate, [audio[i, : lengths[i]] for i in range(audio.shape[0])]
