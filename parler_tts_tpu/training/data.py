"""Data pipeline: dataset merging, tokenization, offline audio tokenization,
delay-pattern label construction, filtering, static-shape collation.

TPU-native re-design of the reference's data stages
(``/root/reference/training/run_parler_tts_training.py:590-780, 1081-1268``;
SURVEY.md §2.10):

* `+`-separated multi-dataset specs with optional metadata side-datasets
  column-merged by id (reference ``:590-645, 693-758``);
* offline audio tokenization runs the **JAX DAC encoder** in batches,
  per-host sharded by ``jax.process_index`` (replacing the reference's
  Accelerate-dispatched torch codec pass ``:1106-1161``);
* labels are built with the static-shape delay-pattern builder
  (``models/delay_pattern.build_delay_pattern_labels``) instead of the
  reference's per-sample torch loop (``:1179-1213``);
* the collator pads prompts **on the left** (reference tokenizer padding
  side ``:910-917``), labels with ``-100`` (reference ``:551-555``), and can
  pad everything to fixed maxima for single-compilation training
  (the reference only does this under torch.compile, ``:1259-1268``; on TPU
  static shapes are the default).
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any, Iterator, Sequence

import numpy as np

from parler_tts_tpu.core.config import DACConfig
from parler_tts_tpu.models.delay_pattern import build_delay_pattern_labels


@dataclass
class DatasetSpec:
    """One entry of a `+`-separated multi-dataset string
    (reference ``convert_dataset_str_to_list``, ``:590-645``)."""

    name: str
    config: str | None = None
    split: str = "train"
    metadata_name: str | None = None
    samples: int | None = None


def parse_dataset_spec(
    names: str,
    configs: str | None = None,
    splits: str | None = None,
    metadata_names: str | None = None,
    samples_counts: str | None = None,
) -> list[DatasetSpec]:
    """Split `+`-separated fields and zip them, validating equal lengths
    (reference ``:590-645`` semantics, including single-value broadcast)."""

    def split_plus(s: str | None) -> list[str | None]:
        if not s:
            return []
        return [x if x else None for x in s.split("+")]

    name_list = split_plus(names)
    n = len(name_list)

    def norm(s, default=None):
        vals = split_plus(s)
        if not vals:
            return [default] * n
        if len(vals) == 1:
            return vals * n
        if len(vals) != n:
            raise ValueError(f"spec length mismatch: {s!r} vs {names!r}")
        return vals

    return [
        DatasetSpec(
            name=nm,
            config=cf,
            split=sp or "train",
            metadata_name=md,
            samples=int(sc) if sc else None,
        )
        for nm, cf, sp, md, sc in zip(
            name_list, norm(configs), norm(splits, "train"), norm(metadata_names), norm(samples_counts)
        )
    ]


def load_multiple_datasets(
    specs: Sequence[DatasetSpec],
    *,
    sampling_rate: int | None = None,
    columns: Sequence[str] = (),
    id_column: str = "id",
    streaming: bool = False,
    stopping_strategy: str = "first_exhausted",
    seed: int | None = None,
):
    """Load + merge datasets with metadata side-datasets (reference
    ``load_multiple_datasets`` ``:648-780``): per-spec load, audio cast to the
    codec sampling rate, metadata column-concat with id-equality verification,
    then merge.  Local paths use ``load_from_disk``.

    Merge semantics follow the reference exactly (``:759-780``): in
    ``streaming`` mode the datasets are **probability-weighted interleaved**
    (weights from each spec's ``samples`` count, the reference's
    ``train_dataset_samples``) with the given ``stopping_strategy``; in
    map-style mode they are concatenated.
    """
    import datasets as hfds

    probs = None
    if any(s.samples for s in specs):
        counts = np.asarray([float(s.samples or 1) for s in specs])
        probs = counts / counts.sum()

    parts = []
    for spec in specs:
        try:
            if _is_local(spec.name):
                ds = hfds.load_from_disk(spec.name)
                if streaming and hasattr(ds, "to_iterable_dataset"):
                    # honest streaming for local corpora: rows flow through
                    # an IterableDataset (bounded memory) instead of the
                    # memory-mapped map-style view, matching hub behavior
                    ds = ds.to_iterable_dataset()
            else:
                ds = hfds.load_dataset(spec.name, spec.config, split=spec.split, streaming=streaming)
            if isinstance(ds, (hfds.DatasetDict, hfds.IterableDatasetDict)):
                ds = ds[spec.split]
        except Exception as e:  # pragma: no cover
            raise RuntimeError(f"failed to load dataset {spec.name!r}: {e}") from e
        if sampling_rate is not None and "audio" in (ds.column_names or ()):
            ds = ds.cast_column("audio", hfds.Audio(sampling_rate=sampling_rate))
        if spec.metadata_name:
            if _is_local(spec.metadata_name):
                md = hfds.load_from_disk(spec.metadata_name)
                if streaming and hasattr(md, "to_iterable_dataset"):
                    # must match the main dataset's flavor: axis-1
                    # concatenate_datasets refuses to mix an IterableDataset
                    # with a map-style Dataset
                    md = md.to_iterable_dataset()
            else:
                md = hfds.load_dataset(spec.metadata_name, spec.config, split=spec.split, streaming=streaming)
            if isinstance(md, (hfds.DatasetDict, hfds.IterableDatasetDict)):
                md = md[spec.split]
            if streaming or not hasattr(ds, "__len__"):
                # reference merges streaming metadata by column concat (:725-744)
                md = md.remove_columns([c for c in (md.column_names or ()) if c in (ds.column_names or ())])
                ds = hfds.concatenate_datasets([ds, md], axis=1)
            else:
                # verify row alignment by id equality over ALL rows (:745-757)
                if id_column in ds.column_names and id_column in md.column_names:
                    if list(ds[id_column]) != list(md[id_column]):
                        raise ValueError(f"metadata id mismatch for {spec.name}")
                    md = md.remove_columns([id_column])
                new_cols = [c for c in md.column_names if c not in ds.column_names]
                for c in new_cols:
                    ds = ds.add_column(c, md[c])
        if spec.samples and not streaming and hasattr(ds, "__len__"):
            ds = ds.select(range(min(int(spec.samples), len(ds))))
        parts.append(ds)

    if len(parts) == 1:
        return parts[0]
    if streaming:
        return hfds.interleave_datasets(
            parts, probabilities=probs, stopping_strategy=stopping_strategy, seed=seed
        )
    return hfds.concatenate_datasets(parts)


def _is_local(name: str) -> bool:
    import os

    return os.path.exists(name)


# ---------------------------------------------------------------------------
# Offline audio tokenization (frozen DAC encoder, JAX)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _codec_encode_fn(dac_cfg):
    """One memoized jitted encoder per codec config.  A fresh ``jax.jit``
    per call would compile (and RETAIN) a new executable for every flushed
    batch — measured 528 MB held after a 1000-row preparation and a
    compile per ``audio_encoder_batch_size`` rows; params flow in as an
    argument so the jit cache keys on shapes, not on a captured pytree."""
    import jax

    from parler_tts_tpu.models import codec as codec_mod

    return jax.jit(lambda params, a: codec_mod.encode(params, dac_cfg, a))


def tokenize_audio_batches(
    dac_params: Any,
    dac_cfg: DACConfig,
    audio_arrays: Sequence[np.ndarray],
    *,
    batch_size: int = 8,
    pad_to_seconds: float | None = None,
) -> list[np.ndarray]:
    """Encode raw waveforms to codec codes with the frozen JAX DAC encoder —
    the reference's distributed codec pass (``:1106-1161``) minus torch.

    Waveforms are bucketed to the batch max (or a fixed ``pad_to_seconds``)
    so XLA compiles a handful of shapes; each sample's code length is
    ``ceil(len/hop)`` like the reference's ``ratio`` bookkeeping (``:1134``).
    Returns per-sample ``(K, T_codes)`` int16 arrays (reference stores int16,
    ``:1155``).
    """
    encode = _codec_encode_fn(dac_cfg)
    hop = dac_cfg.hop_length
    out: list[np.ndarray] = []
    for i in range(0, len(audio_arrays), batch_size):
        chunk = [np.asarray(a, np.float32) for a in audio_arrays[i : i + batch_size]]
        lens = [len(a) for a in chunk]
        if pad_to_seconds is not None:
            pad_len = int(pad_to_seconds * dac_cfg.sampling_rate)
        else:
            pad_len = max(lens)
        pad_len = ((pad_len + hop - 1) // hop) * hop
        batch = np.zeros((len(chunk), pad_len), np.float32)
        for j, a in enumerate(chunk):
            batch[j, : len(a)] = a[:pad_len]
        codes = np.asarray(encode(dac_params, batch))  # (B, K, pad_len/hop)
        for j, ln in enumerate(lens):
            t = min((ln + hop - 1) // hop, codes.shape[-1])
            out.append(codes[j, :, :t].astype(np.int16))
    return out


class CodesCache:
    """Incremental on-disk cache of codec codes keyed by **global raw row
    index** (the reference caches the encoded dataset under
    ``temporary_save_to_disk``, ``:1167-1177``).

    Chunked ``.npz`` parts are appended as encoding progresses, so a crashed
    or re-run preparation only encodes rows missing from the cache, and no
    full-corpus array is ever rebuilt in one piece.  Each host writes its own
    part files (``h{i}of{n}_part*.npz`` — no cross-host write races); codes
    are int16 like the reference (``:1155``).  All parts present on disk are
    readable by any host, so a cache produced at one process count is reused
    at another."""

    def __init__(self, root: str, *, split: str, process_index: int = 0, process_count: int = 1):
        import os

        self.dir = os.path.join(root, f"{split}_codes")
        os.makedirs(self.dir, exist_ok=True)
        self.prefix = f"h{process_index}of{process_count}"
        self._known: dict[int, np.ndarray] = {}
        self._part = 0
        for f in sorted(os.listdir(self.dir)):
            if not f.endswith(".npz"):
                continue
            if f.startswith(self.prefix + "_part"):
                self._part += 1
            with np.load(os.path.join(self.dir, f)) as z:
                for k in z.files:
                    self._known[int(k[1:])] = z[k]
        self._new: dict[int, np.ndarray] = {}

    def get(self, idx: int) -> np.ndarray | None:
        return self._known.get(idx)

    def put(self, idx: int, codes: np.ndarray) -> None:
        self._new[idx] = codes.astype(np.int16)

    def flush(self) -> None:
        import os

        if not self._new:
            return
        path = os.path.join(self.dir, f"{self.prefix}_part{self._part:06d}.npz")
        np.savez(path, **{f"i{k}": v for k, v in self._new.items()})
        self._known.update(self._new)
        self._new = {}
        self._part += 1


def build_labels(
    codes_list: Sequence[np.ndarray],
    *,
    bos_token_id: int,
    eos_token_id: int,
    max_length: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-sample codes -> batched (B, K, max_length) delay-pattern labels +
    true lengths (reference label build ``:1164-1213``)."""
    k = codes_list[0].shape[0]
    t_max = max(c.shape[1] for c in codes_list)
    codes = np.zeros((len(codes_list), k, t_max), np.int32)
    lengths = np.zeros((len(codes_list),), np.int32)
    for i, c in enumerate(codes_list):
        codes[i, :, : c.shape[1]] = c
        lengths[i] = c.shape[1]
    labels = build_delay_pattern_labels(
        codes, lengths, bos_token_id=bos_token_id, eos_token_id=eos_token_id, max_length=max_length
    )
    return np.asarray(labels), lengths


# ---------------------------------------------------------------------------
# Collator
# ---------------------------------------------------------------------------


@dataclass
class Collator:
    """Static-shape batch collator (reference
    ``DataCollatorParlerTTSWithPadding`` ``:515-587``): left-padded prompts,
    right-padded descriptions, labels already in the delay pattern with
    ``-100`` past each sample's EOS."""

    description_pad_id: int
    prompt_pad_id: int
    max_description_len: int
    max_prompt_len: int
    label_len: int

    def __call__(self, samples: Sequence[dict]) -> dict[str, np.ndarray]:
        b = len(samples)
        k = samples[0]["labels"].shape[0]
        batch = {
            "input_ids": np.full((b, self.max_description_len), self.description_pad_id, np.int32),
            "attention_mask": np.zeros((b, self.max_description_len), np.int32),
            "prompt_input_ids": np.full((b, self.max_prompt_len), self.prompt_pad_id, np.int32),
            "prompt_attention_mask": np.zeros((b, self.max_prompt_len), np.int32),
            "labels": np.full((b, k, self.label_len), -100, np.int32),
        }
        for i, s in enumerate(samples):
            d = np.asarray(s["input_ids"], np.int32)[: self.max_description_len]
            batch["input_ids"][i, : len(d)] = d
            batch["attention_mask"][i, : len(d)] = 1
            p = np.asarray(s["prompt_input_ids"], np.int32)[: self.max_prompt_len]
            batch["prompt_input_ids"][i, self.max_prompt_len - len(p):] = p  # left pad (:574-585)
            batch["prompt_attention_mask"][i, self.max_prompt_len - len(p):] = 1
            lab = np.asarray(s["labels"], np.int32)[:, : self.label_len]
            batch["labels"][i, :, : lab.shape[1]] = lab
        return batch


def batches(dataset: Sequence[dict], collator: Collator, batch_size: int, *,
            seed: int = 0, shuffle: bool = True, drop_last: bool = True,
            group_by_length: bool = False,
            row_slice: tuple[int, int] | None = None) -> Iterator[dict]:
    """Epoch iterator with per-epoch shuffle (reference ``:1559``).

    ``group_by_length`` emulates the reference's ``LengthGroupedSampler``
    (``:1561-1562``): shuffle, then sort within mega-chunks of 50 batches by
    label length so batches are length-homogeneous (less padding waste)
    while retaining epoch-level randomness.

    ``row_slice=(lo, hi)``: multi-host mode — every host iterates the SAME
    global permutation and global batches of ``batch_size``, but collates
    only rows ``[lo, hi)`` of each batch (its share of the global batch, like
    the reference's ``DistributedSampler`` slicing of a shared permutation).
    The global batch assembled by ``host_local_to_global`` is then
    bit-identical to the single-process batch.
    """
    idx = np.arange(len(dataset))
    rng = np.random.default_rng(seed)
    if shuffle:
        rng.shuffle(idx)
    if group_by_length:
        lengths = np.asarray([int(np.sum(np.asarray(dataset[int(j)]["labels"])[0] != -100)) for j in idx])
        mega = batch_size * 50
        chunks = []
        for i in range(0, len(idx), mega):
            sl = idx[i : i + mega]
            chunks.append(sl[np.argsort(lengths[i : i + mega], kind="stable")[::-1]])
        idx = np.concatenate(chunks) if chunks else idx
    end = len(idx) - (len(idx) % batch_size) if drop_last else len(idx)
    starts = list(range(0, end, batch_size))
    if group_by_length and shuffle:
        rng.shuffle(starts)  # batches stay homogeneous, order re-randomized
    for i in starts:
        take = idx[i : i + batch_size]
        if row_slice is not None:
            take = take[row_slice[0] : row_slice[1]]
        yield collator([dataset[int(j)] for j in take])
