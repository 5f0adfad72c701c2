"""Dynamic micro-batching for TTS serving.

The reference's only serving surface is a batch-1 gradio callback
(``/root/reference/helpers/gradio_demo/app.py:39-49``) — every request pays a
full solo decode.  On TPU the decode step cost is nearly flat in batch (the
per-step glue amortizes: 84→91→94 audio-s/s at batch 64/128/256,
PERFORMANCE.md), so concurrent requests should ride ONE decode loop.  This is
the standard XLA-friendly alternative to GPU-style continuous batching:
requests are coalesced into static-shape batch buckets (each bucket is one
cached compilation, reused forever) rather than spliced into a running loop
with dynamic shapes.

``BatchingEngine`` wraps a :class:`~parler_tts_tpu.pipeline.ParlerTTSPipeline`
with a request queue + single worker thread (one process owns the chip; all
device work stays on one thread):

* ``submit()`` returns a ``concurrent.futures.Future`` immediately;
  ``tts()`` is the blocking convenience.
* The worker takes the oldest request, then drains compatible requests for up
  to ``max_wait_ms`` (batching window) or until ``max_batch``.
* Compatible = same generation-length bucket: a 3 s request never pays a
  30 s decode; per-sample EOS trimming inside ``generate`` handles intra-
  bucket length variance (finished streams emit PAD and are trimmed by
  ``audio_lengths``).
* The batch is padded UP to a batch-size bucket by repeating the first
  request's inputs (one compilation per bucket; extra rows are dropped), and
  descriptions/prompts are length-bucketed by the pipeline itself.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future

import numpy as np


@dataclasses.dataclass
class _Request:
    description: str
    prompt: str
    max_seconds: float | None
    seed: int
    future: Future
    # warmup-only: pad the batch up to at least this bucket so the request
    # compiles a *chosen* (batch, length) program rather than the smallest
    # bucket that fits the group
    force_bucket: int | None = None


def _batch_bucket(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class BatchingEngine:
    """Coalesces concurrent TTS requests into batched generate calls.

    Args:
      pipeline: a ``ParlerTTSPipeline`` (owns params/config/tokenizers).
      max_batch: hard cap on requests per device call.
      max_wait_ms: batching window after the first request is picked up.
      batch_buckets: allowed device batch sizes (each is one compilation).
      length_bucket_seconds: requested durations round up to one of these, and
        only same-bucket requests batch together.
    """

    def __init__(
        self,
        pipeline,
        *,
        max_batch: int = 64,
        max_wait_ms: float = 30.0,
        batch_buckets: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64),
        length_bucket_seconds: tuple[float, ...] = (5.0, 10.0, 30.0),
        fill_wait_ms: float = 150.0,
        fill_threshold: float = 0.6,
    ):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.length_bucket_seconds = tuple(sorted(length_bucket_seconds))
        # deferred fill (round-4 VERDICT #2, pad-waste): when the drained
        # group would pad to under ``fill_threshold`` of its batch bucket,
        # wait up to ``fill_wait_ms`` extra for stragglers — trades a bounded
        # latency add for fewer wasted pad rows in the dead zone just above a
        # bucket boundary.  0 disables.
        self.fill_wait_ms = fill_wait_ms
        self.fill_threshold = fill_threshold
        self._queue: queue.Queue[_Request | None] = queue.Queue()
        self._pending: list[_Request] = []  # drained-but-deferred (other buckets)
        self._stats = {"requests": 0, "batches": 0, "batched_requests": 0,
                       "bucket_rows": 0, "padded_rows": 0}
        self._lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, name="tts-batcher", daemon=True)
        self._shutdown = False
        self._worker.start()

    # -- public API ---------------------------------------------------------

    def submit(self, description: str, prompt: str, *, max_seconds: float | None = None,
               seed: int = 0) -> Future:
        """Enqueue one request; resolves to (sampling_rate, waveform)."""
        if self._shutdown:
            raise RuntimeError("engine is shut down")
        fut: Future = Future()
        self._queue.put(_Request(description, prompt, max_seconds, seed, fut))
        with self._lock:
            self._stats["requests"] += 1
        return fut

    def tts(self, description: str, prompt: str, *, max_seconds: float | None = None,
            seed: int = 0, timeout: float | None = None):
        return self.submit(description, prompt, max_seconds=max_seconds, seed=seed).result(timeout)

    def stats(self) -> dict:
        with self._lock:
            return dict(self._stats)

    def warmup(
        self,
        *,
        description: str = "A calm, clear female voice with no background noise.",
        prompt: str = "Warming up the server.",
        batch_buckets: tuple[int, ...] | None = None,
        length_bucket_seconds: tuple[float, ...] | None = None,
        timeout: float | None = None,
    ) -> dict:
        """Pre-compile (batch × length) bucket programs before traffic.

        The measured cold first request costs 142 s on the Mini geometry
        (benchmarks/serving_bench.json) because the first bucket compiles
        under the caller's latency; warming every bucket up front moves that
        cost to server startup.  With the persistent XLA disk cache (enabled
        by ``ParlerTTSPipeline.from_pretrained``) a *restarted* server pays
        only executable-load per bucket, not recompilation.

        Runs through the normal worker-thread path (one thread owns the
        chip), one synthetic request per bucket with ``force_bucket`` set so
        each warmup batch is padded to exactly the target batch bucket.
        Returns ``{"BxS": wall_seconds}`` per warmed bucket.  Real requests
        arriving mid-warmup simply coalesce into the warmup batches.

        Note: the pipeline also buckets *tokenized text length* (16/32/64/…,
        ``pipeline._bucket``) into the program key — warmup covers the
        length buckets of the ``description``/``prompt`` passed here, so use
        texts representative of production traffic (the defaults land in the
        32/16-token buckets typical of real descriptions/prompts).
        """
        if self._shutdown:  # mirror submit(): enqueueing behind the None
            # sentinel would hang fut.result() forever (ADVICE r4)
            raise RuntimeError("engine is shut down")
        warm_buckets = batch_buckets or self.batch_buckets
        for b in warm_buckets:
            # a bucket outside the engine's set would compile a program real
            # traffic can never coalesce into (ADVICE r4)
            if b not in self.batch_buckets or b > self.max_batch:
                raise ValueError(
                    f"warmup bucket {b} not servable: batch_buckets="
                    f"{self.batch_buckets} max_batch={self.max_batch}"
                )
        timings: dict[str, float] = {}
        for sec in length_bucket_seconds or self.length_bucket_seconds:
            for b in warm_buckets:
                fut: Future = Future()
                t0 = time.monotonic()
                self._queue.put(_Request(description, prompt, sec, 0, fut, force_bucket=b))
                fut.result(timeout)
                timings[f"{b}x{sec:g}"] = round(time.monotonic() - t0, 3)
        return timings

    def shutdown(self, wait: bool = True) -> None:
        self._shutdown = True
        self._queue.put(None)
        if wait:
            self._worker.join(timeout=30)

    # -- worker -------------------------------------------------------------

    def _length_bucket(self, r: _Request) -> float:
        gen_max_s = self.pipeline.gen.max_length / self.pipeline.cfg.frame_rate
        want = r.max_seconds if r.max_seconds is not None else gen_max_s
        for s in self.length_bucket_seconds:
            if want <= s:
                return min(s, gen_max_s)
        return gen_max_s

    def _take_batch(self) -> list[_Request] | None:
        """Oldest request + compatible followers within the window."""
        while True:
            if self._pending:
                first = self._pending.pop(0)
            else:
                item = self._queue.get()
                if item is None:
                    return None
                first = item
            bucket = self._length_bucket(first)
            group = [first]
            deadline = time.monotonic() + self.max_wait_ms / 1e3
            # deferred fill: one bounded deadline extension when the group
            # would pad to a poorly-filled batch bucket (see __init__)
            fill_extended = False
            leftovers: list[_Request] = []
            while len(group) < self.max_batch:
                # same-bucket requests already deferred from earlier windows
                taken = [r for r in self._pending if self._length_bucket(r) == bucket]
                for r in taken[: self.max_batch - len(group)]:
                    self._pending.remove(r)
                    group.append(r)
                if len(group) >= self.max_batch:
                    break
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    if not fill_extended and self.fill_wait_ms > 0:
                        bsz = _batch_bucket(len(group), self.batch_buckets)
                        # only defer when the group already outgrew the
                        # smallest bucket: a solo request on an engine whose
                        # smallest bucket is > 1 would otherwise pay the full
                        # extension on every idle-traffic request with no
                        # realistic fill upside (round-5 review)
                        if (len(group) > self.batch_buckets[0]
                                and len(group) < self.fill_threshold * bsz):
                            fill_extended = True
                            deadline = time.monotonic() + self.fill_wait_ms / 1e3
                            continue
                    break
                try:
                    item = self._queue.get(timeout=timeout)
                except queue.Empty:
                    continue  # deadline expired mid-wait: let the timeout<=0
                    # branch decide between deferred fill and dispatch
                if item is None:
                    self._queue.put(None)  # re-signal shutdown for the outer loop
                    break
                if self._length_bucket(item) == bucket:
                    group.append(item)
                else:
                    leftovers.append(item)
            self._pending.extend(leftovers)
            return group

    def _run(self) -> None:
        while True:
            group = self._take_batch()
            if group is None:
                # drain: fail whatever is left so callers don't hang
                for r in self._pending:
                    r.future.set_exception(RuntimeError("engine shut down"))
                return
            try:
                self._execute(group)
            except Exception as e:  # propagate to every caller in the batch
                for r in group:
                    if not r.future.done():
                        r.future.set_exception(e)

    # -- deterministic batch-assembly policy (public: the quality gates
    # replicate an engine batch through the pipeline directly and must use
    # the SAME padding + seed fold — helpers/quality_gate.py,
    # benchmarks/surface_gates_mini.py) --------------------------------------

    @staticmethod
    def pad_rows(rows: list, bucket: int) -> list:
        """Pad a request list UP to the batch bucket by repeating the first
        row (one compilation per bucket; extra rows are dropped)."""
        return rows + [rows[0]] * (bucket - len(rows))

    @staticmethod
    def fold_seeds(seeds) -> int:
        """One key per batch: fold every request seed in so distinct seeds
        still decorrelate (a per-row key split happens inside sampling)."""
        out = 0
        for s in seeds:
            out = (out * 1000003 + s) & 0x7FFFFFFF
        return out

    def _execute(self, group: list[_Request]) -> None:
        n = len(group)
        forced = max((r.force_bucket or 0 for r in group), default=0)
        bucket = max(_batch_bucket(n, self.batch_buckets), forced)
        padded = self.pad_rows(group, bucket)
        descs = [r.description for r in padded]
        prompts = [r.prompt for r in padded]
        max_seconds = self._length_bucket(group[0])
        seed = self.fold_seeds(r.seed for r in group)
        sr, waves = self.pipeline.tts(descs, prompts, seed=seed, max_seconds=max_seconds)
        with self._lock:
            self._stats["batches"] += 1
            self._stats["batched_requests"] += n
            # pad accounting (round-4 VERDICT #2): device rows executed vs
            # useful rows — stats()["bucket_rows"]/["padded_rows"] give the
            # deployment's true pad-waste ratio
            self._stats["bucket_rows"] += bucket
            self._stats["padded_rows"] += bucket - n
        for r, wav in zip(group, waves):
            r.future.set_result((sr, np.asarray(wav)))
