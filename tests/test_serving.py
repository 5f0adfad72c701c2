"""Dynamic micro-batching serving engine: concurrent requests coalesce into
one batched generate call (the reference's demo serves batch-1 only,
``helpers/gradio_demo/app.py:39-49``)."""

import time

import numpy as np
import pytest

from parler_tts_tpu.pipeline import ParlerTTSPipeline
from parler_tts_tpu.serving import BatchingEngine
from tests.test_pipeline import artifact  # noqa: F401  (fixture re-export)


@pytest.fixture()
def engine(artifact):  # noqa: F811
    model_dir, tok_dir = artifact
    pipe = ParlerTTSPipeline.from_pretrained(model_dir, tokenizer_name=tok_dir)
    eng = BatchingEngine(pipe, max_batch=8, max_wait_ms=150.0,
                         batch_buckets=(1, 2, 4, 8),
                         length_bucket_seconds=(0.005, 0.01))
    yield eng
    eng.shutdown()


def test_concurrent_requests_coalesce(engine):
    futs = [
        engine.submit(f"a female speaker voice {i}", "hey how are you", seed=i)
        for i in range(4)
    ]
    results = [f.result(timeout=300) for f in futs]
    for sr, wav in results:
        assert sr == 16000
        assert wav.ndim == 1
    stats = engine.stats()
    assert stats["requests"] == 4
    # the 150 ms window must have coalesced at least some of the burst
    assert stats["batches"] < 4, stats


def test_results_are_per_request(engine):
    # two requests with visibly different prompt lengths; each caller gets a
    # waveform (lengths may coincide on the random model, so just check
    # every future resolves independently with its own array)
    f1 = engine.submit("clear audio quality", "hey", max_seconds=0.005)
    f2 = engine.submit("a low pitched voice", "how are you doing today", max_seconds=0.005)
    (sr1, w1), (sr2, w2) = f1.result(300), f2.result(300)
    assert sr1 == sr2 == 16000
    assert isinstance(w1, np.ndarray) and isinstance(w2, np.ndarray)


def test_length_buckets_do_not_mix(engine):
    f_short = engine.submit("clear audio", "hey", max_seconds=0.004)
    f_long = engine.submit("clear audio", "hey", max_seconds=0.01)
    f_short.result(300), f_long.result(300)
    stats = engine.stats()
    assert stats["batches"] >= 2, "different length buckets must not share a batch"


def test_warmup_compiles_every_bucket(engine):
    # warmup must leave one compiled program per (batch bucket, length
    # bucket) in the pipeline's jit cache so the first real request of any
    # shape never compiles (measured 142 s cold on Mini —
    # benchmarks/serving_bench.json)
    # warm with texts in the same tokenized-length buckets as the later
    # request (text-length buckets are part of the program key)
    timings = engine.warmup(description="clear audio", prompt="hey how are you",
                            timeout=600)
    assert set(timings) == {
        f"{b}x{s:g}" for b in (1, 2, 4, 8) for s in (0.005, 0.01)
    }
    assert all(t >= 0 for t in timings.values())
    n_programs = len(engine.pipeline._jitted)
    assert n_programs == 8, n_programs
    # a real request at any bucket shape now reuses a compiled program
    sr, wav = engine.tts("clear audio", "hey how are you", max_seconds=0.01, timeout=300)
    assert sr == 16000 and wav.ndim == 1
    assert len(engine.pipeline._jitted) == n_programs


def test_blocking_tts_and_shutdown(artifact):  # noqa: F811
    model_dir, tok_dir = artifact
    pipe = ParlerTTSPipeline.from_pretrained(model_dir, tokenizer_name=tok_dir)
    eng = BatchingEngine(pipe, max_wait_ms=5.0, length_bucket_seconds=(0.005,))
    sr, wav = eng.tts("clear audio", "hey how are you", timeout=300)
    assert sr == 16000 and wav.ndim == 1
    eng.shutdown()
    with pytest.raises(RuntimeError):
        eng.submit("x", "y")


class _FakePipeline:
    """Minimal pipeline stand-in: returns a 1-sample wave per row, records
    batch sizes.  Lets the batching-policy tests run without jax."""

    class _Cfg:
        frame_rate = 100

    class _Gen:
        max_length = 100

    cfg = _Cfg()
    gen = _Gen()

    def __init__(self):
        self.batches = []

    def tts(self, descs, prompts, *, seed=0, max_seconds=None):
        self.batches.append(len(descs))
        return 16000, [np.zeros(4, np.float32) for _ in descs]


def test_deferred_fill_waits_for_stragglers():
    """A poorly-filled group extends its window once (fill_wait_ms) and
    coalesces arrivals inside it instead of padding out a dead-zone bucket
    (round-5 VERDICT #2 pad-waste lever)."""
    import threading

    pipe = _FakePipeline()
    eng = BatchingEngine(pipe, max_batch=16, max_wait_ms=100.0,
                         batch_buckets=(1, 2, 16),
                         length_bucket_seconds=(0.5,),
                         fill_wait_ms=2000.0, fill_threshold=0.6)
    try:
        # 3 requests land in the dead zone: bucket 16, fill 3/16 < 0.6 ->
        # the window extends once; 2 stragglers arrive inside the extension
        futs = [eng.submit("d", "p"), eng.submit("d", "p"), eng.submit("d", "p")]

        def late():
            time.sleep(0.4)  # > max_wait_ms, << fill_wait_ms
            futs.append(eng.submit("d", "p"))
            futs.append(eng.submit("d", "p"))

        t = threading.Thread(target=late)
        t.start()
        t.join()
        for f in list(futs):
            f.result(timeout=30)
        s = eng.stats()
        # without deferred fill: two batches ([3-pad-16, 2]); with it: ONE
        # batch of 5 useful rows padded to 16 (the pipe sees padded sizes)
        assert s["batches"] == 1 and s["batched_requests"] == 5, (s, pipe.batches)
        assert s["bucket_rows"] == 16 and s["padded_rows"] == 11
    finally:
        eng.shutdown()


def test_deferred_fill_skips_solo_requests():
    """A solo request never pays the fill extension, even when the smallest
    batch bucket is > 1 (round-5 review fix)."""
    pipe = _FakePipeline()
    eng = BatchingEngine(pipe, max_batch=8, max_wait_ms=30.0,
                         batch_buckets=(4, 8), length_bucket_seconds=(0.5,),
                         fill_wait_ms=5000.0, fill_threshold=0.6)
    try:
        t0 = time.monotonic()
        eng.tts("d", "p", timeout=30)
        elapsed = time.monotonic() - t0
        assert elapsed < 2.0, f"solo request waited the fill window: {elapsed:.2f}s"
        assert pipe.batches == [4]  # padded to the smallest bucket, one batch
        assert eng.stats()["batched_requests"] == 1
    finally:
        eng.shutdown()
