"""Serving-engine benchmark on the real chip (round-3 VERDICT #3).

Measures what a deployed `BatchingEngine` actually delivers at Mini-600M
geometry (random bf16 weights; latency is weight-value independent):

1. **fresh-process first-request latency** — the bucket-compile story a new
   server pays (per batch bucket, with the persistent XLA cache enabled like
   production `ParlerTTSPipeline.from_pretrained`).
2. **p50/p99 end-to-end latency and coalescing ratio vs offered load** —
   Poisson arrivals at several request rates against warm buckets.
3. **pad-row waste** — wall time of bucket sizes for the same single
   request, i.e. what padding a lone request up to a big bucket costs.

Writes ``benchmarks/serving_bench.json`` and prints one JSON line.

``SERVE_MODE=warmup`` measures the ``BatchingEngine.warmup()`` startup story
instead: per-bucket warmup wall time in a fresh process (run once on a cold
disk cache for the first-boot cost, again for the restarted-server cost with
the persistent XLA cache populated), plus the first real request after
warmup.  Results are merged into the same JSON.

Run serialized with other TPU work:
  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/serving_bench.py
"""

import json
import os
import sys
import time

import numpy as np

UTTERANCE_SECONDS = float(os.environ.get("SERVE_SECONDS", 5.0))
BATCH_BUCKETS = (1, 4, 16)  # measured default: 3 compiles cover solo, small
# bursts, and saturated load; decode cost is nearly flat in batch (84->94
# audio-s/s from 64->256), so coarse buckets waste little and compile fast
RATES = (0.5, 2.0, 8.0)  # offered load, requests/s
N_REQ = int(os.environ.get("SERVE_N", 30))  # per rate


def _toy_tokenizer():
    from parler_tts_tpu.utils.toy_tokenizer import build_toy_tokenizer

    return build_toy_tokenizer(vocab_size=120)


def main():
    import jax
    import jax.numpy as jnp

    from parler_tts_tpu.core.config import GenerationConfig, mini_600m_config
    from parler_tts_tpu.models import parler
    from parler_tts_tpu.ops.nn import astype_tree
    from parler_tts_tpu.pipeline import ParlerTTSPipeline
    from parler_tts_tpu.serving import BatchingEngine
    from parler_tts_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = mini_600m_config()
    frames = int(UTTERANCE_SECONDS * cfg.frame_rate) + cfg.decoder.num_codebooks
    gen = GenerationConfig(
        max_length=frames, do_sample=True, temperature=1.0, top_k=50,
        kv_cache_dtype="int8", int8_weights=True,
    )
    t0 = time.time()
    params = jax.jit(
        lambda k: astype_tree(parler.init(k, cfg), jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"init {time.time() - t0:.1f}s", file=sys.stderr)

    tok = _toy_tokenizer()
    pipe = ParlerTTSPipeline(params, cfg, gen, tok, tok, dtype=jnp.bfloat16)
    descs = ["a female speaker with a low pitched voice speaks very fast",
             "clear audio quality", "a male speaker with a deep voice"]
    prompts = ["hey how are you doing today", "how are you", "hey there today"]

    out_path = os.path.join(os.path.dirname(__file__), "serving_bench.json")

    if os.environ.get("SERVE_MODE") == "warmup":
        # warmup startup story: time engine.warmup() per bucket in THIS fresh
        # process, then the first real request (which must pay no compile)
        eng = BatchingEngine(pipe, max_batch=max(BATCH_BUCKETS), max_wait_ms=20.0,
                             batch_buckets=BATCH_BUCKETS,
                             length_bucket_seconds=(UTTERANCE_SECONDS,))
        t0 = time.time()
        timings = eng.warmup(
            description=descs[0], prompt=prompts[0],
            batch_buckets=BATCH_BUCKETS,
            length_bucket_seconds=(UTTERANCE_SECONDS,), timeout=3600,
        )
        total = time.time() - t0
        t0 = time.time()
        eng.tts(descs[1], prompts[1], max_seconds=UTTERANCE_SECONDS, timeout=3600)
        first = time.time() - t0
        eng.shutdown()
        try:
            with open(out_path) as f:
                report = json.load(f)
        except OSError:
            report = {}
        key = "warmup_cold_cache" if os.environ.get("SERVE_COLD") else "warmup_warm_cache"
        report[key] = {
            "per_bucket_s": timings, "total_s": round(total, 1),
            "first_request_after_warmup_s": round(first, 3),
        }
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps({key: report[key]}))
        return 0

    report: dict = {
        "geometry": "mini_600m", "utterance_seconds": UTTERANCE_SECONDS,
        "batch_buckets": list(BATCH_BUCKETS), "do_sample": True,
    }

    # ----- 1. fresh-process first-request latency + bucket warmup ----------
    eng = BatchingEngine(pipe, max_batch=max(BATCH_BUCKETS), max_wait_ms=20.0,
                         batch_buckets=BATCH_BUCKETS,
                         length_bucket_seconds=(UTTERANCE_SECONDS,))
    t0 = time.time()
    eng.tts(descs[0], prompts[0], max_seconds=UTTERANCE_SECONDS, timeout=3600)
    report["first_request_s"] = round(time.time() - t0, 2)
    print(f"first request (bucket-1 compile): {report['first_request_s']}s", file=sys.stderr)

    bucket_times: dict[str, float] = {}
    for bsz in BATCH_BUCKETS:
        t0 = time.time()
        futs = [eng.submit(descs[i % 3], prompts[i % 3], max_seconds=UTTERANCE_SECONDS, seed=i)
                for i in range(bsz)]
        for f in futs:
            f.result(timeout=3600)
        cold = time.time() - t0
        # warm repeat = steady-state batch exec time for this bucket
        t0 = time.time()
        futs = [eng.submit(descs[i % 3], prompts[i % 3], max_seconds=UTTERANCE_SECONDS, seed=i)
                for i in range(bsz)]
        for f in futs:
            f.result(timeout=3600)
        warm = time.time() - t0
        bucket_times[str(bsz)] = round(warm, 3)
        print(f"bucket {bsz}: cold {cold:.1f}s warm {warm:.2f}s", file=sys.stderr)
    report["bucket_warm_batch_s"] = bucket_times
    # pad-row waste: a lone request padded up to bucket N costs time(N) for
    # 1/N useful rows — relative overhead vs the bucket-1 path
    report["pad_waste_16_vs_1"] = round(bucket_times["16"] / bucket_times["1"], 3)

    # ----- 2. latency vs offered load (Poisson arrivals, warm buckets) -----
    rng = np.random.default_rng(0)
    loads = {}
    for rate in RATES:
        lat: list[float] = []
        stats0 = eng.stats()
        done: list = []
        t_start = time.time()
        for i in range(N_REQ):
            gap = float(rng.exponential(1.0 / rate))
            time.sleep(gap)
            t_sub = time.time()
            fut = eng.submit(descs[i % 3], prompts[i % 3],
                             max_seconds=UTTERANCE_SECONDS, seed=i)
            fut.add_done_callback(lambda f, t=t_sub: lat.append(time.time() - t))
            done.append(fut)
        for f in done:
            f.result(timeout=3600)
        wall = time.time() - t_start
        # done-callbacks can fire AFTER result() returns (set_result wakes
        # waiters before invoking callbacks) — wait for every latency sample
        deadline = time.time() + 30
        while len(lat) < N_REQ and time.time() < deadline:
            time.sleep(0.01)
        assert len(lat) == N_REQ, f"missing latency samples: {len(lat)}/{N_REQ}"
        stats1 = eng.stats()
        batches = stats1["batches"] - stats0["batches"]
        reqs = stats1["batched_requests"] - stats0["batched_requests"]
        lat_a = np.sort(np.asarray(lat))
        loads[str(rate)] = {
            "p50_s": round(float(np.percentile(lat_a, 50)), 3),
            "p99_s": round(float(np.percentile(lat_a, 99)), 3),
            "mean_s": round(float(lat_a.mean()), 3),
            "coalescing": round(reqs / max(batches, 1), 2),
            "achieved_req_s": round(N_REQ / wall, 2),
            "audio_s_per_s": round(N_REQ * UTTERANCE_SECONDS / wall, 1),
        }
        print(f"rate {rate}/s: {loads[str(rate)]}", file=sys.stderr)
    report["load"] = loads
    eng.shutdown()

    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
