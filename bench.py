"""Benchmark: generated audio-seconds per wall-second per chip (BASELINE.md
north-star metric) on the Parler-TTS Mini 600M geometry.

Runs the full jitted pipeline — T5 description encode, prompt fusion, delay
pattern, KV-cached sampling decode loop, undelay, DAC vocode — with random
Mini-shape weights (throughput is weight-value independent) on the real TPU
chip, bf16 compute with bf16-resident params (fp32 masters are never kept on
device during inference).

Prints ONE JSON line:
  {"metric": "audio_seconds_per_sec_per_chip", "value": N, "unit": "audio-s/s",
   "vs_baseline": N, ...}

``vs_baseline`` compares against an estimated reference throughput on A100:
the reference (torch eager, no flash attention, HF generate loop —
/root/reference/parler_tts/modeling_parler_tts.py:320-382) decodes a 600M
MusicGen-style LM at ≈55 steps/s with a small batch on A100; at 86 codec
frames per audio-second and batch 4 that is ≈2.6 audio-s/s.  The reference
publishes no numbers (BASELINE.json "published": {}), so this anchor is an
estimate, documented here and held constant across rounds for comparability.

``p50_latency_10s_utterance_s`` is a MEASURED batch-1 greedy 10 s-utterance
wall time (BASELINE config 1), not a scaled throughput number.

Env knobs: BENCH_BATCH (default 128 — round-5 sweep with the final KV
ladder: 100.2 audio-s/s at 128, 101.5 at 256; 256's +1.3% is not worth the
bigger executable).  The default headline shape (batch 128, 3 s, int8,
sampled top-k 50 + batch-1 greedy 10 s latency) stays FROZEN: the
persistent XLA cache is pre-populated for exactly these two programs
(round-5 verified: HIT compile_s ~8-10 s; a cold MISS is ~30-95 s of
remote compile).  BENCH_SECONDS (default 3 s of audio), BENCH_REPS
(default 3, median reported), BENCH_VOCODE=0 to skip DAC, BENCH_LATENCY=0
to skip the batch-1 latency config.

Resilience: the TPU tunnel on this box occasionally kills the worker during
long compiles/runs; the driver depends on ONE JSON line being printed, so a
failed attempt falls back to smaller configs and, as a last resort, reports
the failure in-line.

Phase instrumentation (round-4 VERDICT #1 — BENCH_r04 recorded 523.3 s
"compile+first-run" despite a logged cache HIT, 40x the in-round verified
12.3 s, with nothing in the log to attribute it):

* ``claim_probe``: the axon chip claim is LAZY — it happens at the first
  device operation, not client init — and a prior client killed mid-work
  leaves a stale lease the next claim waits out (measured on this box
  2026-08-20: probes hung > 600 s, then cleared; the orchestrator's
  ``/v1/claim`` endpoint itself blocked).  That is the prime suspect for the
  523 s: the driver captures right after the round's last builder processes
  are killed.  ``bench.py`` therefore first claims the chip in a KILLABLE
  SUBPROCESS (tiny jit, 150 s timeout, up to BENCH_CLAIM_RETRIES=8 tries);
  a stale-lease wait lands in ``claim_probe_s``/``claim_tries`` instead of
  silently inflating compile_s, and the main process then claims instantly.
* ``phases`` in the JSON: client_init_s / tunnel_probe_s / init_s /
  trace_lower_s / backend_compile_s (AOT ``.compile()`` = persistent-cache
  deserialize or remote compile) / first_exec_s — whichever phase eats a
  future regression is named in the driver's own capture.
``compile_s`` remains trace+compile+first-exec for cross-round continuity.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

A100_BASELINE_AUDIO_S_PER_S = 2.6  # documented estimate, see module docstring


_done = False


def _claim_chip_subprocess() -> dict:
    """Claim (and release) the chip in a killable child before the main
    process touches the device.  Returns phase info; never raises.

    HAZARD (why this is opt-in): killing a claim-WAITING child (the timeout
    path below) leaves a dead claimant the orchestrator may still grant to,
    adding a full "grant unclaimed" timeout cycle before live clients get
    the chip — measured 2026-08-20: three timed-out probe children preceded
    a ~12 min main-process claim wait."""
    retries = int(os.environ.get("BENCH_CLAIM_RETRIES", 8))
    probe_timeout = int(os.environ.get("BENCH_CLAIM_TIMEOUT", 150))
    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "benchmarks", "probe_tiny.py")
    t0 = time.time()
    for attempt in range(1, retries + 1):
        try:
            r = subprocess.run(
                [sys.executable, probe], timeout=probe_timeout,
                capture_output=True, text=True,
            )
            if r.returncode == 0:
                return {"claim_probe_s": round(time.time() - t0, 1),
                        "claim_tries": attempt}
            print(f"claim probe attempt {attempt} rc={r.returncode}: "
                  f"{(r.stderr or '')[-300:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"claim probe attempt {attempt} timed out after "
                  f"{probe_timeout}s (stale chip lease? waiting it out)",
                  file=sys.stderr)
    return {"claim_probe_s": round(time.time() - t0, 1),
            "claim_tries": retries, "claim_failed": True}


def main():
    # deadline guard: a wedged TPU tunnel hangs FOREVER inside PJRT client
    # init (observed round 4: chip-claim never granted after a client died
    # mid-compile) — without this the driver would record NO json line at
    # all.  A daemon thread, not SIGALRM: Python defers signal handlers
    # while the main thread is blocked inside the hanging C call.  Deadline
    # is generous vs the worst legitimate run (~400 s cold compile + ~100 s
    # latency compile + reps); BENCH_DEADLINE overrides.
    import threading

    deadline = int(os.environ.get("BENCH_DEADLINE", 2700))
    attempt_start = [time.time()]  # refreshed per fallback attempt: the
    # budget is per-ATTEMPT so a legitimate slow first config + fallbacks
    # are not mistaken for a hang

    def _watchdog():
        while not _done:
            remaining = attempt_start[0] + deadline - time.time()
            if remaining <= 0:
                print(json.dumps({
                    "metric": "audio_seconds_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "audio-s/s",
                    "vs_baseline": 0.0,
                    "error": f"bench attempt exceeded {deadline}s (TPU tunnel hang?)",
                }), flush=True)
                os._exit(1)
            time.sleep(min(remaining, 30))

    threading.Thread(target=_watchdog, daemon=True).start()

    # BENCH_CLAIM_PROBE=1: claim the chip in a killable child first, so a
    # stale lease is waited out in a subprocess that can be timed out.
    # Default OFF (measured 2026-08-20): the child's claim+release does not
    # hand the chip to the main process — the main process's own claim
    # queued AGAIN for ~10 min right after the child succeeded, so the extra
    # process transition can double the wait.  The in-process tunnel probe
    # (phases.tunnel_probe_s) attributes claim waits just as well; the
    # watchdog bounds a truly-wedged claim.
    claim_info = {}
    if os.environ.get("BENCH_CLAIM_PROBE", "0") != "0":
        claim_info = _claim_chip_subprocess()
        print(f"claim probe: {claim_info}", file=sys.stderr)

    attempts = [
        (int(os.environ.get("BENCH_BATCH", 128)), float(os.environ.get("BENCH_SECONDS", 3.0))),
        (32, 3.0),
        (4, 2.0),
    ]
    last_err = None
    for batch, seconds in attempts:
        try:
            attempt_start[0] = time.time()
            return run_bench(batch, seconds, claim_info)
        except Exception as e:  # tunnel crash, OOM, ...
            last_err = e
            print(f"bench attempt batch={batch} seconds={seconds} failed: {e}", file=sys.stderr)
    global _done
    _done = True
    print(json.dumps({
        "metric": "audio_seconds_per_sec_per_chip",
        "value": 0.0,
        "unit": "audio-s/s",
        "vs_baseline": 0.0,
        "error": str(last_err)[:200],
    }))
    return 1


def _make_inputs(rng, batch, desc_len=32, prompt_len=24):
    return dict(
        input_ids=rng.integers(0, 32128, (batch, desc_len)),
        attention_mask=np.ones((batch, desc_len), np.int32),
        prompt_input_ids=rng.integers(0, 32128, (batch, prompt_len)),
        prompt_attention_mask=np.ones((batch, prompt_len), np.int32),
    )


def _cache_entries(cache_dir):
    try:
        return len(os.listdir(cache_dir)) if cache_dir else 0
    except OSError:
        return 0


def _host_load():
    """1-min load average / cores.  Cold-start numbers are CPU-contention
    sensitive (measured 58 s idle vs 813 s with a pytest suite saturating the
    host — PERFORMANCE.md 'Compile / cold start'); surface the conditions a
    measurement was taken under instead of silently recording garbage."""
    try:
        load1 = os.getloadavg()[0]
        ncpu = os.cpu_count() or 1
        return round(load1, 2), ncpu
    except OSError:
        return None, None


def run_bench(batch: int, seconds: float, claim_info: dict | None = None):
    from parler_tts_tpu.utils.compilation_cache import enable_persistent_cache

    phases: dict = dict(claim_info or {})
    load1, ncpu = _host_load()
    if load1 is not None and load1 > 0.5 * ncpu:
        print(
            f"WARNING: host is busy (load {load1} on {ncpu} cores) — compile_s "
            f"and warm timings will be inflated; re-run on an idle host "
            f"(do not overlap the pytest suite, PERFORMANCE.md)",
            file=sys.stderr,
        )

    cache_dir = enable_persistent_cache()
    # surface persistent-cache hits/misses: a "cold" 5-min compile with a warm
    # disk cache means the cache key changed (program or compiler version), a
    # growing entry count means first-ever population of this program
    import logging
    logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
    logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
    logging.basicConfig(stream=sys.stderr)

    import jax
    import jax.numpy as jnp

    from parler_tts_tpu.core.config import GenerationConfig, mini_600m_config
    from parler_tts_tpu.generation import generate as G
    from parler_tts_tpu.models import parler
    from parler_tts_tpu.ops.nn import astype_tree

    reps = int(os.environ.get("BENCH_REPS", 3))
    vocode = os.environ.get("BENCH_VOCODE", "1") != "0"
    measure_latency = os.environ.get("BENCH_LATENCY", "1") != "0"

    cfg = mini_600m_config()
    frames = int(seconds * cfg.frame_rate) + cfg.decoder.num_codebooks
    # int8 KV cache + int8 weight-only decode matmuls: the production decode
    # path (~0.9x step time vs bf16, half the HBM footprint; exact scale
    # folding, logits within ~5e-2 relative of fp — see ops/quantization.py).
    # BENCH_INT8=0 reverts to the bf16 compatibility path.
    use_int8 = os.environ.get("BENCH_INT8", "1") != "0"
    # compile-time experiment knobs (BENCH_SAMPLE=0 -> greedy, BENCH_TOPK=0 ->
    # sampling without the top-k warper)
    gen = GenerationConfig(
        max_length=frames,
        do_sample=os.environ.get("BENCH_SAMPLE", "1") != "0",
        temperature=1.0,
        top_k=int(os.environ.get("BENCH_TOPK", 50)),
        kv_cache_dtype="int8" if use_int8 else None, int8_weights=use_int8,
    )

    t0 = time.time()
    print(f"backend: {jax.default_backend()} devices={jax.devices()} "
          f"compilation_cache={cache_dir}", file=sys.stderr)
    phases["client_init_s"] = round(time.time() - t0, 2)

    # in-process tunnel probe: trivial program, times THIS process's claim +
    # tiny compile + exec (after the subprocess pre-claim this should be a
    # few seconds; if not, the tunnel itself is degraded and it shows here)
    t0 = time.time()
    xp = jnp.ones((128, 128), jnp.bfloat16)
    float(jax.jit(lambda a: jnp.sum((a @ a).astype(jnp.float32)))(xp))
    phases["tunnel_probe_s"] = round(time.time() - t0, 2)
    print(f"tunnel probe {phases['tunnel_probe_s']}s", file=sys.stderr)

    t0 = time.time()
    # one fused compile for init (eager init is hundreds of tiny dispatches);
    # cast to bf16 INSIDE the program so fp32 masters never stay resident
    params = jax.jit(
        lambda k: astype_tree(parler.init(k, cfg, with_audio_encoder=vocode), jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    phases["init_s"] = round(time.time() - t0, 1)
    print(f"init {phases['init_s']}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    inputs = _make_inputs(rng, batch)

    @jax.jit
    def run(params, key):
        out = G.generate(
            params, cfg, gen, **inputs,
            key=key, vocode=vocode, dtype=jnp.bfloat16,
        )
        res = out.audio if vocode else out.codes
        # scalar reduce: timing fetches this to host — block_until_ready is
        # NOT a reliable completion barrier through the axon tunnel
        return jnp.sum(res.astype(jnp.float32))

    # AOT phase split: trace/lower (host python+jaxpr), backend compile
    # (persistent-cache deserialize+load OR remote cold compile), first
    # execution — so a regression names its phase (round-4 VERDICT #1)
    t0 = time.time()
    lowered = run.lower(params, jax.random.PRNGKey(1))
    phases["trace_lower_s"] = round(time.time() - t0, 1)
    # entry counts bracket ONLY the main program's compile: the probe/init
    # programs above also write cache entries, which used to mislabel a
    # genuinely-warm run as MISS (round-5 review)
    cache_n0 = _cache_entries(cache_dir)
    t0 = time.time()
    compiled = lowered.compile()
    phases["backend_compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    float(compiled(params, jax.random.PRNGKey(1)))
    phases["first_exec_s"] = round(time.time() - t0, 1)
    compile_s = phases["trace_lower_s"] + phases["backend_compile_s"] + phases["first_exec_s"]
    cache_n1 = _cache_entries(cache_dir)
    print(f"compile+first-run {compile_s:.1f}s "
          f"(trace {phases['trace_lower_s']} + compile {phases['backend_compile_s']}"
          f" + first-exec {phases['first_exec_s']}; cache entries {cache_n0} -> {cache_n1}: "
          f"{'MISS — populated now' if cache_n1 > cache_n0 else 'HIT'})",
          file=sys.stderr)

    times = []
    for i in range(reps):
        t0 = time.time()
        # the AOT-compiled executable (run() itself would re-lower + pay a
        # second cache deserialize — the jit cache is not shared with .lower())
        float(compiled(params, jax.random.PRNGKey(2 + i)))
        times.append(time.time() - t0)
    median = float(np.median(times))
    print(f"warm times: {[f'{t:.2f}' for t in times]}", file=sys.stderr)

    audio_seconds = batch * (frames - cfg.decoder.num_codebooks) / cfg.frame_rate
    value = audio_seconds / median

    result = {
        "metric": "audio_seconds_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "audio-s/s",
        "vs_baseline": round(value / A100_BASELINE_AUDIO_S_PER_S, 3),
        "batch": batch,
        "utterance_seconds": seconds,
        "decode_steps": frames,
        "compile_s": round(compile_s, 1),
        "phases": phases,
    }
    if load1 is not None:
        result["host_load1"] = load1

    if measure_latency:
        # BASELINE config 1: single utterance, greedy, vocoded — measured
        try:
            lat_frames = int(10.0 * cfg.frame_rate) + cfg.decoder.num_codebooks
            lat_gen = GenerationConfig(
                max_length=lat_frames, do_sample=False,
                kv_cache_dtype="int8" if use_int8 else None, int8_weights=use_int8,
            )
            lat_inputs = _make_inputs(rng, 1)

            @jax.jit
            def run_latency(params, key):
                out = G.generate(
                    params, cfg, lat_gen, **lat_inputs,
                    key=key, vocode=vocode, dtype=jnp.bfloat16,
                )
                res = out.audio if vocode else out.codes
                return jnp.sum(res.astype(jnp.float32))

            t0 = time.time()
            float(run_latency(params, jax.random.PRNGKey(11)))
            lat_compile_s = time.time() - t0
            lat_times = []
            for i in range(reps):
                t0 = time.time()
                float(run_latency(params, jax.random.PRNGKey(12 + i)))
                lat_times.append(time.time() - t0)
            result["p50_latency_10s_utterance_s"] = round(float(np.median(lat_times)), 3)
            result["latency_compile_s"] = round(lat_compile_s, 1)
            print(f"latency times: {[f'{t:.2f}' for t in lat_times]}", file=sys.stderr)
        except Exception as e:
            print(f"latency config failed: {e}", file=sys.stderr)
            result["p50_latency_10s_utterance_s"] = None

    global _done
    _done = True
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
