"""Utility modules: profiling counters, distributed single-host no-ops,
runtime flags."""

import numpy as np

import jax.numpy as jnp


def test_throughput_meter():
    from parler_tts_tpu.utils.profiling import ThroughputMeter

    m = ThroughputMeter(frame_rate=86).start()
    m.add(steps=86, frames=86, tokens=86 * 9, result=jnp.ones((4,)))
    rep = m.report()
    assert rep["steps_per_sec"] > 0
    assert abs(rep["audio_seconds_per_sec"] * rep["wall_seconds"] - 1.0) < 1e-6


def test_stopwatch_sync():
    from parler_tts_tpu.utils.profiling import Stopwatch, sync

    sw = Stopwatch().start()
    x = jnp.ones((8, 8)) * 2
    el = sw.stop(x)
    assert el >= 0
    assert sync({"a": x}) == 128.0


def test_distributed_single_host_noops():
    from parler_tts_tpu.parallel import distributed as dist

    assert dist.process_shard(list(range(10)), process_index=1, process_count=3) == [1, 4, 7]
    dist.barrier("t")  # no-op single host
    with dist.main_process_first():
        pass
    out = dist.all_gather_metrics({"loss": 1.5})
    assert out == {"loss": 1.5}


def test_runtime_flags_roundtrip():
    from parler_tts_tpu.ops import runtime_flags as rf

    rf.set_pallas(True)
    assert rf.use_pallas() is True
    rf.set_pallas(False)
    assert rf.use_pallas() is False
    rf.set_pallas(None)


def test_write_wav_int16_passthrough_matches_float():
    """pcm16 pipeline output (device-side truncating cast) produces the
    SAME WAV bytes as the float path (utils/audio_io.py round-5)."""
    import io

    import numpy as np

    from parler_tts_tpu.utils.audio_io import read_wav, wav_bytes

    rng = np.random.default_rng(0)
    f = rng.uniform(-1.2, 1.2, 400).astype(np.float32)  # incl. clipping range
    i = (np.clip(f, -1.0, 1.0) * 32767.0).astype(np.int16)
    assert wav_bytes(i, 16000) == wav_bytes(f, 16000)
    audio, sr = read_wav(io.BytesIO(wav_bytes(i, 16000)))
    assert sr == 16000 and audio.shape == (1, 400)
