"""Shape-driven training memory plan (round-4 VERDICT #4): the dots+unroll
champion engages exactly on the shapes round 4 measured as fitting, and the
capacity plan on the shapes measured as OOM (PERFORMANCE.md scan-unroll
sweep)."""

from parler_tts_tpu.core.config import mini_600m_config
from parler_tts_tpu.training.autotune import (
    V5E_HBM_BYTES,
    plan_train_memory,
    resolve_train_plan,
    trainable_decoder_params,
)

CFG = mini_600m_config()
FUSED_10S = 32 + int(10 * 86) + CFG.decoder.num_codebooks + 2  # prompt + labels
FUSED_30S = 32 + int(30 * 86) + CFG.decoder.num_codebooks + 2


def _plan(batch, fused):
    return plan_train_memory(
        CFG, per_device_batch=batch, fused_len=fused, hbm_limit_bytes=V5E_HBM_BYTES
    )


def test_param_count_mini():
    # Mini decoder ≈ 420-440M trainable (24 x (8h² + 2·h·ffn) + embeds + heads
    # + 32128-vocab prompt table)
    p = trainable_decoder_params(CFG)
    assert 400e6 < p < 480e6, p


def test_champion_on_measured_fitting_shape():
    plan = _plan(8, FUSED_10S)
    assert plan.remat == "dots" and plan.scan_unroll == "full"
    # measured actual peak ~15.2 G; estimate within ±1.5 G
    assert 13.5e9 < plan.est_peak_bytes < 15.75e9


def test_capacity_plan_on_measured_oom_shapes():
    # batch 12 x 10 s: measured OOM 17.4 G fully unrolled
    plan = _plan(12, FUSED_10S)
    assert plan.remat is True and plan.scan_unroll == "1"
    # batch 8 x 30 s: measured OOM 22.9 G fully unrolled
    plan = _plan(8, FUSED_30S)
    assert plan.remat is True and plan.scan_unroll == "1"
    # batch 10 x 10 s sits between the calibration points (interpolated
    # actual ~16.3 G > 15.75): must choose capacity, not champion
    plan = _plan(10, FUSED_10S)
    assert plan.scan_unroll == "1"


def test_explicit_args_always_win():
    remat, unroll = resolve_train_plan(
        CFG, per_device_batch=8, fused_len=FUSED_10S,
        gradient_checkpointing=False, gradient_checkpointing_policy="auto",
        scan_unroll="4", hbm_limit_bytes=V5E_HBM_BYTES,
    )
    assert remat is False and unroll == "4"
    remat, unroll = resolve_train_plan(
        CFG, per_device_batch=8, fused_len=FUSED_30S,
        gradient_checkpointing=True, gradient_checkpointing_policy="dots",
        scan_unroll="auto", hbm_limit_bytes=V5E_HBM_BYTES,
    )
    assert remat == "dots" and unroll == "1"


def test_explicit_policy_wins_with_auto_flag():
    """A recipe that sets ONLY gradient_checkpointing_policy (leaving the
    on/off flag at its None auto default) still gets its policy — the plan
    may not silently substitute its own (round-5 review fix)."""
    # shape where auto would pick full remat (True), but the recipe says dots
    remat, unroll = resolve_train_plan(
        CFG, per_device_batch=8, fused_len=FUSED_30S,
        gradient_checkpointing=None, gradient_checkpointing_policy="dots",
        scan_unroll="auto", hbm_limit_bytes=V5E_HBM_BYTES,
    )
    assert remat == "dots" and unroll == "1"


def test_auto_defaults_resolve():
    remat, unroll = resolve_train_plan(
        CFG, per_device_batch=8, fused_len=FUSED_10S,
        gradient_checkpointing=None, gradient_checkpointing_policy="auto",
        scan_unroll="auto", hbm_limit_bytes=V5E_HBM_BYTES,
    )
    assert remat == "dots" and unroll == "full"
