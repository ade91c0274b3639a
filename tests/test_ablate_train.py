"""Train-step ablation tool (tools/ablate_train.py): variants agree with
the production step's math and the grad-prefix path differentiates."""

import numpy as np

from fabric_tpu.tools.ablate_train import (
    build_variant, time_variant, time_stage_grad, microbench_group_conv)
from fabric_tpu.config import Config


def test_variants_run_and_step_counts():
    cfg = Config(dtype="float32", patch_size=16, batch_size=2, model_base=8)
    from fabric_tpu.tools.ablate_train import _data
    batch = _data(2, 16)
    for variant in ("full", "grad", "fwd", "eval_fwd"):
        carry, fn = build_variant(variant, cfg)
        carry, leaf = fn(carry, batch)
        carry, leaf = fn(carry, batch)
        assert np.isfinite(np.asarray(leaf, np.float32)).all(), variant
        # only the full step advances the optimizer
        expected = 2 if variant == "full" else 0
        assert int(carry.step) == expected, variant


def test_stage_grad_and_microbench_smoke():
    rec = time_stage_grad(11, 1, 32, 1, "float32")
    assert rec["stage"] == 10  # argmax stage clamped to the logits prefix
    assert rec["grad_step_ms"] > 0
    rec = microbench_group_conv(2, 32, 1, "float32")
    assert rec["batched_2n_c64_ms"] > 0 and rec["grouped_n_c128_ms"] > 0


def test_int8_microbenches_exact():
    from fabric_tpu.tools.ablate_train import (
        microbench_int8_matmul, microbench_int8_shift_conv)
    rec = microbench_int8_matmul(1024, 256, 256, 1)
    # XLA forms run everywhere; Pallas forms need a TPU (error recorded)
    assert rec["xla_int8_ms"] > 0 and rec["xla_bf16_ms"] > 0
    rec = microbench_int8_shift_conv(2, 16, 1, 32, 32)
    # integer math: the 9-shifted-matmul form must be bit-identical
    assert rec["exact"] is True
    assert rec["direct_conv_ms"] > 0 and rec["shifted_dot_ms"] > 0


def test_time_variant_reports():
    rec = time_variant("fwd", 2, 16, 1, "float32")
    assert rec["variant"] == "fwd" and rec["examples_per_sec"] > 0
