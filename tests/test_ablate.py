"""tools/ablate: the per-stage forward profiler's functional graph must
match the real folded model (its deltas are only meaningful if the full
prefix IS the model's eval forward)."""

import json


def test_ablate_verify_matches_model(capsys):
    from fabric_tpu.tools.ablate import main
    rc = main(["--verify"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["verify_mask_agreement"] == 1.0


def test_ablate_stage_timing_runs(capsys):
    from fabric_tpu.tools.ablate import main
    rc = main(["--stage", "2", "--batch", "2", "--patch", "32",
               "--iters", "1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["stage"] == 2 and out["ms"] > 0
