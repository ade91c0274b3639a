"""Tuner tests with a stubbed train function (full runs are exercised by
the e2e tests; here we verify search mechanics and the objective)."""

from fabric_tpu.tools.tune import run_search, grid_params, SPACE


def _fake_train(cfg, run_scene_inference=False):
    # objective peaks at lr ~ 5e-3
    f1 = 1.0 - abs(cfg.learning_rate - 5e-3) * 100
    return None, {"val": [{"cd_f1scores": f1}], "train": []}


def test_random_search_respects_space_and_picks_best(tmp_path):
    log = str(tmp_path / "log.jsonl")
    best, best_f1, results = run_search({}, trials=12, search="random",
                                        seed=1, train_fn=_fake_train,
                                        log_path=log)
    assert len(results) == 12
    for rec in results:
        for k, (lo, hi) in SPACE.items():
            assert lo <= rec[k] <= hi
    assert best_f1 == max(r["validate_cd_f1scores"] for r in results)
    assert abs(best["learning_rate"] - 5e-3) <= min(
        abs(r["learning_rate"] - 5e-3) for r in results) + 1e-12
    assert sum(1 for _ in open(log)) == 12


def test_grid_search_covers_corners():
    grid = grid_params(8)
    lrs = {g["learning_rate"] for g in grid}
    assert min(lrs) == 1e-3 and max(lrs) == 1e-2


def test_grid_search_runs():
    best, best_f1, results = run_search({}, trials=4, search="grid",
                                        train_fn=_fake_train)
    assert len(results) == 4 and best is not None


def _smooth_objective(cfg, run_scene_inference=False):
    # smooth peak inside the box at (lr=4e-3, alpha=0.12, beta=0.85)
    f1 = (1.0
          - ((cfg.learning_rate - 4e-3) / 9e-3) ** 2
          - ((cfg.tversky_alpha - 0.12) / 0.3) ** 2
          - ((cfg.tversky_beta - 0.85) / 0.3) ** 2)
    return None, {"val": [{"cd_f1scores": f1}], "train": []}


def test_bo_search_beats_random_on_smooth_objective():
    """GP-UCB must converge faster than random on a cheap synthetic
    objective (the reference study's optimizer shape: 16 trials, UCB)."""
    _, bo_best, bo_results = run_search({}, trials=16, search="bo", seed=0,
                                        train_fn=_smooth_objective)
    _, rand_best, _ = run_search({}, trials=16, search="random", seed=0,
                                 train_fn=_smooth_objective)
    assert len(bo_results) == 16
    assert bo_best >= rand_best
    # BO gets within 1% of the optimum (value 1.0 at the peak)
    assert bo_best > 0.99, bo_best


def test_trial_failure_is_isolated(tmp_path):
    """One diverging trial must not kill the study (r2 weak #4): it is
    recorded as failed with the failure score and the search continues."""
    calls = []

    def _flaky_train(cfg, run_scene_inference=False):
        calls.append(cfg.learning_rate)
        if len(calls) == 3:
            raise FloatingPointError("loss became NaN")
        return _fake_train(cfg, run_scene_inference)

    log = str(tmp_path / "log.jsonl")
    best, best_f1, results = run_search({}, trials=8, search="bo", seed=2,
                                        train_fn=_flaky_train, log_path=log)
    assert len(results) == 8 and len(calls) == 8
    failed = [r for r in results if r.get("failed")]
    assert len(failed) == 1
    assert failed[0]["trial"] == 2
    assert "NaN" in failed[0]["error"]
    assert failed[0]["validate_cd_f1scores"] == 0.0
    # the failed trial can never be selected as best
    assert best is not None and best_f1 > 0.0
    assert sum(1 for _ in open(log)) == 8


def test_resume_reproduces_uninterrupted_study(tmp_path):
    """A study resumed from its own JSONL must continue bit-identically:
    replayed proposals reconstruct the searcher's RNG and GP state."""
    full_log = str(tmp_path / "full.jsonl")
    best_full, f1_full, res_full = run_search(
        {}, trials=10, search="bo", seed=5, train_fn=_smooth_objective,
        log_path=full_log)

    # simulate an interruption after 4 trials, then resume
    part_log = str(tmp_path / "part.jsonl")
    with open(full_log) as fin, open(part_log, "w") as fout:
        fout.writelines(fin.readlines()[:4])
    best_res, f1_res, res_res = run_search(
        {}, trials=10, search="bo", seed=5, train_fn=_smooth_objective,
        log_path=part_log, resume=True)

    assert f1_res == f1_full and best_res == best_full
    for a, b in zip(res_full, res_res):
        assert a == b
    # the resumed log now contains all 10 trials
    assert sum(1 for _ in open(part_log)) == 10


def test_bo_stays_in_box():
    from fabric_tpu.tools.tune import GPUCB
    opt = GPUCB(SPACE, seed=3)
    for i in range(10):
        p = opt.ask()
        for k, (lo, hi) in SPACE.items():
            assert lo <= p[k] <= hi
        opt.tell(-abs(p["learning_rate"] - 5e-3))
