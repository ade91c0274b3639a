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
