"""ScenePredictor serving tests: bucketing, compile reuse, checkpoint load."""

import numpy as np
import pytest

from fabric_tpu.config import Config
from fabric_tpu.data.synthetic import generate_synthetic_dataset
from fabric_tpu.infer.service import ScenePredictor


@pytest.fixture(scope="module")
def predictor():
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    return ScenePredictor(cfg, checkpoint=None, bucket=32, fold_bn=True)


def test_predict_shapes_and_values(predictor):
    rng = np.random.RandomState(0)
    d1 = rng.randn(45, 53, 13).astype(np.float32)
    d2 = rng.randn(45, 53, 13).astype(np.float32)
    mask = predictor.predict(d1, d2)
    assert mask.shape == (45, 53)
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 1}


def test_bucket_compile_reuse(predictor):
    rng = np.random.RandomState(1)
    # 45x53 and 60x40 both pad to the (64, 64) bucket -> ONE compilation
    predictor.predict(rng.randn(45, 53, 13).astype(np.float32),
                      rng.randn(45, 53, 13).astype(np.float32))
    n_before = len(predictor._compiled)
    predictor.predict(rng.randn(60, 40, 13).astype(np.float32),
                      rng.randn(60, 40, 13).astype(np.float32))
    assert len(predictor._compiled) == n_before
    # a bigger scene needs a new bucket
    predictor.predict(rng.randn(70, 70, 13).astype(np.float32),
                      rng.randn(70, 70, 13).astype(np.float32))
    assert len(predictor._compiled) == n_before + 1


def test_predict_many_matches_sequential(predictor):
    """Cross-scene pipelined serving is bit-identical to sequential
    predict() calls, including mixed scene shapes (separate buckets)."""
    rng = np.random.RandomState(7)
    pairs = []
    for shape in [(45, 53), (30, 30), (45, 53), (64, 40)]:
        pairs.append((rng.randn(*shape, 13).astype(np.float32),
                      rng.randn(*shape, 13).astype(np.float32)))
    seq = [predictor.predict(d1, d2) for d1, d2 in pairs]
    piped = predictor.predict_many(pairs)
    assert len(piped) == len(seq)
    for a, b in zip(piped, seq):
        np.testing.assert_array_equal(a, b)
    # window=1 (drain immediately) also matches
    for a, b in zip(predictor.predict_many(pairs, window=1), seq):
        np.testing.assert_array_equal(a, b)


def test_predict_many_int8_pipelines_and_matches_sequential():
    """int8 predict_many rides the pipelined path (r4 VERDICT #2): masks
    match sequential predict() exactly, the clip probe still runs per
    scene, and no extra calibration happens mid-stream."""
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=32, quant="int8")
    rng = np.random.RandomState(8)
    pairs = [(rng.randn(33, 40, 13).astype(np.float32),
              rng.randn(33, 40, 13).astype(np.float32)) for _ in range(3)]
    seq = [pred.predict(d1, d2) for d1, d2 in pairs]  # scene 0 calibrates
    scales_after_seq = dict(pred._scales)
    piped = pred.predict_many(pairs)
    assert len(piped) == 3
    for a, b in zip(piped, seq):
        np.testing.assert_array_equal(a, b)
    assert pred._scenes_predicted == 6
    # scales untouched (calibrate-once cadence) and the probe ran for the
    # pipelined scenes too
    assert pred._scales == scales_after_seq
    assert pred.last_clip_report is not None


def test_predict_many_packed_matches_sequential(predictor):
    """Fleet-packed serving (r4 VERDICT #1): per-scene masks bit-identical
    to predict(), across uneven pack counts and mixed buckets."""
    rng = np.random.RandomState(11)
    # 3 scenes in the (32,32) bucket (one partial pack) + 2 in (64,64)
    shapes = [(30, 28), (32, 32), (25, 31), (60, 40), (45, 53)]
    pairs = [(rng.randn(*s, 13).astype(np.float32),
              rng.randn(*s, 13).astype(np.float32)) for s in shapes]
    seq = [predictor.predict(d1, d2) for d1, d2 in pairs]
    packed = predictor.predict_many(pairs, pack=2)
    assert len(packed) == len(seq)
    for a, b in zip(packed, seq):
        np.testing.assert_array_equal(a, b)
    # pack=1 degenerates to per-scene dispatch, still identical
    for a, b in zip(predictor.predict_many(pairs, pack=1), seq):
        np.testing.assert_array_equal(a, b)


def test_predict_many_pack_auto(predictor):
    """pack='auto' picks, PER BUCKET, the first pack that fills the tile
    batch (eval_batch_size // tiles-per-scene): with patch 16 / batch 8,
    the (32,32) bucket (4 tiles) packs 2 scenes per dispatch and the
    (64,64) bucket (16 tiles) packs 1 — masks stay bit-identical to
    per-scene serving."""
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    fresh = ScenePredictor(cfg, checkpoint=None, bucket=32)
    rng = np.random.RandomState(14)
    shapes = [(30, 28), (32, 32), (25, 31), (60, 40), (45, 53)]
    pairs = [(rng.randn(*s, 13).astype(np.float32),
              rng.randn(*s, 13).astype(np.float32)) for s in shapes]
    seq = [predictor.predict(d1, d2) for d1, d2 in pairs]
    auto = fresh.predict_many(pairs, pack="auto")
    for a, b in zip(auto, seq):
        np.testing.assert_array_equal(a, b)
    # a fresh predictor, so the cache holds exactly the auto choices
    packed_keys = {k for k in fresh._compiled if k[-1] == "packed"}
    assert packed_keys == {(32, 32, 2, "packed"), (64, 64, 1, "packed")}
    with pytest.raises(ValueError, match="auto"):
        fresh.predict_many(pairs, pack=-1)


def test_predict_many_packed_int8():
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=32, quant="int8")
    rng = np.random.RandomState(12)
    pairs = [(rng.randn(30, 30, 13).astype(np.float32),
              rng.randn(30, 30, 13).astype(np.float32)) for _ in range(3)]
    seq = [pred.predict(d1, d2) for d1, d2 in pairs]  # scene 0 calibrates
    packed = pred.predict_many(pairs, pack=2)
    for a, b in zip(packed, seq):
        np.testing.assert_array_equal(a, b)


def test_packed_rejects_non_grid_modes():
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8, infer_overlap=8)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=32)
    rng = np.random.RandomState(13)
    pairs = [(rng.randn(30, 30, 13).astype(np.float32),
              rng.randn(30, 30, 13).astype(np.float32))]
    with pytest.raises(ValueError, match="grid"):
        pred.predict_many(pairs, pack=2)


def test_predict_city_with_checkpoint(tmp_path):
    from fabric_tpu import checkpoint as ckpt
    from fabric_tpu.models import build_model
    from fabric_tpu.train.state import create_state
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8, dataset_dir=str(tmp_path))
    generate_synthetic_dataset(cfg.dataset_dir, cfg, cities=["alpha"],
                               sizes=[(48, 56)])
    state = create_state(cfg, build_model(cfg))
    ckpt.save(state, str(tmp_path / "w"), epoch=0)
    predictor = ScenePredictor(cfg, checkpoint=str(tmp_path / "w"),
                               bucket=32)
    mask = predictor.predict_city("alpha")
    assert mask.shape == (48, 56)


def test_missing_checkpoint_raises(tmp_path):
    cfg = Config(patch_size=16, dtype="float32", model_base=8)
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        ScenePredictor(cfg, checkpoint=str(tmp_path / "empty"))


def test_int8_predictor_self_calibrates():
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=32, quant="int8")
    rng = np.random.RandomState(2)
    d1 = rng.randn(45, 53, 13).astype(np.float32)
    d2 = rng.randn(45, 53, 13).astype(np.float32)
    mask = pred.predict(d1, d2)
    assert mask.shape == (45, 53)
    assert set(np.unique(mask)) <= {0, 1}
    # after self-calibration the serving forward is the quantized callable
    assert not hasattr(pred.model, "apply")
    # second predict must NOT recalibrate (runner cache persists)
    n = len(pred._compiled)
    pred.predict(d1, d2)
    assert len(pred._compiled) == n


def test_int8_requires_fold_bn():
    cfg = Config(patch_size=16, dtype="float32", model_base=8)
    with pytest.raises(ValueError):
        ScenePredictor(cfg, fold_bn=False, quant="int8")


def test_int8_clip_guardrail_and_recalibration(caplog):
    """r2 VERDICT #8: static scales frozen on the first scene must not clip
    silently — the per-scene probe reports overflow and warns; an explicit
    recalibration cadence re-derives the scales."""
    import logging
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=32, quant="int8")
    rng = np.random.RandomState(3)
    d1 = rng.randn(32, 32, 13).astype(np.float32)
    d2 = rng.randn(32, 32, 13).astype(np.float32)
    pred.predict(d1, d2)  # calibrates on this scene
    scales_first = dict(pred._scales)

    # same-range scene: probe runs, nothing overflows, no warning
    with caplog.at_level(logging.WARNING, logger="fabric_tpu"):
        pred.predict(d1 * 0.5, d2 * 0.5)
    assert pred.last_clip_report is not None
    assert max(pred.last_clip_report.values()) <= 1.0 + 1e-3
    assert not any("clipping" in r.message for r in caplog.records)

    # much hotter scene: overflow reported AND warned
    with caplog.at_level(logging.WARNING, logger="fabric_tpu"):
        pred.predict(d1 * 8.0, d2 * 8.0)
    assert max(pred.last_clip_report.values()) > 1.5
    assert any("clipping" in r.message for r in caplog.records)
    assert pred._scales == scales_first  # probe never mutates the scales

    # recalibrate_every=1: every scene re-derives the scales instead
    pred2 = ScenePredictor(cfg, checkpoint=None, bucket=32, quant="int8",
                           recalibrate_every=1)
    pred2.predict(d1, d2)
    s1 = dict(pred2._scales)
    pred2.predict(d1 * 8.0, d2 * 8.0)
    s2 = dict(pred2._scales)
    assert any(s2[k] > s1[k] * 2 for k in s1)  # scales follow the data


def test_clip_report_function(caplog):
    """infer.quant.clip_report: ratios ~<=1 on the calibration data, and
    proportionally >1 on hotter data."""
    import jax.numpy as jnp
    from fabric_tpu.infer import quant as q
    from fabric_tpu.ops.fold_bn import fold_batchnorm
    from fabric_tpu.models import build_model
    from fabric_tpu.train.state import create_state
    cfg = Config(patch_size=16, dtype="float32", model_base=8)
    model = build_model(cfg)
    state = create_state(cfg, model, sample_shape=(16, 16))
    folded = fold_batchnorm(state.params, state.batch_stats)
    rng = np.random.RandomState(4)
    d1 = rng.randn(4, 16, 16, 13).astype(np.float32)
    d2 = rng.randn(4, 16, 16, 13).astype(np.float32)
    scales = q.calibrate(folded, [(d1, d2)], dtype=jnp.float32)
    rep_same = q.clip_report(folded, scales, [(d1, d2)], dtype=jnp.float32)
    assert rep_same and all(v <= 1.0 + 1e-5 for v in rep_same.values())
    rep_hot = q.clip_report(folded, scales, [(d1 * 4, d2 * 4)],
                            dtype=jnp.float32)
    assert max(rep_hot.values()) > 1.5


def test_recalibration_cadence_spares_preset_scales():
    """recalibrate_every=N must not fire on scene 0 when scales already
    exist (r3 review: 0 % N == 0 destroyed a bundle's curated offline
    calibration on the very first predict)."""
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=32, quant="int8",
                          recalibrate_every=2, clip_warn_ratio=0)
    rng = np.random.RandomState(5)
    c1 = rng.randn(4, 16, 16, 13).astype(np.float32)
    pred.calibrate([(c1, c1 * 0.9)])  # offline/bundle-style preset scales
    preset = dict(pred._scales)
    d1 = (rng.randn(32, 32, 13) * 4).astype(np.float32)  # hotter than preset
    pred.predict(d1, d1)  # scene 0: preset survives
    assert pred._scales == preset
    pred.predict(d1, d1)  # scene 1: not due
    assert pred._scales == preset
    pred.predict(d1, d1)  # scene 2: cadence due -> re-derived from the data
    assert pred._scales != preset


def test_predictor_banded_overlap_matches_unbanded():
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8, infer_overlap=8)
    rng = np.random.RandomState(6)
    d1 = rng.randn(45, 53, 13).astype(np.float32)
    d2 = rng.randn(45, 53, 13).astype(np.float32)
    # fresh-weights predictors differ per instance; share the variables
    base = ScenePredictor(cfg, checkpoint=None, bucket=32)
    banded = ScenePredictor(cfg, checkpoint=None, bucket=32,
                            overlap_band_rows=2)
    banded.variables = base.variables
    np.testing.assert_array_equal(banded.predict(d1, d2),
                                  base.predict(d1, d2))
    with pytest.raises(ValueError, match="infer_overlap"):
        ScenePredictor(Config(patch_size=16, dtype="float32", model_base=8),
                       overlap_band_rows=2)


def test_serving_metrics_stream(tmp_path):
    """Every served scene streams a serve_* record through the tracker
    (r3 VERDICT #6): dims, bucket, compile-or-cached, wall/Mpx, mode,
    quant — the serving replacement for the reference's per-scene comet
    logging (utils/inference.py:107-131)."""
    import json

    from fabric_tpu.track import Tracker

    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    tracker = Tracker(str(tmp_path), run_name="serve_test")
    pred = ScenePredictor(cfg, bucket=32, tracker=tracker)
    rng = np.random.RandomState(11)
    pred.predict(rng.randn(45, 53, 13).astype(np.float32),
                 rng.randn(45, 53, 13).astype(np.float32),
                 scene_id="alpha")
    pred.predict(rng.randn(40, 50, 13).astype(np.float32),
                 rng.randn(40, 50, 13).astype(np.float32))
    tracker.close()

    path = tmp_path / "serve_test" / "metrics.jsonl"
    recs = [json.loads(line) for line in path.read_text().splitlines()]
    assert len(recs) == 2
    first, second = recs
    assert first["serve_scene"] == "alpha"
    assert (first["serve_height"], first["serve_width"]) == (45, 53)
    assert (first["serve_bucket_h"], first["serve_bucket_w"]) == (64, 64)
    assert first["serve_compiled"] is True       # fresh bucket compiled
    assert second["serve_compiled"] is False     # same bucket: cache hit
    assert first["serve_mode"] == "grid"
    assert first["serve_quant"] == "none"
    assert first["serve_wall_ms"] > 0
    assert first["serve_mpx_per_sec"] > 0


def test_serving_metrics_int8_clip_fields(tmp_path):
    """int8 records carry the worst clip-probe site/ratio once static
    scales are being probed (scene 2+)."""
    import json

    from fabric_tpu.track import Tracker

    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    tracker = Tracker(str(tmp_path), run_name="serve_q")
    pred = ScenePredictor(cfg, bucket=32, quant="int8", tracker=tracker)
    rng = np.random.RandomState(12)
    for _ in range(2):
        pred.predict(rng.randn(30, 30, 13).astype(np.float32),
                     rng.randn(30, 30, 13).astype(np.float32))
    tracker.close()
    recs = [json.loads(line) for line in
            (tmp_path / "serve_q" / "metrics.jsonl").read_text().splitlines()]
    assert recs[0]["serve_quant"] == "int8"
    assert "serve_clip_worst_site" not in recs[0]  # scene 0 calibrated
    assert recs[1]["serve_clip_worst_site"]        # scene 1 probed
    assert recs[1]["serve_clip_worst_ratio"] > 0


def test_fleet_recalibration_scene_has_no_stale_clip_record(tmp_path):
    """A scene that (re)calibrates runs no clip probe; its serve record
    must carry NO clip fields — not the PREVIOUS scene's probe (the
    fallback-misattribution the r5 self-review caught)."""
    import json

    from fabric_tpu.track import Tracker

    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    tracker = Tracker(str(tmp_path), run_name="serve_recal")
    pred = ScenePredictor(cfg, bucket=32, quant="int8", tracker=tracker,
                          recalibrate_every=2)
    rng = np.random.RandomState(16)
    pairs = [(rng.randn(30, 30, 13).astype(np.float32),
              rng.randn(30, 30, 13).astype(np.float32)) for _ in range(4)]
    pred.predict_many(pairs)
    tracker.close()
    recs = [json.loads(line) for line in
            (tmp_path / "serve_recal" / "metrics.jsonl")
            .read_text().splitlines()]
    assert len(recs) == 4
    # scene 0 calibrates, scene 2 re-calibrates (cadence 2): no probe ran
    for i in (0, 2):
        assert "serve_clip_worst_site" not in recs[i], i
    for i in (1, 3):  # probed scenes carry their own report
        assert recs[i]["serve_clip_worst_site"], i


def test_sync_recalibration_scene_has_no_stale_clip_record(tmp_path):
    """Same guarantee on the SYNCHRONOUS path: calibrate() clears the
    pending probe report, so a predict() right after a cadence
    recalibration carries no clip fields (vs inheriting the previous
    scene's probe against the old scales)."""
    import json

    from fabric_tpu.track import Tracker

    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    tracker = Tracker(str(tmp_path), run_name="serve_sync_recal")
    pred = ScenePredictor(cfg, bucket=32, quant="int8", tracker=tracker,
                          recalibrate_every=2)
    rng = np.random.RandomState(18)
    for _ in range(4):
        pred.predict(rng.randn(30, 30, 13).astype(np.float32),
                     rng.randn(30, 30, 13).astype(np.float32))
    tracker.close()
    recs = [json.loads(line) for line in
            (tmp_path / "serve_sync_recal" / "metrics.jsonl")
            .read_text().splitlines()]
    for i in (0, 2):  # calibration scenes ran no probe
        assert "serve_clip_worst_site" not in recs[i], i
    for i in (1, 3):
        assert recs[i]["serve_clip_worst_site"], i


def test_predict_many_pack_lazy_iterator(predictor):
    """predict_many(pack=) consumes a lazy iterator (cli.infer streams
    city loads) — results keep input order and match per-scene serving."""
    rng = np.random.RandomState(17)
    pairs = [(rng.randn(30, 30, 13).astype(np.float32),
              rng.randn(30, 30, 13).astype(np.float32)) for _ in range(3)]
    seq = [predictor.predict(*p) for p in pairs]
    got = predictor.predict_many(iter(pairs), pack=2)
    assert len(got) == 3
    for a, b in zip(got, seq):
        np.testing.assert_array_equal(a, b)


def test_predict_many_multidate_matches_sequential():
    """Pipelined multi-date fleet serving is bit-identical to sequential
    predict_multidate calls, mixed shapes included."""
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model="unet_lstm", model_base=8, num_dates=3)
    pred = ScenePredictor(cfg, bucket=32)
    rng = np.random.RandomState(21)
    stacks = [rng.randn(3, *shape, 13).astype(np.float32)
              for shape in [(40, 50), (30, 30), (40, 50)]]
    seq = [pred.predict_multidate(s) for s in stacks]
    fleet = pred.predict_many_multidate(stacks, window=2)
    assert len(fleet) == len(seq)
    for a, b in zip(fleet, seq):
        np.testing.assert_array_equal(a, b)
    # fleet-packed multi-date dispatch is bit-identical too
    for a, b in zip(pred.predict_many_multidate(stacks, pack=2), seq):
        np.testing.assert_array_equal(a, b)


def test_predict_many_multidate_rejects_bidate():
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    pred = ScenePredictor(cfg, bucket=32)
    with pytest.raises(ValueError, match="multi-date"):
        pred.predict_many_multidate([np.zeros((2, 32, 32, 13),
                                              np.float32)])
