"""Ahead-of-time serving artifacts (infer/aot.py): scene runners frozen
to StableHLO via jax.export, persisted next to the bundle, and served by
``ScenePredictor(..., aot_dir=...)``.

Correctness = masks from the artifact are BIT-IDENTICAL to the in-process
jit path (the artifact pins the exact exported math), including the int8
mode whose calibration scales are frozen into the artifact at export time
— export rejects predictors that would still recalibrate, and the serving
side seeds its scales from ``aot_meta.json`` so clip probing and
fallback-jit buckets stay consistent with the frozen math.
"""

import numpy as np
import pytest

from fabric_tpu.config import Config
from fabric_tpu.infer.aot import (export_aot, export_runners, load_aot,
                                  read_meta, save_aot)
from fabric_tpu.infer.service import ScenePredictor


@pytest.fixture(scope="module")
def cfg():
    return Config(patch_size=16, dtype="float32", model_base=8,
                  eval_batch_size=8)


def _scene(shape, seed):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape, 13).astype(np.float32)


def test_roundtrip_and_bit_identity(cfg, tmp_path):
    """Grid mode: export -> save -> serve via aot_dir; masks must equal
    the in-process predictor's byte for byte."""
    d1, d2 = _scene((40, 56), 0), _scene((40, 56), 1)
    base = ScenePredictor(cfg, bucket=32)
    runners = export_runners(base, [(40, 56)], platforms=("cpu",))
    assert list(runners) == [(64, 64)]  # keyed by padded bucket dims
    save_aot(str(tmp_path), runners, {"model": "bidate", "quant": "none",
                                      "fullconv_band_rows": 0})
    assert load_aot(str(tmp_path), 64, 64) is not None
    assert load_aot(str(tmp_path), 96, 96) is None

    served = ScenePredictor(cfg, bucket=32, aot_dir=str(tmp_path))
    np.testing.assert_array_equal(served.predict(d1, d2),
                                  base.predict(d1, d2))


def test_export_aot_meta_and_fallback(cfg, tmp_path, caplog):
    """export_aot writes the frozen-config meta; a bucket missing from
    the artifact falls back to in-process jit (warning logged) and still
    matches the in-process masks."""
    base = ScenePredictor(cfg, bucket=32)
    meta = export_aot(base, str(tmp_path), [(40, 56)], platforms=("cpu",))
    assert meta["model"] == "bidate" and meta["quant"] == "none"
    assert read_meta(str(tmp_path))["shapes"] == [[64, 64]]

    served = ScenePredictor(cfg, bucket=32, aot_dir=str(tmp_path))
    d1, d2 = _scene((90, 90), 2), _scene((90, 90), 3)  # 96x96: not exported
    import logging
    with caplog.at_level(logging.WARNING, logger="fabric_tpu"):
        got = served.predict(d1, d2)
    assert any("falling back" in r.message for r in caplog.records)
    np.testing.assert_array_equal(got, base.predict(d1, d2))


def test_int8_aot_bit_identity_and_scale_pinning(cfg, tmp_path):
    """int8: the artifact freezes the calibration scales; serving from it
    reproduces the calibrated in-process masks bit-for-bit, seeds
    self._scales from the meta (no first-scene recalibration), and
    refuses the mutating surfaces (calibrate / recalibrate_every)."""
    d1, d2 = _scene((40, 56), 4), _scene((40, 56), 5)
    base = ScenePredictor(cfg, bucket=32, quant="int8")
    rng = np.random.RandomState(6)
    calib = [(rng.randn(4, 16, 16, 13).astype(np.float32),
              rng.randn(4, 16, 16, 13).astype(np.float32))]
    base.calibrate(calib)
    meta = export_aot(base, str(tmp_path), [(40, 56)], platforms=("cpu",))
    assert meta["int8_scales"] == base._scales

    served = ScenePredictor(cfg, bucket=32, quant="int8",
                            aot_dir=str(tmp_path))
    assert served._scales == base._scales  # seeded, not recalibrated
    np.testing.assert_array_equal(served.predict(d1, d2),
                                  base.predict(d1, d2))
    assert served._scales == base._scales  # scene 0 did NOT recalibrate

    with pytest.raises(ValueError, match="pinned"):
        served.calibrate(calib)
    with pytest.raises(ValueError, match="recalibrate_every"):
        ScenePredictor(cfg, bucket=32, quant="int8",
                       aot_dir=str(tmp_path), recalibrate_every=2)


def test_int8_export_guards(cfg, tmp_path):
    """export_runners rejects int8 predictors whose scales could still
    move: uncalibrated, or recalibrate_every > 0 (ADVICE r3)."""
    uncal = ScenePredictor(cfg, bucket=32, quant="int8")
    with pytest.raises(ValueError, match="calibrated"):
        export_runners(uncal, [(40, 56)], platforms=("cpu",))

    cal = ScenePredictor(cfg, bucket=32, quant="int8", recalibrate_every=3)
    rng = np.random.RandomState(7)
    cal.calibrate([(rng.randn(4, 16, 16, 13).astype(np.float32),
                    rng.randn(4, 16, 16, 13).astype(np.float32))])
    with pytest.raises(ValueError, match="recalibrate_every"):
        export_runners(cal, [(40, 56)], platforms=("cpu",))


def test_config_mismatch_rejected(cfg, tmp_path):
    """An artifact frozen from a different serving configuration must be
    rejected, not silently served."""
    base = ScenePredictor(cfg, bucket=32)
    export_aot(base, str(tmp_path), [(40, 56)], platforms=("cpu",))
    with pytest.raises(ValueError, match="quant"):
        ScenePredictor(cfg, bucket=32, quant="int8", aot_dir=str(tmp_path))
    lstm = Config(patch_size=16, dtype="float32", model_base=8,
                  model="unet_lstm", num_dates=3, eval_batch_size=8)
    with pytest.raises(ValueError, match="model"):
        ScenePredictor(lstm, bucket=32, aot_dir=str(tmp_path))


def test_weights_mismatch_rejected(cfg, tmp_path):
    """The artifact bakes the export-time weights into the StableHLO as
    constants: serving a DIFFERENT checkpoint through it would silently
    produce the frozen weights' masks on artifact buckets and the live
    weights' masks on fallback buckets — reject at startup instead."""
    base = ScenePredictor(cfg, bucket=32)
    meta = export_aot(base, str(tmp_path), [(40, 56)], platforms=("cpu",))
    assert len(meta["weights_sha256"]) == 64
    # same config, differently-seeded weights
    other = Config(patch_size=16, dtype="float32", model_base=8,
                   eval_batch_size=8, seed=1)
    with pytest.raises(ValueError, match="different weights"):
        ScenePredictor(other, bucket=32, aot_dir=str(tmp_path))
    # identical weights pass the fingerprint check
    ScenePredictor(cfg, bucket=32, aot_dir=str(tmp_path))


def test_platform_mismatch_rejected(cfg, tmp_path):
    """An artifact exported for a different platform must be rejected at
    startup with an actionable message — otherwise the mismatch surfaces
    as an opaque error deep inside exported.call on the first scene
    (observed serving a cpu-exported artifact on the axon TPU)."""
    base = ScenePredictor(cfg, bucket=32)
    export_aot(base, str(tmp_path), [(40, 56)], platforms=("tpu",))
    with pytest.raises(ValueError, match="platforms"):
        ScenePredictor(cfg, bucket=32, aot_dir=str(tmp_path))


def test_fingerprint_checkpoint_vs_bundle_deterministic(cfg, tmp_path):
    """The weights fingerprint must agree between a checkpoint-loaded
    predictor (folds BN at init) and a bundle-loaded one (stores the fold)
    — i.e. fold_batchnorm must be platform-deterministic host math.  When
    the fold ran in jnp, TPU- and CPU-folded copies of the SAME checkpoint
    differed in the last ulp and the sha256 check rejected a correct
    serve."""
    import jax

    from fabric_tpu import checkpoint as ckpt
    from fabric_tpu.infer.aot import params_fingerprint
    from fabric_tpu.models import build_model
    from fabric_tpu.tools.export import export_bundle
    from fabric_tpu.train.state import create_state

    cfg2 = Config(patch_size=16, dtype="float32", model_base=8,
                  eval_batch_size=8, weight_dir=str(tmp_path / "w"))
    state = create_state(cfg2, build_model(cfg2))
    ckpt.save(state, cfg2.weight_dir, epoch=0)
    export_bundle(cfg2, cfg2.weight_dir, str(tmp_path / "b.npz"))

    p_ck = ScenePredictor(cfg2, checkpoint=cfg2.weight_dir, bucket=32)
    p_bn = ScenePredictor(cfg2, bundle=str(tmp_path / "b.npz"), bucket=32)
    assert (params_fingerprint(p_ck.variables)
            == params_fingerprint(p_bn.variables))
    # and the fold itself is reproducible run-to-run
    jax.clear_caches()
    p_ck2 = ScenePredictor(cfg2, checkpoint=cfg2.weight_dir, bucket=32)
    assert (params_fingerprint(p_ck.variables)
            == params_fingerprint(p_ck2.variables))


def test_bucket_mismatch_rejected(cfg, tmp_path):
    """A bucket-size mismatch would silently miss every artifact key and
    fall back to in-process jit for ALL scenes (AOT becomes a no-op) —
    reject it up front instead."""
    base = ScenePredictor(cfg, bucket=32)
    export_aot(base, str(tmp_path), [(40, 56)], platforms=("cpu",))
    with pytest.raises(ValueError, match="bucket"):
        ScenePredictor(cfg, bucket=64, aot_dir=str(tmp_path))


def test_streamed_and_sharded_rejected(cfg, tmp_path):
    base = ScenePredictor(cfg, bucket=32)
    export_aot(base, str(tmp_path), [(40, 56)], platforms=("cpu",))
    with pytest.raises(ValueError, match="in-process"):
        ScenePredictor(cfg, bucket=32, aot_dir=str(tmp_path),
                       fullconv_band_rows=160, fullconv_stream=True)
    streamed = ScenePredictor(cfg, bucket=32, fullconv_band_rows=160,
                              fullconv_stream=True)
    with pytest.raises(ValueError, match="in-process"):
        export_runners(streamed, [(40, 56)], platforms=("cpu",))


def test_fullconv_aot_bit_identity(cfg, tmp_path):
    """The seamless fullconv runner also freezes (it is pure jit): served
    masks equal the in-process fullconv predictor's exactly, and the
    artifact records the banding config so a grid predictor can't load
    it."""
    d1, d2 = _scene((200, 64), 8), _scene((200, 64), 9)
    base = ScenePredictor(cfg, bucket=32, fullconv_band_rows=160)
    export_aot(base, str(tmp_path), [(200, 64)], platforms=("cpu",))
    served = ScenePredictor(cfg, bucket=32, fullconv_band_rows=160,
                            aot_dir=str(tmp_path))
    np.testing.assert_array_equal(served.predict(d1, d2),
                                  base.predict(d1, d2))
    with pytest.raises(ValueError, match="fullconv_band_rows"):
        ScenePredictor(cfg, bucket=32, aot_dir=str(tmp_path))


def test_export_cli_emits_aot(cfg, tmp_path):
    """tools/export --aot_dir: one command produces the bundle AND the
    frozen runners; serving from both matches in-process masks."""
    import json

    from fabric_tpu import checkpoint as ckpt
    from fabric_tpu.models import build_model
    from fabric_tpu.tools.export import main
    from fabric_tpu.train.state import create_state

    state = create_state(cfg, build_model(cfg))
    ckpt.save(state, str(tmp_path / "run"), epoch=0)
    cfgpath = tmp_path / "cfg.json"
    cfgpath.write_text(json.dumps({"patch_size": 16, "dtype": "float32",
                                   "model_base": 8, "eval_batch_size": 8}))
    out = str(tmp_path / "bundle.npz")
    aot = str(tmp_path / "aot")
    rc = main(["--config", str(cfgpath), "--resume", str(tmp_path / "run"),
               "--out", out, "--aot_dir", aot, "--aot_scene", "40x56",
               "--aot_platform", "cpu", "--aot_bucket", "32"])
    assert rc == 0
    assert read_meta(aot)["shapes"] == [[64, 64]]

    d1, d2 = _scene((40, 56), 10), _scene((40, 56), 11)
    served = ScenePredictor(cfg, bundle=out, bucket=32, aot_dir=aot)
    base = ScenePredictor(cfg, bundle=out, bucket=32)
    np.testing.assert_array_equal(served.predict(d1, d2),
                                  base.predict(d1, d2))

    # --aot_fullconv freezes the seamless-fullconv runner instead of the
    # grid runner (the serving mode the artifact pins in its meta)
    aotfc = str(tmp_path / "aot_fc")
    rc = main(["--config", str(cfgpath), "--resume", str(tmp_path / "run"),
               "--out", str(tmp_path / "bundle_fc.npz"),
               "--aot_dir", aotfc, "--aot_scene", "200x64",
               "--aot_platform", "cpu", "--aot_bucket", "32",
               "--aot_fullconv", "160"])
    assert rc == 0
    assert read_meta(aotfc)["fullconv_band_rows"] == 160
    sfc = _scene((200, 64), 12), _scene((200, 64), 13)
    served_fc = ScenePredictor(cfg, bundle=str(tmp_path / "bundle_fc.npz"),
                               bucket=32, fullconv_band_rows=160,
                               aot_dir=aotfc)
    base_fc = ScenePredictor(cfg, bundle=str(tmp_path / "bundle_fc.npz"),
                             bucket=32, fullconv_band_rows=160)
    np.testing.assert_array_equal(served_fc.predict(*sfc),
                                  base_fc.predict(*sfc))


def test_packed_aot_bit_identity_and_fallback(cfg, tmp_path, caplog):
    """export_aot(..., packs=[2]) freezes fleet-packed runners
    (runner_HxW_pack2.jaxexp): predict_many(pack=2) from aot_dir serves
    them with masks bit-identical to the in-process packed path; an
    uncovered pack count falls back to in-process jit with a warning;
    packs= is rejected for non-grid predictors."""
    base = ScenePredictor(cfg, bucket=32)
    export_aot(base, str(tmp_path), [(40, 56)], platforms=("cpu",),
               packs=[2])
    assert read_meta(str(tmp_path))["packed_shapes"] == [[64, 64, 2]]
    assert load_aot(str(tmp_path), 64, 64, pack=2) is not None
    assert load_aot(str(tmp_path), 64, 64, pack=3) is None

    pairs = [(_scene((40, 56), 20 + i), _scene((40, 56), 30 + i))
             for i in range(3)]  # 3 scenes -> one full + one partial pack
    served = ScenePredictor(cfg, bucket=32, aot_dir=str(tmp_path))
    for a, b in zip(served.predict_many(pairs, pack=2),
                    base.predict_many(pairs, pack=2)):
        np.testing.assert_array_equal(a, b)

    import logging
    with caplog.at_level(logging.WARNING, logger="fabric_tpu"):
        got = served.predict_many(pairs, pack=3)  # pack 3: not exported
    assert any("falling back" in r.message for r in caplog.records)
    for a, b in zip(got, base.predict_many(pairs, pack=3)):
        np.testing.assert_array_equal(a, b)

    fc = ScenePredictor(cfg, bucket=32, fullconv_band_rows=160)
    with pytest.raises(ValueError, match="grid"):
        export_runners(fc, [(40, 56)], platforms=("cpu",), packs=[2])


def test_packed_aot_int8(cfg, tmp_path):
    """int8 packed artifacts pin the calibration scales like the
    single-scene ones: fleet serving from the artifact matches the
    calibrated in-process packed masks bit-for-bit."""
    base = ScenePredictor(cfg, bucket=32, quant="int8")
    rng = np.random.RandomState(21)
    base.calibrate([(rng.randn(4, 16, 16, 13).astype(np.float32),
                     rng.randn(4, 16, 16, 13).astype(np.float32))])
    export_aot(base, str(tmp_path), [(40, 56)], platforms=("cpu",),
               packs=[2])
    served = ScenePredictor(cfg, bucket=32, quant="int8",
                            aot_dir=str(tmp_path))
    pairs = [(_scene((40, 56), 40 + i), _scene((40, 56), 50 + i))
             for i in range(2)]
    for a, b in zip(served.predict_many(pairs, pack=2),
                    base.predict_many(pairs, pack=2)):
        np.testing.assert_array_equal(a, b)


def test_multidate_aot_bit_identity(tmp_path):
    """Multi-date runners freeze too (export_scene_runner's num_dates
    signature): a UNetLSTM artifact serves masks bit-identical to the
    in-process predictor."""
    lstm = Config(patch_size=16, dtype="float32", model_base=8,
                  model="unet_lstm", num_dates=3, eval_batch_size=8)
    rng = np.random.RandomState(12)
    stack = rng.randn(3, 40, 56, 13).astype(np.float32)
    base = ScenePredictor(lstm, bucket=32)
    export_aot(base, str(tmp_path), [(40, 56)], platforms=("cpu",))
    served = ScenePredictor(lstm, bucket=32, aot_dir=str(tmp_path))
    np.testing.assert_array_equal(served.predict_multidate(stack),
                                  base.predict_multidate(stack))
