"""Int8 serving for the multi-date variants (infer/quant_multidate.py,
r3 VERDICT #1): site derivation, stats-forward exactness vs model.apply,
accuracy bounds vs the exact forward on TRAINED models, the tiled and
fullconv scene runners, ScenePredictor wiring, and bundle round-trips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fabric_tpu.config import Config
from fabric_tpu.infer import quant
from fabric_tpu.losses import get_loss_fn
from fabric_tpu.models import build_model
from fabric_tpu.models.unet_lstm import UNetLSTM
from fabric_tpu.models.unet3d import UNet3D
from fabric_tpu.ops.fold_bn import fold_batchnorm
from fabric_tpu.train.state import create_state
from fabric_tpu.train.steps import make_train_step

T = 3  # dates (any T; the fp32 fusion product is T-generic)


def _blob_seq(rng, n, hw, t=T, c=13):
    """(N, T, hw, hw, C) stacks where a blob appears in the later dates,
    plus the (N, hw, hw) change masks."""
    yy, xx = np.mgrid[:hw, :hw]
    seqs, masks = [], []
    for i in range(n):
        base = rng.randn(hw, hw, c).astype(np.float32)
        cy, cx, r = rng.randint(4, hw - 4), rng.randint(4, hw - 4), hw // 4
        m = ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r
        dates = []
        for ti in range(t):
            x = base + rng.randn(hw, hw, c).astype(np.float32) * 0.1
            if ti >= t // 2:
                x[m] += 2.0
            dates.append(x)
        seqs.append(np.stack(dates))
        masks.append(m)
    return (jnp.asarray(np.stack(seqs)),
            jnp.asarray(np.stack(masks).astype(np.int32)))


def _train_variant(model_name):
    cfg = Config(model=model_name, dtype="float32", patch_size=32,
                 batch_size=4, model_base=8, num_dates=T)
    model = build_model(cfg)
    state = create_state(cfg, model, sample_shape=(32, 32))
    step = make_train_step(model, get_loss_fn(cfg))
    rng = np.random.RandomState(0)
    for _ in range(12):
        seq, lab = _blob_seq(rng, 8, 32)
        batch = {"imgs": seq, "label": lab,
                 "weight": jnp.ones(8, jnp.float32)}
        state, _ = step(state, batch)
    return cfg, fold_batchnorm(state.params, state.batch_stats)


@pytest.fixture(scope="module")
def trained_lstm():
    return _train_variant("unet_lstm")


@pytest.fixture(scope="module")
def trained_3d():
    return _train_variant("unet3d")


def _get(fixtures, name):
    return fixtures[0] if name == "unet_lstm" else fixtures[1]


@pytest.fixture(scope="module")
def trained(trained_lstm, trained_3d):
    return {"unet_lstm": trained_lstm, "unet3d": trained_3d}


def _model_cls(name):
    return UNetLSTM if name == "unet_lstm" else UNet3D


def test_derived_sites_match_bidate_table():
    """derive_conv_sites reproduces the historical explicit bi-date
    table (name -> path) exactly."""
    cfg = Config(dtype="float32", patch_size=32, model_base=8)
    model = build_model(cfg)
    state = create_state(cfg, model, sample_shape=(32, 32))
    folded = fold_batchnorm(state.params, state.batch_stats)
    derived = dict(quant.derive_conv_sites(folded))
    assert derived == dict(quant._SITES)


@pytest.mark.parametrize("name", ["unet_lstm", "unet3d"])
def test_stats_forward_matches_model_apply(trained, name):
    """The calibration (stats) forward IS the BN-folded model's math —
    logits match model.apply to float noise."""
    cfg, folded = trained[name]
    seq, _ = _blob_seq(np.random.RandomState(1), 2, 32)
    model = _model_cls(name)(base=8, dtype=jnp.float32, fold_bn=True,
                             local_upsample=True)
    ref = model.apply({"params": folded, "batch_stats": {}}, seq,
                      train=False)
    fwd = quant.make_stats_forward(folded, jnp.float32,
                                   local_upsample=True, model=name)
    logits, stats = fwd(seq)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=2e-5)
    expected_taps = {s for s, _ in quant.derive_conv_sites(folded)}
    expected_taps |= {"enc.x5"}
    if name == "unet_lstm":
        expected_taps |= {"lstm.h", "f1", "f2", "f3", "f4"}
        expected_taps.discard("bottleneck_lstm.gates")
        expected_taps |= {"bottleneck_lstm.gates"}  # x side tapped via enc.x5
    assert set(stats) >= expected_taps - {"bottleneck_lstm.gates"}


@pytest.mark.parametrize("name", ["unet_lstm", "unet3d"])
def test_int8_tracks_exact(trained, name):
    """Accuracy bound per variant (the multi-date analogue of
    tests/test_quant.py::test_int8_tracks_bf16)."""
    cfg, folded = trained[name]
    rng = np.random.RandomState(2)
    calib = [_blob_seq(rng, 2, 32)[0] for _ in range(3)]
    scales = quant.calibrate(folded, calib, jnp.float32, model=name)
    assert all(s > 0 for s in scales.values())
    if name == "unet_lstm":
        assert "lstm.h" in scales and "f4" in scales

    apply_q = quant.make_int8_apply(folded, scales, jnp.float32,
                                    local_upsample=True, model=name)
    model = _model_cls(name)(base=8, dtype=jnp.float32, fold_bn=True,
                             local_upsample=True)
    seq, _ = _blob_seq(np.random.RandomState(3), 3, 32)
    ref = model.apply({"params": folded, "batch_stats": {}}, seq,
                      train=False)
    lq = apply_q(None, seq)
    p_ref = jax.nn.softmax(ref, -1)[..., 1]
    p_q = jax.nn.softmax(lq, -1)[..., 1]
    assert float(jnp.mean(jnp.abs(p_ref - p_q))) < 0.02
    same = (jnp.argmax(ref, -1) == jnp.argmax(lq, -1)).astype(jnp.float32)
    assert float(jnp.mean(same)) > 0.90
    # on DECISIVE pixels (the few-steps fixture leaves many pixels within
    # a whisker of p=0.5, where any rounding flips the argmax — that
    # measures fixture noise, not quantization damage) agreement must be
    # near-perfect
    decisive = jnp.abs(p_ref - 0.5) > 0.1
    agree_dec = float(jnp.sum(same * decisive) / jnp.sum(decisive))
    assert agree_dec > 0.99


@pytest.mark.parametrize("name", ["unet_lstm", "unet3d"])
def test_int8_apply_in_tiled_scene_infer(trained, name):
    from fabric_tpu.infer.device_tiling import make_scene_infer_multidate

    cfg, folded = trained[name]
    rng = np.random.RandomState(4)
    scales = quant.calibrate(folded, [_blob_seq(rng, 2, 32)[0]],
                             jnp.float32, model=name)
    # tiled mode keeps the align-corners (reference-parity) upsample
    apply_q = quant.make_int8_apply(folded, scales, jnp.float32,
                                    local_upsample=False, model=name)
    model = _model_cls(name)(base=8, dtype=jnp.float32, fold_bn=True)
    h = w = 64
    scene, _ = _blob_seq(np.random.RandomState(5), 1, h)
    stack = scene[0]  # (T, H, W, C)
    variables = {"params": folded, "batch_stats": {}}
    run_ref = make_scene_infer_multidate(model, 32, (h, w), num_dates=T,
                                         batch_size=4, dtype=jnp.float32)
    run_q = make_scene_infer_multidate(apply_q, 32, (h, w), num_dates=T,
                                       batch_size=4, dtype=jnp.float32)
    m_ref = np.asarray(run_ref(variables, stack))
    m_q = np.asarray(run_q(variables, stack))
    assert m_ref.shape == (h, w)
    assert (m_ref == m_q).mean() > 0.96


@pytest.mark.parametrize("name", ["unet_lstm", "unet3d"])
def test_int8_fullconv_banded_equals_whole(trained, name):
    """The quantized multi-date forward is translation invariant at
    16-px-aligned crops (static per-tensor scales, SAME convs, aligned
    pooling, local upsample) — banded fullconv == whole-scene int8
    forward EXACTLY."""
    from fabric_tpu.infer.fullconv import (
        make_fullconv_scene_infer_multidate)

    cfg, folded = trained[name]
    rng = np.random.RandomState(6)
    scales = quant.calibrate(folded, [_blob_seq(rng, 2, 32)[0]],
                             jnp.float32, model=name)
    apply_q = quant.make_int8_apply(folded, scales, jnp.float32,
                                    local_upsample=True, model=name)
    h, w = 160, 96
    scene, _ = _blob_seq(np.random.RandomState(7), 1, h)
    stack = scene[0][:, :, :w]  # (T, 160, 96, C)
    variables = {"params": folded, "batch_stats": {}}
    whole = make_fullconv_scene_infer_multidate(
        apply_q, (h, w), num_dates=T, band_rows=h + 2 * 128,
        dtype=jnp.float32)
    banded = make_fullconv_scene_infer_multidate(
        apply_q, (h, w), num_dates=T, band_rows=48, halo=128,
        dtype=jnp.float32)
    m_whole = np.asarray(whole(variables, stack))
    m_banded = np.asarray(banded(variables, stack))
    np.testing.assert_array_equal(m_whole, m_banded)


@pytest.mark.parametrize("name", ["unet_lstm", "unet3d"])
def test_scene_predictor_multidate_int8(trained, name, tmp_path):
    """ScenePredictor serves the multi-date variants quantized: first
    scene self-calibrates, later scenes run the clip probe."""
    import fabric_tpu.checkpoint as ckpt
    from fabric_tpu.infer.service import ScenePredictor

    cfg, folded = trained[name]
    # predictor restores a checkpoint: save an unfolded-state equivalent
    model = build_model(cfg)
    state = create_state(cfg, model, sample_shape=(32, 32))
    ckpt.save(state, str(tmp_path / name), 0)

    pred = ScenePredictor(cfg, checkpoint=str(tmp_path / name),
                          bucket=32, quant="int8")
    scene, _ = _blob_seq(np.random.RandomState(8), 1, 64)
    mask1 = pred.predict_multidate(np.asarray(scene[0]))
    assert mask1.shape == (64, 64)
    assert pred._scales is not None and "enc.x5" in pred._scales
    # second scene: no recalibration, clip probe runs
    mask2 = pred.predict_multidate(np.asarray(scene[0]) * 1.5)
    assert mask2.shape == (64, 64)
    assert pred.last_clip_report is not None
    assert max(pred.last_clip_report.values()) > 1.0  # hotter scene seen


@pytest.mark.parametrize("name", ["unet_lstm", "unet3d"])
def test_bundle_roundtrip_multidate_int8(trained, name, tmp_path):
    """export_bundle + ScenePredictor(bundle=...) for the multi-date
    variants, int8 mode: the bundle's curated scales are used as-is."""
    import fabric_tpu.checkpoint as ckpt
    from fabric_tpu.infer.service import ScenePredictor
    from fabric_tpu.tools.export import export_bundle, load_bundle

    cfg, _ = trained[name]
    model = build_model(cfg)
    state = create_state(cfg, model, sample_shape=(32, 32))
    path = ckpt.save(state, str(tmp_path / "w"), 0)

    out = str(tmp_path / f"{name}.npz")
    meta = export_bundle(cfg, path, out, quant="int8")
    assert meta["model"] == name and meta["num_dates"] == T
    folded, scales, meta2 = load_bundle(out)
    assert scales and "enc.x5" in scales
    assert meta2["model"] == name

    pred = ScenePredictor(cfg, bundle=out, bucket=32)
    assert pred.quant == "int8" and pred._scales is not None
    scene, _ = _blob_seq(np.random.RandomState(9), 1, 64)
    mask = pred.predict_multidate(np.asarray(scene[0]))
    assert mask.shape == (64, 64)
    assert set(np.unique(mask)) <= {0, 1}
    # model mismatch is rejected
    other = Config(model="bidate", dtype="float32", patch_size=32,
                   model_base=8)
    with pytest.raises(ValueError, match="exported from"):
        ScenePredictor(other, bundle=out, bucket=32)
