"""Seamless fully-convolutional whole-scene inference (infer/fullconv.py).

The capability being tested: the U-Net is fully convolutional, so instead
of tiling a scene into patches (the reference's only mode,
utils/inference.py:134-236) the network can run directly over
halo-extended scene bands — every pixel predicted once with its full
receptive field, no tile seams.  Correctness = the banded computation
EXACTLY reproduces a single whole-scene forward (translation invariance
of the net at 16-px-aligned crops, given the shift-invariant decoder
upsample), and an insufficient halo demonstrably breaks it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fabric_tpu.infer.fullconv import (make_fullconv_scene_infer,
                                       receptive_field_radius, STRIDE)
from fabric_tpu.models.bidate import BiDateNet


def _model_and_vars(base=8, local_upsample=True):
    model = BiDateNet(base=base, dtype=jnp.float32,
                      local_upsample=local_upsample)
    x = jnp.zeros((1, 64, 64, 13), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    return model, variables


def _direct_mask(model, variables, d1, d2):
    """Oracle: single whole-scene forward (16-aligned edge pad + crop)."""
    h, w = d1.shape[:2]
    hp, wp = -(-h // STRIDE) * STRIDE, -(-w // STRIDE) * STRIDE
    p1 = jnp.pad(jnp.asarray(d1), ((0, hp - h), (0, wp - w), (0, 0)),
                 mode="edge")
    p2 = jnp.pad(jnp.asarray(d2), ((0, hp - h), (0, wp - w), (0, 0)),
                 mode="edge")
    logits = model.apply(variables, p1[None], p2[None], train=False)
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[0, ..., 1]
    return np.asarray((prob > 0.5).astype(jnp.uint8))[:h, :w]


def test_upsample2x_local_values():
    from fabric_tpu.ops.resize import upsample2x_local
    x = np.arange(12, dtype=np.float32).reshape(1, 3, 2, 2)
    y = np.asarray(upsample2x_local(jnp.asarray(x)))
    assert y.shape == (1, 6, 4, 2)
    # even outputs copy inputs
    np.testing.assert_array_equal(y[:, ::2, ::2], x)
    # odd outputs are midpoints (edge-clamped at the far end)
    np.testing.assert_allclose(y[0, 1, 0], (x[0, 0, 0] + x[0, 1, 0]) / 2)
    np.testing.assert_allclose(y[0, 5, 0], x[0, 2, 0])  # clamp
    np.testing.assert_allclose(y[0, 0, 1], (x[0, 0, 0] + x[0, 0, 1]) / 2)
    np.testing.assert_allclose(y[0, 0, 3], x[0, 0, 1])  # clamp


def test_local_upsample_param_tree_unchanged():
    """local_upsample is parameter-free: any checkpoint drops in."""
    _, va = _model_and_vars(local_upsample=True)
    _, vb = _model_and_vars(local_upsample=False)
    ta = jax.tree_util.tree_map(lambda x: x.shape, va)
    tb = jax.tree_util.tree_map(lambda x: x.shape, vb)
    assert ta == tb


def test_receptive_field_within_default_halo():
    """The default halo (128) must cover the measured receptive-field
    radius with a stride step to spare — if the architecture ever grows,
    this is the test that catches a stale default."""
    r = receptive_field_radius()
    assert r <= 128 - STRIDE, (
        f"receptive-field radius {r} too close to the default halo 128; "
        "raise the default in infer/fullconv.py")


@pytest.mark.parametrize("shape,band_rows", [
    ((600, 100), 160),   # 3 uniform bands + a short tail band
    ((608, 96), 304),    # exact multiple: no tail
    ((300, 70), 1024),   # smaller than one band: single-forward path
])
def test_banded_equals_whole_scene(shape, band_rows):
    model, variables = _model_and_vars()
    rng = np.random.RandomState(1)
    d1 = rng.randn(*shape, 13).astype(np.float32)
    d2 = rng.randn(*shape, 13).astype(np.float32)
    run = make_fullconv_scene_infer(model, shape, band_rows=band_rows,
                                    halo=128, dtype=jnp.float32)
    got = np.asarray(run(variables, jnp.asarray(d1), jnp.asarray(d2)))
    ref = _direct_mask(model, variables, d1, d2)
    assert got.shape == shape
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("shape,band_rows,band_batch", [
    ((600, 100), 160, 2),   # 3 uniform bands: 1 group of 2 + rem 1 + tail
    ((608, 96), 160, 4),    # 3 uniform bands + tail, all in the rem group
    ((960, 80), 160, 3),    # 6 uniform bands: exactly 2 groups, no rem
    ((600, 100), 160, 8),   # band_batch > n_uniform: rem group only
])
def test_band_batched_equals_whole_scene(shape, band_rows, band_batch):
    """band_batch=B gathers B bands into one batched forward (the v5e
    batch-1-conv rate fix, BASELINE.md): masks must be EXACTLY the
    sequential banding's == the whole-scene forward's for every B and
    every group/remainder/tail split."""
    model, variables = _model_and_vars()
    rng = np.random.RandomState(3)
    d1 = rng.randn(*shape, 13).astype(np.float32)
    d2 = rng.randn(*shape, 13).astype(np.float32)
    run = make_fullconv_scene_infer(model, shape, band_rows=band_rows,
                                    halo=128, dtype=jnp.float32,
                                    band_batch=band_batch)
    got = np.asarray(run(variables, jnp.asarray(d1), jnp.asarray(d2)))
    ref = _direct_mask(model, variables, d1, d2)
    assert got.shape == shape
    np.testing.assert_array_equal(got, ref)


def test_insufficient_halo_breaks_equality():
    """Teeth: a halo below the receptive field must NOT reproduce the
    whole-scene forward — otherwise the equality test above proves
    nothing."""
    model, variables = _model_and_vars()
    shape = (600, 100)
    rng = np.random.RandomState(2)
    d1 = rng.randn(*shape, 13).astype(np.float32)
    d2 = rng.randn(*shape, 13).astype(np.float32)
    run = make_fullconv_scene_infer(model, shape, band_rows=160, halo=16,
                                    dtype=jnp.float32)
    got = np.asarray(run(variables, jnp.asarray(d1), jnp.asarray(d2)))
    ref = _direct_mask(model, variables, d1, d2)
    assert (got != ref).any()


@pytest.mark.parametrize("shape,band_rows", [
    ((600, 100), 160),   # 3 uniform bands + a short tail band
    ((300, 70), 1024),   # smaller than one band: single-forward path
])
def test_streamed_equals_in_hbm(shape, band_rows, tmp_path):
    """Host-streamed banding (scene sliced from host memmaps, mask
    streamed to an out= memmap) is exactly the in-HBM fullconv result
    (and hence the whole-scene forward)."""
    from fabric_tpu.infer.fullconv import make_fullconv_scene_infer_streamed
    model, variables = _model_and_vars()
    rng = np.random.RandomState(4)
    d1 = rng.randn(*shape, 13).astype(np.float32)
    d2 = rng.randn(*shape, 13).astype(np.float32)
    # scenes on disk, read back as memmaps — the streamed path touches
    # only one band's window at a time
    m1 = np.memmap(tmp_path / "d1.npy", np.float32, "w+",
                   shape=d1.shape)
    m2 = np.memmap(tmp_path / "d2.npy", np.float32, "w+",
                   shape=d2.shape)
    m1[:], m2[:] = d1, d2
    out = np.memmap(tmp_path / "mask.npy", np.uint8, "w+", shape=shape)
    run_s = make_fullconv_scene_infer_streamed(
        model, shape, band_rows=band_rows, halo=128, dtype=jnp.float32)
    got = run_s(variables, m1, m2, out=out)
    assert got is out
    ref = _direct_mask(model, variables, d1, d2)
    np.testing.assert_array_equal(np.asarray(out), ref)
    # plain ndarrays and a fresh canvas work too
    np.testing.assert_array_equal(run_s(variables, d1, d2), ref)


def test_predictor_fullconv_stream():
    from fabric_tpu.config import Config
    from fabric_tpu.infer.service import ScenePredictor
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=16,
                          fullconv_band_rows=160)
    pred_s = ScenePredictor(cfg, checkpoint=None, bucket=16,
                            fullconv_band_rows=160, fullconv_stream=True)
    # identical fresh-random weights for both predictors
    pred_s.variables = jax.tree.map(lambda x: x, pred.variables)
    rng = np.random.RandomState(5)
    d1 = rng.randn(330, 60, 13).astype(np.float32)
    d2 = rng.randn(330, 60, 13).astype(np.float32)
    np.testing.assert_array_equal(pred_s.predict(d1, d2),
                                  pred.predict(d1, d2))
    with pytest.raises(ValueError, match="fullconv_stream"):
        ScenePredictor(cfg, fullconv_stream=True)


@pytest.mark.parametrize("kind", ["unet_lstm", "unet3d"])
def test_multidate_streamed_equals_in_hbm(kind):
    from fabric_tpu.infer.fullconv import (
        make_fullconv_scene_infer_multidate,
        make_fullconv_scene_infer_multidate_streamed)
    model, variables = _multidate_model_and_vars(kind)
    shape = (600, 100)
    rng = np.random.RandomState(6)
    scenes = rng.randn(3, *shape, 13).astype(np.float32)
    run = make_fullconv_scene_infer_multidate(
        model, shape, num_dates=3, band_rows=160, halo=128,
        dtype=jnp.float32)
    ref = np.asarray(run(variables, jnp.asarray(scenes)))
    run_s = make_fullconv_scene_infer_multidate_streamed(
        model, shape, num_dates=3, band_rows=160, halo=128,
        dtype=jnp.float32)
    np.testing.assert_array_equal(run_s(variables, scenes), ref)


def test_align_corners_model_rejected():
    model, _ = _model_and_vars(local_upsample=False)
    with pytest.raises(ValueError, match="local_upsample"):
        make_fullconv_scene_infer(model, (600, 100))
    with pytest.raises(ValueError, match="multiples"):
        make_fullconv_scene_infer(BiDateNet(local_upsample=True),
                                  (600, 100), band_rows=100)


def test_predictor_fullconv_wiring():
    from fabric_tpu.config import Config
    from fabric_tpu.infer.service import ScenePredictor
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=16,
                          fullconv_band_rows=160)
    rng = np.random.RandomState(3)
    d1 = rng.randn(330, 60, 13).astype(np.float32)
    d2 = rng.randn(330, 60, 13).astype(np.float32)
    mask = pred.predict(d1, d2)
    assert mask.shape == (330, 60)
    assert set(np.unique(mask)) <= {0, 1}
    # the served mask equals the direct whole-scene forward on the
    # bucket-padded scene (the predictor's folded model, base 8)
    run = pred._get_runner(336, 64)
    pad = [(0, 6), (0, 4), (0, 0)]
    ref = np.asarray(run(pred.variables,
                         jnp.asarray(np.pad(d1, pad, mode="edge")),
                         jnp.asarray(np.pad(d2, pad, mode="edge"))))
    np.testing.assert_array_equal(mask, ref[:330, :60])
    # guards
    with pytest.raises(ValueError, match="fullconv"):
        ScenePredictor(Config(patch_size=16, dtype="float32", model_base=8,
                              infer_overlap=8), fullconv_band_rows=160)


def _multidate_model_and_vars(kind, base=4, num_dates=3,
                              local_upsample=True):
    if kind == "unet_lstm":
        from fabric_tpu.models.unet_lstm import UNetLSTM
        model = UNetLSTM(base=base, dtype=jnp.float32,
                         local_upsample=local_upsample)
    else:
        from fabric_tpu.models.unet3d import UNet3D
        model = UNet3D(base=base, dtype=jnp.float32,
                       local_upsample=local_upsample)
    x = jnp.zeros((1, num_dates, 64, 64, 13), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def _direct_mask_multidate(model, variables, scenes):
    """Oracle: single whole-scene multi-date forward (pad + crop)."""
    h, w = scenes.shape[1:3]
    hp, wp = -(-h // STRIDE) * STRIDE, -(-w // STRIDE) * STRIDE
    p = jnp.pad(jnp.asarray(scenes),
                ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    logits = model.apply(variables, p[None], train=False)
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[0, ..., 1]
    return np.asarray((prob > 0.5).astype(jnp.uint8))[:h, :w]


@pytest.mark.parametrize("kind", ["unet_lstm", "unet3d"])
def test_multidate_banded_equals_whole_scene(kind):
    """The multi-date variants are also translation invariant at
    16-px-aligned crops (ConvLSTM gates are SAME convs; 3D convs are
    SAME; temporal collapse is pointwise), so fullconv banding
    reproduces their whole-scene forward exactly too."""
    from fabric_tpu.infer.fullconv import make_fullconv_scene_infer_multidate
    model, variables = _multidate_model_and_vars(kind)
    shape, t = (432, 80), 3
    rng = np.random.RandomState(6)
    scenes = rng.randn(t, *shape, 13).astype(np.float32)
    run = make_fullconv_scene_infer_multidate(
        model, shape, num_dates=t, band_rows=160, halo=128,
        dtype=jnp.float32)
    got = np.asarray(run(variables, jnp.asarray(scenes)))
    ref = _direct_mask_multidate(model, variables, scenes)
    assert got.shape == shape
    np.testing.assert_array_equal(got, ref)


def test_multidate_insufficient_halo_breaks_equality():
    from fabric_tpu.infer.fullconv import make_fullconv_scene_infer_multidate
    model, variables = _multidate_model_and_vars("unet_lstm")
    shape, t = (432, 80), 3
    rng = np.random.RandomState(7)
    scenes = rng.randn(t, *shape, 13).astype(np.float32)
    run = make_fullconv_scene_infer_multidate(
        model, shape, num_dates=t, band_rows=160, halo=16,
        dtype=jnp.float32)
    got = np.asarray(run(variables, jnp.asarray(scenes)))
    ref = _direct_mask_multidate(model, variables, scenes)
    assert (got != ref).any()


def test_predictor_fullconv_multidate():
    """ScenePredictor serves the multi-date variants through fullconv
    banding, and the served mask equals the direct whole-scene forward
    of the predictor's folded model."""
    from fabric_tpu.config import Config
    from fabric_tpu.infer.service import ScenePredictor
    cfg = Config(patch_size=16, eval_batch_size=4, dtype="float32",
                 model="unet3d", model_base=4, num_dates=3)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=16,
                          fullconv_band_rows=160)
    rng = np.random.RandomState(8)
    scenes = rng.randn(3, 330, 60, 13).astype(np.float32)
    mask = pred.predict_multidate(scenes)
    assert mask.shape == (330, 60)
    assert set(np.unique(mask)) <= {0, 1}
    padded = np.pad(scenes, [(0, 0), (0, 6), (0, 4), (0, 0)], mode="edge")
    ref = _direct_mask_multidate(pred.model, pred.variables, padded)
    np.testing.assert_array_equal(mask, ref[:330, :60])


def test_sharded_fullconv_equals_whole_scene():
    """Multi-chip seamless serving: the scene H-sharded over an 8-device
    mesh, fullconv bands run per device, halos exchanged over the mesh
    (lax.ppermute) — the distributed mask must EXACTLY equal a
    single-forward whole-scene mask (every kept row sees byte-identical
    context after the exchange)."""
    from fabric_tpu.infer.fullconv import make_sharded_fullconv_infer
    from fabric_tpu.parallel.mesh import make_mesh
    model, variables = _model_and_vars()
    mesh = make_mesh(data=8)
    shape = (2048, 44)  # per-device band 256 = 2*halo; W pads to 48
    rng = np.random.RandomState(9)
    d1 = rng.randn(*shape, 13).astype(np.float32)
    d2 = rng.randn(*shape, 13).astype(np.float32)
    # band_rows 96 -> per device: 2 uniform sub-bands + a 64-row tail
    run = make_sharded_fullconv_infer(model, shape, mesh, band_rows=96,
                                      halo=128, dtype=jnp.float32)
    got = np.asarray(run(variables, jnp.asarray(d1), jnp.asarray(d2)))
    ref = _direct_mask(model, variables, d1, d2)
    assert got.shape == shape
    np.testing.assert_array_equal(got, ref)


def test_sharded_fullconv_insufficient_halo_breaks_equality():
    from fabric_tpu.infer.fullconv import make_sharded_fullconv_infer
    from fabric_tpu.parallel.mesh import make_mesh
    model, variables = _model_and_vars()
    mesh = make_mesh(data=8)
    shape = (2048, 44)
    rng = np.random.RandomState(10)
    d1 = rng.randn(*shape, 13).astype(np.float32)
    d2 = rng.randn(*shape, 13).astype(np.float32)
    run = make_sharded_fullconv_infer(model, shape, mesh, band_rows=96,
                                      halo=16, dtype=jnp.float32)
    got = np.asarray(run(variables, jnp.asarray(d1), jnp.asarray(d2)))
    ref = _direct_mask(model, variables, d1, d2)
    assert (got != ref).any()


def test_sharded_fullconv_guards():
    from fabric_tpu.infer.fullconv import make_sharded_fullconv_infer
    from fabric_tpu.parallel.mesh import make_mesh
    model, _ = _model_and_vars()
    mesh = make_mesh(data=8)
    with pytest.raises(ValueError, match="2\\*halo"):
        # per-device band 128 < 2*halo(256)
        make_sharded_fullconv_infer(model, (1024, 64), mesh)
    with pytest.raises(ValueError, match="divide"):
        make_sharded_fullconv_infer(model, (2052, 64), mesh)
    with pytest.raises(ValueError, match="local_upsample"):
        make_sharded_fullconv_infer(BiDateNet(local_upsample=False),
                                    (2048, 64), mesh)
    # predictor-level composition guards
    from fabric_tpu.config import Config
    from fabric_tpu.infer.service import ScenePredictor
    with pytest.raises(ValueError, match="mesh"):
        ScenePredictor(Config(dtype="float32", model_base=8),
                       shard_scene=True, fullconv_band_rows=96)
    with pytest.raises(ValueError, match="bidate"):
        ScenePredictor(Config(dtype="float32", model="unet3d",
                              model_base=4),
                       mesh=mesh, shard_scene=True, fullconv_band_rows=96)
    # bucket auto-aligns to n*256 so per-device bands satisfy 2*halo
    pred = ScenePredictor(Config(dtype="float32", model_base=8),
                          mesh=mesh, shard_scene=True,
                          fullconv_band_rows=96)
    assert pred.bucket % (8 * 256) == 0


def test_trained_local_upsample_config_roundtrip():
    """cfg.local_upsample trains the shift-invariant decoder end-to-end:
    build_model honors the flag, and the fullconv serving mode then runs
    EXACTLY the trained network (no decoder swap at serving time)."""
    from fabric_tpu.config import Config
    from fabric_tpu.models import build_model
    cfg = Config(dtype="float32", model_base=8, local_upsample=True)
    model = build_model(cfg)
    assert model.local_upsample is True
    for kind in ("unet_lstm", "unet3d"):
        m = build_model(Config(dtype="float32", model=kind, model_base=4,
                               local_upsample=True))
        assert m.local_upsample is True
    assert build_model(Config(dtype="float32")).local_upsample is False


def _folded_params(base=8):
    from fabric_tpu.ops.fold_bn import fold_batchnorm
    model = BiDateNet(base=base, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 13), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    return fold_batchnorm(variables["params"], variables["batch_stats"])


def test_int8_fullconv_banded_equals_whole():
    """The int8 serving forward composes with fullconv banding: static
    per-tensor scales, SAME convs, aligned pooling, and the local
    upsample are all translation invariant at 16-px-aligned crops, so
    the banded int8 computation reproduces a whole-scene int8 forward.

    The integer ops (int8 convs with int32 accumulation, requantization)
    are bit-exact across band shapes (verified directly below on the
    forward's probabilities at an interior band); the only permitted
    divergence is mask flips at razor-thin ties, because XLA may
    FMA-contract the fp32 dequant epilogues (int32 * scale + bias)
    differently in different fusion instances of the same shape — so the
    mask assertion bounds any mismatch to |p - 0.5| ties instead of
    demanding bit equality of the thresholded uint8."""
    from fabric_tpu.infer import quant
    folded = _folded_params()
    rng = np.random.RandomState(4)
    calib = [(jnp.asarray(rng.randn(2, 32, 32, 13), jnp.float32),
              jnp.asarray(rng.randn(2, 32, 32, 13), jnp.float32))]
    scales = quant.calibrate(folded, calib, dtype=jnp.float32,
                             local_upsample=True)
    apply_q = quant.make_int8_apply(folded, scales, jnp.float32,
                                    local_upsample=True)
    shape = (600, 100)
    d1 = rng.randn(*shape, 13).astype(np.float32)
    d2 = rng.randn(*shape, 13).astype(np.float32)
    hp, wp = 608, 112
    p1 = jnp.pad(jnp.asarray(d1), ((0, hp - 600), (0, wp - 100), (0, 0)),
                 mode="edge")
    p2 = jnp.pad(jnp.asarray(d2), ((0, hp - 600), (0, wp - 100), (0, 0)),
                 mode="edge")
    logits = apply_q({}, p1[None], p2[None], train=False)
    prob = np.asarray(jax.nn.softmax(logits.astype(jnp.float32),
                                     axis=-1))[0, ..., 1]
    # (a) translation invariance of the quantized forward itself, at the
    # probability level: an interior band's context window reproduces the
    # whole-scene probabilities exactly on its kept rows
    band = apply_q({}, p1[32:448][None], p2[32:448][None], train=False)
    pb = np.asarray(jax.nn.softmax(band.astype(jnp.float32),
                                   axis=-1))[0, ..., 1]
    np.testing.assert_array_equal(prob[160:320], pb[128:288])
    # (b) the banded runner's mask: any mismatch vs the whole-scene mask
    # must be a tie flip (fp32 FMA-contraction noise), not real divergence
    run = make_fullconv_scene_infer(apply_q, shape, band_rows=160,
                                    halo=128, dtype=jnp.float32)
    got = np.asarray(run({}, jnp.asarray(d1), jnp.asarray(d2)))
    ref = (prob > 0.5).astype(np.uint8)[:600, :100]
    assert got.shape == shape
    mm = got != ref
    assert mm.mean() <= 1e-3, f"{mm.sum()} mask mismatches"
    if mm.any():
        ties = np.abs(prob[:600, :100][mm] - 0.5)
        assert ties.max() < 2e-3, (
            f"mismatch away from the decision boundary: {ties.max()}")
    # teeth: an align-corners int8 forward must be rejected by the guard
    apply_ac = quant.make_int8_apply(folded, scales, jnp.float32,
                                     local_upsample=False)
    with pytest.raises(ValueError, match="local_upsample"):
        make_fullconv_scene_infer(apply_ac, shape, band_rows=160)


def test_int8_sharded_fullconv_equals_single_device(monkeypatch):
    """int8 x sharded fullconv (r3 VERDICT #4): the quantized apply run
    through the 8-device halo-exchange path must reproduce the
    single-device whole-scene int8 forward.  The integer ops are
    bit-exact across band shapes; as in
    test_int8_fullconv_banded_equals_whole, the only permitted
    divergence is tie flips at |p - 0.5| from fp32 FMA contraction of
    the dequant epilogues."""
    from fabric_tpu.infer import quant
    from fabric_tpu.infer.fullconv import make_sharded_fullconv_infer
    from fabric_tpu.parallel.mesh import make_mesh

    folded = _folded_params()
    rng = np.random.RandomState(11)
    calib = [(jnp.asarray(rng.randn(2, 32, 32, 13), jnp.float32),
              jnp.asarray(rng.randn(2, 32, 32, 13), jnp.float32))]
    scales = quant.calibrate(folded, calib, dtype=jnp.float32,
                             local_upsample=True)
    apply_q = quant.make_int8_apply(folded, scales, jnp.float32,
                                    local_upsample=True)
    mesh = make_mesh(data=8)
    shape = (2048, 44)  # per-device band 256 = 2*halo; W pads to 48
    d1 = rng.randn(*shape, 13).astype(np.float32)
    d2 = rng.randn(*shape, 13).astype(np.float32)
    run = make_sharded_fullconv_infer(apply_q, shape, mesh, band_rows=96,
                                      halo=128, dtype=jnp.float32)
    got = np.asarray(run({}, jnp.asarray(d1), jnp.asarray(d2)))
    assert got.shape == shape

    # single-device whole-scene int8 reference, at the probability level
    p1 = jnp.pad(jnp.asarray(d1), ((0, 0), (0, 4), (0, 0)), mode="edge")
    p2 = jnp.pad(jnp.asarray(d2), ((0, 0), (0, 4), (0, 0)), mode="edge")
    logits = apply_q({}, p1[None], p2[None], train=False)
    prob = np.asarray(jax.nn.softmax(logits.astype(jnp.float32),
                                     axis=-1))[0, :, :44, 1]
    ref = (prob > 0.5).astype(np.uint8)
    mm = got != ref
    assert mm.mean() <= 1e-3, f"{mm.sum()} mask mismatches"
    if mm.any():
        ties = np.abs(prob[mm] - 0.5)
        assert ties.max() < 2e-3, (
            f"mismatch away from the decision boundary: {ties.max()}")


def test_predictor_oom_guidance():
    """A device OOM during a scene run surfaces mode-specific sizing
    advice (band_rows / stream / shard) instead of a bare XLA error."""
    from fabric_tpu.config import Config
    from fabric_tpu.infer.service import ScenePredictor
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=16,
                          fullconv_band_rows=160)

    def fake_runner(variables, a1, a2):
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory while "
                           "trying to allocate 18350080000 bytes.")

    pred._compiled[(48, 48)] = fake_runner
    d = np.zeros((48, 48, 13), np.float32)
    with pytest.raises(MemoryError, match="fullconv_band_rows"):
        pred.predict(d, d)
    # non-OOM errors pass through untouched
    def fake_crash(variables, a1, a2):
        raise RuntimeError("something else entirely")
    pred._compiled[(48, 48)] = fake_crash
    with pytest.raises(RuntimeError, match="something else"):
        pred.predict(d, d)


def test_predictor_fullconv_int8_streamed():
    """int8 composes with host streaming: the streamed quantized masks
    equal the in-HBM quantized masks (identical self-calibration crops,
    identical virtual bucket padding)."""
    from fabric_tpu.config import Config
    from fabric_tpu.infer.service import ScenePredictor
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=16, quant="int8",
                          fullconv_band_rows=160)
    pred_s = ScenePredictor(cfg, checkpoint=None, bucket=16, quant="int8",
                            fullconv_band_rows=160, fullconv_stream=True)
    pred_s.variables = jax.tree.map(lambda x: x, pred.variables)
    rng = np.random.RandomState(13)
    d1 = rng.randn(640, 60, 13).astype(np.float32)
    d2 = rng.randn(640, 60, 13).astype(np.float32)
    np.testing.assert_array_equal(pred_s.predict(d1, d2),
                                  pred.predict(d1, d2))


def test_predictor_fullconv_int8():
    """ScenePredictor serves int8 through fullconv banding: first predict
    self-calibrates with the local-upsample taps, and the served mask
    equals the whole-scene quantized forward."""
    from fabric_tpu.config import Config
    from fabric_tpu.infer.service import ScenePredictor
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=16, quant="int8",
                          fullconv_band_rows=160)
    rng = np.random.RandomState(5)
    d1 = rng.randn(640, 60, 13).astype(np.float32)
    d2 = rng.randn(640, 60, 13).astype(np.float32)
    mask = pred.predict(d1, d2)
    assert mask.shape == (640, 60)
    assert set(np.unique(mask)) <= {0, 1}
    assert getattr(pred.model, "local_upsample", False) is True
    pad = [(0, 0), (0, 4), (0, 0)]
    logits = pred.model({}, jnp.asarray(np.pad(d1, pad, mode="edge"))[None],
                        jnp.asarray(np.pad(d2, pad, mode="edge"))[None],
                        train=False)
    prob = np.asarray(jax.nn.softmax(logits.astype(jnp.float32),
                                     axis=-1))[0, ..., 1]
    ref = (prob > 0.5).astype(np.uint8)[:640, :60]
    # tie-bounded equality (see test_int8_fullconv_banded_equals_whole:
    # fp32 dequant FMA contraction may flip exact-tie pixels)
    mm = mask != ref
    assert mm.mean() <= 1e-3, f"{mm.sum()} mask mismatches"
    if mm.any():
        assert np.abs(prob[:640, :60][mm] - 0.5).max() < 2e-3
