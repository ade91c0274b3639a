"""Int8 post-training-quantized inference path (infer/quant.py).

Checks, on CPU XLA (which runs the same s8xs8->s32 convs as TPU):
- per-channel weight quantization round-trips within half a quantum,
- the int8 forward tracks the exact bf16 forward on a TRAINED model
  (probabilities and argmax masks), and
- the quantized apply drops into make_scene_infer unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fabric_tpu.config import Config
from fabric_tpu.infer import quant
from fabric_tpu.losses import get_loss_fn
from fabric_tpu.models import BiDateNet, build_model
from fabric_tpu.ops.fold_bn import fold_batchnorm
from fabric_tpu.train.state import create_state
from fabric_tpu.train.steps import make_train_step


def _blob_batch(rng, n, hw, c=13):
    d1 = rng.randn(n, hw, hw, c).astype(np.float32)
    yy, xx = np.mgrid[:hw, :hw]
    masks, d2 = [], []
    for i in range(n):
        cy, cx, r = rng.randint(4, hw - 4), rng.randint(4, hw - 4), hw // 4
        m = ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r
        x2 = d1[i] + rng.randn(hw, hw, c).astype(np.float32) * 0.1
        x2[m] += 2.0
        masks.append(m)
        d2.append(x2)
    return (jnp.asarray(d1), jnp.asarray(np.stack(d2)),
            jnp.asarray(np.stack(masks).astype(np.int32)))


@pytest.fixture(scope="module")
def trained():
    """A small BiDateNet trained enough that logits are decisive."""
    cfg = Config(dtype="float32", patch_size=32, batch_size=8,
                 model_base=16)
    model = build_model(cfg)
    state = create_state(cfg, model, sample_shape=(32, 32))
    step = make_train_step(model, get_loss_fn(cfg))
    rng = np.random.RandomState(0)
    for i in range(12):
        d1, d2, lab = _blob_batch(rng, 8, 32)
        batch = {"img1": d1, "img2": d2, "label": lab,
                 "weight": jnp.ones(8, jnp.float32)}
        state, _ = step(state, batch)
    folded = fold_batchnorm(state.params, state.batch_stats)
    return cfg, folded


def test_weight_quantization_roundtrip(trained):
    _, folded = trained
    qw = quant.quantize_weights(folded)
    k = np.asarray(folded["down2"]["conv"]["conv1"]["kernel"], np.float32)
    q = qw["down2.conv1"]
    deq = np.asarray(q["wq"], np.float32) * np.asarray(q["sw"])
    assert np.max(np.abs(deq - k)) <= np.max(np.asarray(q["sw"])) * 0.5 + 1e-9
    assert np.asarray(q["wq"]).dtype == np.int8


def test_int8_tracks_bf16(trained):
    cfg, folded = trained
    rng = np.random.RandomState(1)
    calib = [_blob_batch(rng, 4, 32)[:2] for _ in range(3)]
    scales = quant.calibrate(folded, calib)
    assert set(scales) == ({name for name, _ in quant._SITES}
                           | {"enc.x5", "f1", "f2", "f3", "f4"})
    assert all(s > 0 for s in scales.values())

    apply_q = quant.make_int8_apply(folded, scales)
    ref_model = BiDateNet(base=16, dtype=jnp.bfloat16, fold_bn=True)

    d1, d2, _ = _blob_batch(np.random.RandomState(2), 4, 32)
    lg_ref = ref_model.apply({"params": folded, "batch_stats": {}},
                             d1, d2, train=False)
    lg_q = apply_q(None, d1, d2)
    p_ref = jax.nn.softmax(lg_ref, -1)[..., 1]
    p_q = jax.nn.softmax(lg_q, -1)[..., 1]
    assert float(jnp.mean(jnp.abs(p_ref - p_q))) < 0.05
    agree = float(jnp.mean((jnp.argmax(lg_ref, -1)
                            == jnp.argmax(lg_q, -1)).astype(jnp.float32)))
    # the 12-step fixture model still has many near-boundary pixels; the
    # int8-resident encoder (fusion on quantized values) costs ~0.3% extra
    # disagreement there vs the per-conv-site phase-1 quantization
    assert agree > 0.96


def test_int8_apply_in_scene_infer(trained):
    from fabric_tpu.infer.device_tiling import make_scene_infer

    cfg, folded = trained
    rng = np.random.RandomState(3)
    calib = [_blob_batch(rng, 4, 32)[:2]]
    scales = quant.calibrate(folded, calib)
    apply_q = quant.make_int8_apply(folded, scales)

    h = w = 64
    s1, s2, _ = _blob_batch(np.random.RandomState(4), 1, h)
    scene1, scene2 = s1[0], s2[0]

    ref_model = BiDateNet(base=16, dtype=jnp.bfloat16, fold_bn=True)
    variables = {"params": folded, "batch_stats": {}}
    run_ref = make_scene_infer(ref_model, 32, (h, w), batch_size=4)
    run_q = make_scene_infer(apply_q, 32, (h, w), batch_size=4)
    m_ref = np.asarray(run_ref(variables, scene1, scene2))
    m_q = np.asarray(run_q(variables, scene1, scene2))
    assert m_ref.shape == (h, w)
    assert (m_ref == m_q).mean() > 0.97


def test_int8_apply_overlap_mode(trained):
    """The quantized apply also drives overlap-averaged stitching (the
    softmax-probability path in make_scene_infer)."""
    from fabric_tpu.infer.device_tiling import make_scene_infer

    cfg, folded = trained
    rng = np.random.RandomState(5)
    scales = quant.calibrate(folded, [_blob_batch(rng, 2, 32)[:2]])
    apply_q = quant.make_int8_apply(folded, scales)
    h = w = 64
    s1, s2, _ = _blob_batch(np.random.RandomState(6), 1, h)
    run = make_scene_infer(apply_q, 32, (h, w), batch_size=4, overlap=8)
    mask = np.asarray(run({"params": folded, "batch_stats": {}},
                          s1[0], s2[0]))
    assert mask.shape == (h, w)
    assert set(np.unique(mask)) <= {0, 1}
