"""Training-dynamics parity against the PyTorch reference, one SGD step.

The weight-transfer oracle (test_reference_parity.py) proves eval parity;
this proves TRAIN parity: with identical weights and an identical batch, one
reference training step (/root/reference/train.py:88-95 — forward in train
mode, TverskyLoss(0.1, 0.9), plain SGD lr=1e-3) and one fabric-tpu
``train_step`` with ``compat_reference`` semantics (per-date BatchNorm batch
statistics + the (B,H)-only loss reduction quirk) must produce

- the same loss,
- the same updated parameters, and
- the same updated BatchNorm running statistics (torch's unbiased-variance
  running update — see ``TorchBatchNorm`` in fabric_tpu/models/blocks.py).

This converts the "F1 within 1% of the reference" north star from an
argument into checked math at the step level.
"""

import functools
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "models")),
    reason="reference repo not mounted")

from test_reference_parity import _load_reference_model, _transfer  # noqa: E402


def _ref_tversky():
    sys.path.insert(0, REFERENCE)
    try:
        from utils.metrics import TverskyLoss
    finally:
        sys.path.pop(0)
    return TverskyLoss(alpha=0.1, beta=0.9)


def _batch(seed=0, n=4, h=32, w=32):
    rng = np.random.RandomState(seed)
    a = rng.randn(n, h, w, 13).astype(np.float32)
    b = rng.randn(n, h, w, 13).astype(np.float32)
    lbl = rng.randint(0, 2, (n, h, w))
    return a, b, lbl


def _assert_trees_close(ours, ref, atol, what):
    flat_ours = jax.tree_util.tree_leaves_with_path(ours)
    flat_ref = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(ref)}
    assert len(flat_ours) == len(flat_ref)
    for key, val in flat_ours:
        ks = jax.tree_util.keystr(key)
        np.testing.assert_allclose(
            np.asarray(val), np.asarray(flat_ref[ks]), atol=atol,
            err_msg=f"{what} mismatch at {ks}")


@pytest.fixture(scope="module")
def one_step():
    """Run one identical SGD step in both frameworks; return all four trees."""
    tm = _load_reference_model()
    variables = _transfer(tm)  # pre-step weights + BN running stats
    a, b, lbl = _batch()

    # --- torch reference step (train.py:88-95) ---
    tm.train()
    criterion = _ref_tversky()
    opt = torch.optim.SGD(tm.parameters(), lr=1e-3)
    opt.zero_grad()
    out = tm(torch.from_numpy(a.transpose(0, 3, 1, 2)),
             torch.from_numpy(b.transpose(0, 3, 1, 2)))
    t_loss = criterion(out, torch.from_numpy(lbl.astype(np.int64)))
    t_loss.backward()
    opt.step()
    tm.eval()
    after_ref = _transfer(tm)

    # --- fabric-tpu step with compat_reference semantics ---
    import optax
    from fabric_tpu.losses import tversky_loss
    from fabric_tpu.models import BiDateNet
    from fabric_tpu.train.state import TrainState
    from fabric_tpu.train.steps import make_train_step

    model = BiDateNet(dtype=jnp.float32, joint_date_batchnorm=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=optax.sgd(1e-3))
    loss_fn = functools.partial(tversky_loss, alpha=0.1, beta=0.9,
                                compat_reference=True)
    step = make_train_step(model, loss_fn, donate=False)
    new_state, stats = step(state, {"img1": jnp.asarray(a),
                                    "img2": jnp.asarray(b),
                                    "label": jnp.asarray(lbl)})
    return after_ref, new_state, float(t_loss.detach()), float(stats["loss"])


def test_loss_matches(one_step):
    _, _, ref_loss, our_loss = one_step
    assert np.isclose(our_loss, ref_loss, rtol=1e-5), (our_loss, ref_loss)


def test_updated_params_match(one_step):
    after_ref, new_state, _, _ = one_step
    _assert_trees_close(new_state.params, after_ref["params"], 1e-4,
                        "updated param")


def test_updated_bn_running_stats_match(one_step):
    after_ref, new_state, _, _ = one_step
    _assert_trees_close(new_state.batch_stats, after_ref["batch_stats"],
                        1e-4, "BN running stat")


def test_five_step_trajectory_and_eval_parity():
    """Five consecutive SGD steps on fresh batches, then an EVAL forward:
    the whole short trajectory — params, BN running stats, and the
    post-training eval logits (what F1 is computed from) — must track the
    reference.  This is the step-level version of the 'OSCD F1 within 1%'
    north star (BASELINE.md), run where bit-exact comparison is possible."""
    tm = _load_reference_model()
    variables = _transfer(tm)

    tm.train()
    criterion = _ref_tversky()
    opt = torch.optim.SGD(tm.parameters(), lr=1e-3)
    batches = [_batch(seed) for seed in range(5)]
    for a, b, lbl in batches:
        opt.zero_grad()
        out = tm(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                 torch.from_numpy(b.transpose(0, 3, 1, 2)))
        criterion(out, torch.from_numpy(lbl.astype(np.int64))).backward()
        opt.step()
    tm.eval()
    ea, eb, _ = _batch(99)
    with torch.no_grad():
        ref_logits = tm(torch.from_numpy(ea.transpose(0, 3, 1, 2)),
                        torch.from_numpy(eb.transpose(0, 3, 1, 2)))
    ref_logits = ref_logits.numpy().transpose(0, 2, 3, 1)

    import optax
    from fabric_tpu.losses import tversky_loss
    from fabric_tpu.models import BiDateNet
    from fabric_tpu.train.state import TrainState
    from fabric_tpu.train.steps import make_train_step, make_eval_step

    model = BiDateNet(dtype=jnp.float32, joint_date_batchnorm=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=optax.sgd(1e-3))
    loss_fn = functools.partial(tversky_loss, alpha=0.1, beta=0.9,
                                compat_reference=True)
    step = make_train_step(model, loss_fn, donate=False)
    for a, b, lbl in batches:
        state, _ = step(state, {"img1": jnp.asarray(a),
                                "img2": jnp.asarray(b),
                                "label": jnp.asarray(lbl)})

    after_ref = _transfer(tm)
    _assert_trees_close(state.params, after_ref["params"], 3e-4,
                        "5-step param")
    _assert_trees_close(state.batch_stats, after_ref["batch_stats"], 3e-4,
                        "5-step BN stat")
    ours = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(ea), jnp.asarray(eb), train=False))
    np.testing.assert_allclose(ours, ref_logits, atol=1e-3)
    agree = np.mean(np.argmax(ours, -1) == np.argmax(ref_logits, -1))
    assert agree > 0.999


def test_compat_reference_umbrella_flag():
    """cfg.compat_reference turns on both reference-semantics switches and
    reaches the model factory."""
    from fabric_tpu.config import Config
    from fabric_tpu.models import build_model
    cfg = Config(compat_reference=True, dtype="float32")
    assert cfg.compat_reference_losses and cfg.per_date_batchnorm
    model = build_model(cfg)
    assert model.joint_date_batchnorm is False
    assert build_model(Config(dtype="float32")).joint_date_batchnorm is True
