"""tools/import_torch: torch reference checkpoints -> fabric-tpu.

The file-level migration path (torch.save on the reference model ->
import_checkpoint -> ckpt.restore / ScenePredictor) must reproduce the
reference's logits exactly like the live-module weight transfer does
(tests/test_reference_parity.py).  Covers the reference's actual save
format (whole pickled model, /root/reference/train.py:222), bare
state_dicts, and DataParallel's ``module.`` prefix
(/root/reference/utils/helpers.py:333-335).
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "models")),
    reason="reference repo not mounted")


def _reference_model():
    sys.path.insert(0, REFERENCE)
    try:
        from models.bidate_model import BiDateNet as TorchBiDateNet
    finally:
        sys.path.pop(0)
    torch.manual_seed(3)
    model = TorchBiDateNet(13, 2)
    model.eval()
    return model


def _assert_imported_matches(tm, ckpt_dir):
    """Restored fabric-tpu checkpoint reproduces the torch logits."""
    from fabric_tpu import checkpoint as ckpt
    from fabric_tpu.config import Config
    from fabric_tpu.models import BiDateNet
    from fabric_tpu.train.state import create_state

    cfg = Config(dtype="float32")
    model = BiDateNet(dtype=jnp.float32)
    state = create_state(cfg, model)
    best = ckpt.read_pointer(ckpt_dir, "best")
    assert best is not None  # import writes latest AND best pointers
    state = ckpt.restore(state, best)

    rng = np.random.RandomState(11)
    a = rng.randn(2, 32, 32, 13).astype(np.float32)
    b = rng.randn(2, 32, 32, 13).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                 torch.from_numpy(b.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(a), jnp.asarray(b), train=False))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_import_state_dict(tmp_path):
    from fabric_tpu.tools.import_torch import import_checkpoint
    tm = _reference_model()
    pt = tmp_path / "model.pt"
    torch.save(tm.state_dict(), pt)
    out = tmp_path / "ckpt"
    path = import_checkpoint(str(pt), str(out))
    assert os.path.exists(path)
    _assert_imported_matches(tm, str(out))


def test_import_dataparallel_state_dict(tmp_path):
    """helpers.load_model wraps in nn.DataParallel -> 'module.' keys."""
    from fabric_tpu.tools.import_torch import import_checkpoint
    tm = _reference_model()
    sd = {f"module.{k}": v for k, v in tm.state_dict().items()}
    pt = tmp_path / "dp.pt"
    torch.save(sd, pt)
    out = tmp_path / "ckpt"
    import_checkpoint(str(pt), str(out))
    _assert_imported_matches(tm, str(out))


def test_import_whole_pickled_model(tmp_path):
    """The reference's actual save format (train.py:222)."""
    from fabric_tpu.tools.import_torch import import_checkpoint
    tm = _reference_model()
    pt = tmp_path / "checkpoint_epoch_0.pt"
    sys.path.insert(0, REFERENCE)  # pickling refers to models.*
    try:
        torch.save(tm, pt)
    finally:
        sys.path.pop(0)
    out = tmp_path / "ckpt"
    import_checkpoint(str(pt), str(out), ref_path=REFERENCE)
    _assert_imported_matches(tm, str(out))


def test_cli_and_serving(tmp_path):
    """CLI entry point + the imported checkpoint serves through
    ScenePredictor (the migration end-state)."""
    from fabric_tpu.config import Config
    from fabric_tpu.infer.service import ScenePredictor
    from fabric_tpu.tools.import_torch import main
    tm = _reference_model()
    pt = tmp_path / "model.pt"
    torch.save(tm.state_dict(), pt)
    out = tmp_path / "ckpt"
    assert main(["--pt", str(pt), "--out", str(out)]) == 0
    cfg = Config(dtype="float32", patch_size=32, eval_batch_size=8)
    pred = ScenePredictor(cfg, checkpoint=str(out), bucket=32)
    rng = np.random.RandomState(12)
    d1 = rng.randn(64, 48, 13).astype(np.float32)
    d2 = rng.randn(64, 48, 13).astype(np.float32)
    mask = pred.predict(d1, d2)
    assert mask.shape == (64, 48)
    assert set(np.unique(mask)) <= {0, 1}
