"""Grain pipeline option: same batch contract as the numpy pipeline."""

import numpy as np
import pytest

pytest.importorskip("grain")

from fabric_tpu.config import Config
from fabric_tpu.data import full_load, get_train_val_metadata
from fabric_tpu.data.grain_pipeline import grain_batch_iterator
from fabric_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("grain"))
    cfg = Config(dataset_dir=root, validation_cities=["beta"])
    generate_synthetic_dataset(root, cfg)
    data = full_load(root, cfg)
    md, _ = get_train_val_metadata(root, ["beta"], 16, 16)
    return data, md


def test_grain_bidate_batches(setup):
    data, md = setup
    batches = list(grain_batch_iterator(data, md, 16, 4, shuffle=True,
                                        augment=True, seed=0))
    assert len(batches) == -(-len(md) // 4)  # every sample seen (ceil)
    b = batches[0]
    assert b["img1"].shape == (4, 16, 16, 13)
    assert b["img2"].shape == (4, 16, 16, 13)
    assert b["label"].shape == (4, 16, 16) and b["label"].dtype == np.int32
    assert b["weight"].shape == (4,)


def test_grain_remainder_padding_matches_numpy_contract(setup):
    """The epoch tail is padded, not dropped: fixed shapes, wrap→weight 1,
    mask→weight 0 on the repeats (same contract as data/pipeline.py)."""
    data, md = setup
    n, bs = len(md), 4
    rem = n % bs
    if rem == 0:  # force a remainder
        md = md[:-1]
        n, rem = n - 1, (n - 1) % bs
    assert rem != 0
    for pad_mode, padw in (("wrap", 1.0), ("mask", 0.0)):
        batches = list(grain_batch_iterator(data, md, 16, bs, shuffle=False,
                                            augment=False,
                                            pad_mode=pad_mode))
        assert len(batches) == -(-n // bs)
        last = batches[-1]
        assert last["img1"].shape == (bs, 16, 16, 13)
        np.testing.assert_array_equal(last["weight"][rem:],
                                      np.full(bs - rem, padw, np.float32))
        np.testing.assert_array_equal(last["weight"][:rem],
                                      np.ones(rem, np.float32))
        # padded rows are repeats of real rows from the same batch
        np.testing.assert_array_equal(last["img1"][rem],
                                      last["img1"][0])


def test_grain_multi_date_batches(setup):
    data, md = setup
    b = next(iter(grain_batch_iterator(data, md, 16, 4, shuffle=False,
                                       augment=False, multi_date=True)))
    assert b["imgs"].shape == (4, 2, 16, 16, 13)
    assert "img1" not in b


def test_grain_shuffle_is_deterministic(setup):
    data, md = setup
    a = next(iter(grain_batch_iterator(data, md, 4, 4, shuffle=True,
                                       augment=False, seed=7)))
    b = next(iter(grain_batch_iterator(data, md, 4, 4, shuffle=True,
                                       augment=False, seed=7)))
    np.testing.assert_array_equal(a["img1"], b["img1"])
    c = next(iter(grain_batch_iterator(data, md, 4, 4, shuffle=True,
                                       augment=False, seed=8)))
    assert not np.array_equal(a["img1"], c["img1"])


def test_grain_feeds_train_step(setup):
    import jax
    from fabric_tpu.losses import get_loss_fn
    from fabric_tpu.models import build_model
    from fabric_tpu.train.state import create_state
    from fabric_tpu.train.steps import make_train_step
    data, md = setup
    cfg = Config(patch_size=16, dtype="float32", model_base=8)
    model = build_model(cfg)
    state = create_state(cfg, model)
    step = make_train_step(model, get_loss_fn(cfg), donate=False)
    batch = next(iter(grain_batch_iterator(data, md, 16, 4, shuffle=True,
                                           augment=True)))
    state, stats = step(state, jax.device_put(batch))
    assert np.isfinite(float(stats["loss"]))
