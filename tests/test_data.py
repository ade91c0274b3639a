"""Data layer tests: patch grid semantics, city loading + normalization,
sampler augmentation, fixed-shape batching, prefetch."""

import numpy as np
import pytest

from fabric_tpu.config import Config
from fabric_tpu.data import (
    list_cities, patch_grid, get_train_val_metadata, load_label, load_city,
    full_load, PatchSampler, batch_iterator, prefetch_to_device,
)
from fabric_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("oscd"))
    cfg = Config()
    generate_synthetic_dataset(root, cfg)
    return root


def test_patch_grid_matches_reference_semantics():
    # reference: range(0, shape, stride) with i+ps <= shape bound
    # (dataloaders.py:60-66)
    coords = patch_grid((200, 150), patch_size=90, stride=60)
    expected = [(i, j) for i in range(0, 200, 60) for j in range(0, 150, 60)
                if i + 90 <= 200 and j + 90 <= 150]
    assert coords == expected
    assert coords == [(0, 0), (0, 60), (60, 0), (60, 60)]


def test_list_cities_sorted(dataset_dir):
    assert list_cities(dataset_dir) == ["alpha", "beta", "gamma"]


def test_load_label_binary(dataset_dir):
    lab = load_label(dataset_dir, "alpha")
    assert lab.dtype == np.uint8
    assert set(np.unique(lab)) <= {0, 1}
    assert lab.shape == (97, 113)


def test_load_city_normalized_nhwc(dataset_dir):
    cfg = Config()
    img = load_city(dataset_dir, "alpha", cfg)
    assert img.shape == (2, 97, 113, 13)
    assert img.dtype == np.float32
    # synthetic bands are N(mean, std) per band, so normalized ~ N(0,1)
    assert abs(float(img[0].mean())) < 0.3
    assert 0.5 < float(img[0].std()) < 1.5


def test_load_city_resize_to_override(dataset_dir):
    cfg = Config()
    img = load_city(dataset_dir, "alpha", cfg, out_shape=(50, 60))
    assert img.shape == (2, 50, 60, 13)


def test_full_load_and_metadata(dataset_dir):
    cfg = Config(validation_cities=["beta"])
    data = full_load(dataset_dir, cfg)
    assert set(data) == {"alpha", "beta", "gamma"}
    train_md, val_md = get_train_val_metadata(
        dataset_dir, ["beta"], patch_size=32, stride=32)
    assert all(c in ("alpha", "gamma") for c, _, _ in train_md)
    assert all(c == "beta" for c, _, _ in val_md)
    assert len(val_md) == len(patch_grid((128, 96), 32, 32))


def test_sampler_and_augmentation(dataset_dir):
    cfg = Config(validation_cities=["beta"])
    data = full_load(dataset_dir, cfg)
    train_md, _ = get_train_val_metadata(dataset_dir, ["beta"], 32, 32)
    s_aug = PatchSampler(data, train_md, 32, augment=True, seed=1)
    s_raw = PatchSampler(data, train_md, 32, augment=False, seed=1)
    a1, a2, al = s_aug.sample(0)
    r1, r2, rl = s_raw.sample(0)
    assert a1.shape == (32, 32, 13) and al.shape == (32, 32)
    # augmented crop is a rot/flip of the raw crop: same multiset of values
    assert np.isclose(a1.sum(), r1.sum(), rtol=1e-5)
    # label and image transform together: label-conditioned mean must match
    m_aug = a2[al == 1].mean() if (al == 1).any() else 0
    m_raw = r2[rl == 1].mean() if (rl == 1).any() else 0
    assert np.isclose(m_aug, m_raw, rtol=1e-4)


def test_batch_iterator_fixed_shapes(dataset_dir):
    cfg = Config(validation_cities=["beta"])
    data = full_load(dataset_dir, cfg)
    _, val_md = get_train_val_metadata(dataset_dir, ["beta"], 32, 32)
    sampler = PatchSampler(data, val_md, 32, augment=False)
    n = len(sampler)
    bs = 5
    batches = list(batch_iterator(sampler, bs, shuffle=False, pad_mode="mask"))
    assert all(b["img1"].shape == (bs, 32, 32, 13) for b in batches)
    assert all(b["label"].dtype == np.int32 for b in batches)
    total_weight = sum(float(b["weight"].sum()) for b in batches)
    assert total_weight == n  # mask-pad: weights count real samples exactly
    wrap = list(batch_iterator(sampler, bs, shuffle=True, pad_mode="wrap"))
    assert sum(float(b["weight"].sum()) for b in wrap) == len(wrap) * bs


def test_prefetch_to_device(dataset_dir):
    cfg = Config(validation_cities=["beta"])
    data = full_load(dataset_dir, cfg)
    _, val_md = get_train_val_metadata(dataset_dir, ["beta"], 32, 32)
    sampler = PatchSampler(data, val_md, 32, augment=False)
    it = batch_iterator(sampler, 4, shuffle=False)
    out = list(prefetch_to_device(it, size=2))
    assert len(out) >= 1
    import jax
    assert isinstance(out[0]["img1"], jax.Array)


def test_prefetch_propagates_errors():
    def bad():
        yield {"img1": np.zeros(2)}
        raise RuntimeError("boom")
    with pytest.raises(RuntimeError, match="boom"):
        list(prefetch_to_device(bad(), size=2))


def test_metadata_from_dataset_matches_disk(dataset_dir):
    """An injected in-memory dataset must yield the same patch metadata as
    the on-disk reader (r2 weak #6: the loop used to re-open every label
    PNG even with dataset= passed)."""
    from fabric_tpu.data import metadata_from_dataset
    cfg = Config(patch_size=32, stride=32)
    data = full_load(dataset_dir, cfg)
    disk = get_train_val_metadata(dataset_dir, ["gamma"], 32, 32)
    mem = metadata_from_dataset(data, ["gamma"], 32, 32)
    assert mem == disk


def test_compat_aug_stream_matches_reference_loader(dataset_dir):
    """PatchSampler(compat_aug_stream=...) reproduces the reference's
    augmented patches BIT-FOR-BIT from the same seeded python-random
    stream: the two sides draw (randint(0,3), random(), random()) per
    sample in the same order and apply the same rot90/flip sequence
    (/root/reference/utils/dataloaders.py:148-165 — re-implemented here
    as a numpy oracle in the reference's (2, C, H, W) layout; no
    reference code imported)."""
    import random as pyrandom

    from fabric_tpu.data.oscd import full_load
    from fabric_tpu.data.pipeline import PatchSampler

    cfg = Config(dataset_dir=dataset_dir, patch_size=16)
    data = full_load(dataset_dir, cfg)
    city = sorted(data)[0]
    md = [(city, 0, 0), (city, 16, 16), (city, 0, 16), (city, 16, 0)] * 3

    def reference_loader(dataset, city, x, y, size, stream):
        # the reference's onera_siamese_loader math on its (2, C, H, W)
        # tensors, with `random` replaced by the passed stream
        chw = dataset[city]["images"].transpose(0, 3, 1, 2)
        out_img = np.copy(chw[:, :, x:x + size, y:y + size])
        out_lbl = np.copy(dataset[city]["labels"][x:x + size, y:y + size])
        rot_deg = stream.randint(0, 3)
        out_img = np.rot90(out_img, rot_deg, [2, 3]).copy()
        out_lbl = np.rot90(out_lbl, rot_deg, [0, 1]).copy()
        if stream.random() > 0.5:
            out_img = np.flip(out_img, axis=2).copy()
            out_lbl = np.flip(out_lbl, axis=0).copy()
        if stream.random() > 0.5:
            out_img = np.flip(out_img, axis=3).copy()
            out_lbl = np.flip(out_lbl, axis=1).copy()
        return out_img[0], out_img[1], out_lbl

    sampler = PatchSampler(data, md, 16, augment=True,
                           compat_aug_stream=pyrandom.Random(42))
    oracle_stream = pyrandom.Random(42)
    for i in range(len(md)):
        a, b, lbl = sampler.sample(i)
        city_i, x, y = md[i]
        ra, rb, rlbl = reference_loader(data, city_i, x, y, 16,
                                        oracle_stream)
        # ours is NHWC; the oracle is CHW
        np.testing.assert_array_equal(a.transpose(2, 0, 1), ra, err_msg=f"sample {i} d1")
        np.testing.assert_array_equal(b.transpose(2, 0, 1), rb, err_msg=f"sample {i} d2")
        np.testing.assert_array_equal(lbl, rlbl, err_msg=f"sample {i} label")


def test_compat_aug_stream_skip_batches_bit_identical(dataset_dir):
    """Mid-epoch resume with the compat stream: skipping the first N
    batches replays their draws, so batch N is bit-identical to the
    uninterrupted iteration's."""
    import random as pyrandom

    from fabric_tpu.data.oscd import full_load
    from fabric_tpu.data.pipeline import PatchSampler, batch_iterator

    cfg = Config(dataset_dir=dataset_dir, patch_size=16)
    data = full_load(dataset_dir, cfg)
    city = sorted(data)[0]
    md = [(city, 0, 0), (city, 16, 16), (city, 0, 16), (city, 16, 0)] * 2

    def run(skip):
        sampler = PatchSampler(data, md, 16, augment=True,
                               compat_aug_stream=pyrandom.Random(3))
        return list(batch_iterator(sampler, 4, shuffle=False,
                                   skip_batches=skip))

    full = run(0)
    tail = run(1)
    assert len(full) == 2 and len(tail) == 1
    for k in full[1]:
        np.testing.assert_array_equal(full[1][k], tail[0][k])


def test_ragged_tail_batches_and_stream_draw_count(dataset_dir):
    """compat_reference training on a dataset that doesn't divide the
    batch: ``ragged_tail=True`` emits the final short batch exactly like
    the reference's DataLoader (drop_last=False), and an epoch consumes
    EXACTLY len(sampler) augmentation triples from the compat stream —
    wrap-pad would over-draw and silently desynchronize epoch 2+."""
    import random as pyrandom

    from fabric_tpu.data.oscd import full_load
    from fabric_tpu.data.pipeline import (PatchSampler, batch_iterator,
                                          epoch_train_rows,
                                          replay_aug_draws)

    cfg = Config(dataset_dir=dataset_dir, patch_size=16)
    data = full_load(dataset_dir, cfg)
    city = sorted(data)[0]
    md = [(city, 0, 0), (city, 16, 16), (city, 0, 16), (city, 16, 0),
          (city, 0, 0), (city, 16, 0)]  # 6 samples, batch 4 -> 4 + 2

    stream = pyrandom.Random(9)
    sampler = PatchSampler(data, md, 16, augment=True,
                           compat_aug_stream=stream)
    batches = list(batch_iterator(sampler, 4, shuffle=False,
                                  ragged_tail=True))
    assert [b["label"].shape[0] for b in batches] == [4, 2]
    assert all((b["weight"] == 1.0).all() for b in batches)
    # the stream advanced by exactly 6 (randint, random, random) triples
    oracle = pyrandom.Random(9)
    replay_aug_draws(oracle, len(md))
    assert stream.random() == oracle.random()
    assert epoch_train_rows(len(md), 4, ragged_tail=True) == 6

    # without ragged_tail the compat stream would desynchronize — loudly
    # rejected, never silent
    sampler2 = PatchSampler(data, md, 16, augment=True,
                            compat_aug_stream=pyrandom.Random(9))
    with pytest.raises(ValueError, match="ragged_tail"):
        list(batch_iterator(sampler2, 4, shuffle=False))


def test_ragged_tail_skip_batches_replay(dataset_dir):
    """Mid-epoch resume composes with the ragged tail: skipping past it
    replays only the real rows' draws (not a full batch's worth)."""
    import random as pyrandom

    from fabric_tpu.data.oscd import full_load
    from fabric_tpu.data.pipeline import PatchSampler, batch_iterator

    cfg = Config(dataset_dir=dataset_dir, patch_size=16)
    data = full_load(dataset_dir, cfg)
    city = sorted(data)[0]
    md = [(city, 0, 0), (city, 16, 16), (city, 0, 16), (city, 16, 0),
          (city, 0, 0), (city, 16, 0)]

    def run(skip):
        sampler = PatchSampler(data, md, 16, augment=True,
                               compat_aug_stream=pyrandom.Random(5))
        s = sampler.compat_aug_stream
        batches = list(batch_iterator(sampler, 4, shuffle=False,
                                      skip_batches=skip, ragged_tail=True))
        return batches, s.random()  # stream position probe

    full, pos_full = run(0)
    tail_only, pos_tail = run(1)
    done, pos_done = run(2)  # skip INCLUDES the ragged tail
    assert len(tail_only) == 1 and not done
    for k in full[1]:
        np.testing.assert_array_equal(full[1][k], tail_only[0][k])
    # every skip depth lands the stream at the same end-of-epoch position
    assert pos_full == pos_tail == pos_done


def test_compat_aug_stream_rejects_multiprocess(dataset_dir):
    import random as pyrandom

    from fabric_tpu.data.oscd import full_load
    from fabric_tpu.data.pipeline import PatchSampler, batch_iterator

    cfg = Config(dataset_dir=dataset_dir, patch_size=16)
    data = full_load(dataset_dir, cfg)
    city = sorted(data)[0]
    sampler = PatchSampler(data, [(city, 0, 0)] * 4, 16, augment=True,
                           compat_aug_stream=pyrandom.Random(0))
    with pytest.raises(ValueError, match="single-process"):
        list(batch_iterator(sampler, 4, shuffle=False, process_index=0,
                            process_count=2))
