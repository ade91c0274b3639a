"""Patch sampling, augmentation, batching, and device prefetch.

Replaces the reference's OneraPreloader + torch DataLoader stack
(utils/dataloaders.py:148-198, utils/helpers.py:211-258) with a host-side
numpy pipeline feeding a device-prefetch queue:

- ``PatchSampler`` crops (2, ps, ps, 13) windows from the in-RAM city cache
  and applies the reference augmentations (random rot90 k∈0..3 + independent
  H/V flips, dataloaders.py:148-165).
- ``batch_iterator`` yields fixed-shape batches.  jit recompiles per shape,
  so instead of the reference's ragged final batch we either wrap-pad the
  shuffled index list (train: a few head samples repeat) or mask-pad
  (eval: a per-sample ``weight`` vector zeroes the padding in loss/metrics).
- ``prefetch_to_device`` overlaps host batch assembly + H2D copy with device
  compute via a background thread (the reference's num_workers analogue).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


def _sharding_for(sharding, item):
    """Match a {key: Sharding} dict (or a single Sharding) to a batch dict."""
    if isinstance(sharding, dict):
        return {k: sharding[k] for k in item}
    return {k: sharding for k in item}


class PatchSampler:
    """Crops + augments patches from the full in-RAM dataset dict.

    ``compat_aug_stream``: a ``random.Random`` instance — augmentation
    decisions then consume the python-``random`` stream SEQUENTIALLY with
    the reference's exact draw order (``randint(0, 3)`` for the rotation,
    two ``random() > 0.5`` for the flips, per sample in materialization
    order — /root/reference/utils/dataloaders.py:148-165), so a seeded
    stream reproduces the reference's augmented patches bit-for-bit (the
    aug-on loop-parity harness).  Sequential consumption is inherently
    single-process; default None = per-row keyed numpy RNG (any process
    count, any skip offset)."""

    def __init__(self, dataset: dict, metadata: list, patch_size: int,
                 augment: bool, seed: int = 0, multi_date: bool = False,
                 compat_aug_stream=None):
        self.dataset = dataset
        self.metadata = list(metadata)
        self.patch_size = patch_size
        self.augment = augment
        self.multi_date = multi_date
        self.rng = np.random.RandomState(seed)
        self.compat_aug_stream = compat_aug_stream

    def __len__(self) -> int:
        return len(self.metadata)

    def _aug_decisions(self):
        """(k, flip_h, flip_w) from the configured RNG, in the reference's
        draw order."""
        if self.compat_aug_stream is not None:
            st = self.compat_aug_stream
            return st.randint(0, 3), st.random() > 0.5, st.random() > 0.5
        return (self.rng.randint(0, 4), self.rng.rand() > 0.5,
                self.rng.rand() > 0.5)

    def _crop(self, index: int):
        city, x, y = self.metadata[index]
        s = self.patch_size
        entry = self.dataset[city]
        img = entry["images"][:, x:x + s, y:y + s, :]
        lbl = entry["labels"][x:x + s, y:y + s]
        if self.augment:
            k, flip_h, flip_w = self._aug_decisions()
            if k:
                img = np.rot90(img, k, axes=(1, 2))
                lbl = np.rot90(lbl, k, axes=(0, 1))
            if flip_h:
                img = np.flip(img, axis=1)
                lbl = np.flip(lbl, axis=0)
            if flip_w:
                img = np.flip(img, axis=2)
                lbl = np.flip(lbl, axis=1)
        return img, lbl

    def sample(self, index: int):
        """Bi-date: (img_d1, img_d2, label).  Multi-date: (imgs (T,ps,ps,C),
        label)."""
        img, lbl = self._crop(index)
        if self.multi_date:
            return np.ascontiguousarray(img), np.ascontiguousarray(lbl)
        return (np.ascontiguousarray(img[0]), np.ascontiguousarray(img[1]),
                np.ascontiguousarray(lbl))


def batch_iterator(sampler: PatchSampler, batch_size: int, shuffle: bool,
                   pad_mode: str = "wrap", seed: int = 0,
                   max_batches: int = 0, process_index: int = 0,
                   process_count: int = 1,
                   skip_batches: int = 0,
                   ragged_tail: bool = False) -> Iterator[dict]:
    """Yield {'img1','img2','label','weight'} numpy batches of fixed shape.

    ``batch_size`` is the GLOBAL batch size.  pad_mode 'wrap': short
    remainder is filled with wrapped-around samples, weight=1 everywhere
    (training).  pad_mode 'mask': remainder filled with repeats but weight=0
    so losses/metrics ignore them (eval).

    ``ragged_tail`` (compat_reference training): emit the final short
    batch RAGGED — len(sampler) % batch_size real rows, nothing else —
    exactly like the reference's torch DataLoader (drop_last=False).
    Fixed-shape padding cannot reproduce that batch bit-for-bit: wrap-pad
    rows change the gradient AND consume extra compat-aug stream draws,
    and even mask-pad rows enter the train-mode BatchNorm batch
    statistics.  The cost is one extra jit compile for the tail shape;
    single-process only (a ragged global batch does not shard).

    Multi-host: every process derives the identical global sample order from
    ``seed`` and materializes only its own ``batch_size/process_count``-row
    slice of each global batch (host work divides across processes);
    :func:`prefetch_to_device` reassembles the logical global array from the
    local shards via ``jax.make_array_from_process_local_data``.

    ``skip_batches`` fast-forwards past the first N batches without
    materializing them (mid-epoch resume): the shuffle order and the
    per-global-row augmentation RNG keys are both pure functions of
    ``seed``, so batch b is bit-identical whether or not 0..b-1 were
    produced.
    """
    n = len(sampler)
    if n == 0:
        return
    if batch_size % process_count:
        raise ValueError(f"global batch_size {batch_size} not divisible by "
                         f"process_count {process_count}")
    if ragged_tail and process_count != 1:
        raise ValueError("ragged_tail emits a final batch of "
                         "len(sampler) % batch_size rows — it does not "
                         "shard across processes")
    compat_stream = getattr(sampler, "compat_aug_stream", None)
    if compat_stream is not None and sampler.augment:
        if process_count != 1:
            raise ValueError(
                "compat_aug_stream consumes one sequential python-random "
                "stream (the reference's aug semantics) — single-process "
                "only; use the default keyed-RNG augmentation for "
                "multi-process runs")
        nb_full = n // batch_size
        if (n % batch_size and not ragged_tail
                and not (max_batches and max_batches <= nb_full)):
            # wrap-pad rows would consume (randint, random, random)
            # triples the reference's ragged final batch never draws —
            # from epoch 2 every augmentation decision would silently
            # diverge.  The loop enables ragged_tail in compat mode; any
            # other caller must choose explicitly.  (A max_batches cap
            # that stops before the padded tail never materializes the
            # pad rows, so no desync — allowed.)
            raise ValueError(
                f"compat_aug_stream with {n} samples % batch_size "
                f"{batch_size} != 0 requires ragged_tail=True: padded "
                f"rows would desynchronize the sequential augmentation "
                f"stream from the reference's ragged final batch")
        if skip_batches:
            # mid-epoch fast-forward: each skipped row consumed exactly
            # the (randint, random, random) triple — replay it so batch b
            # is bit-identical whether or not 0..b-1 were materialized.
            # Skipped batches are full EXCEPT a skipped ragged tail (only
            # ever the last batch): min() caps the replay at the epoch's
            # real row count.
            replay_aug_draws(compat_stream,
                             min(skip_batches * batch_size, n)
                             if ragged_tail else skip_batches * batch_size)
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    pad = 0 if ragged_tail else (-n) % batch_size
    weights = np.ones(n + pad, np.float32)
    if pad:
        order = np.concatenate([order, order[:pad]])
        if pad_mode == "mask":
            weights[n:] = 0.0
    num_batches = (len(order) + batch_size - 1) // batch_size \
        if ragged_tail else len(order) // batch_size
    if max_batches:
        num_batches = min(num_batches, max_batches)
    ps = sampler.patch_size
    # Augmentation RNG is keyed by (seed, global row position), NOT by a
    # shared sequential stream: every global batch is bit-identical no
    # matter how many processes materialize it (the multi-process parity
    # test relies on this).
    for b in range(skip_batches, num_batches):
        full_lo = b * batch_size
        local = min(batch_size, len(order) - full_lo) // process_count
        lo = full_lo + process_index * local
        idx = order[lo:lo + local]
        label = np.empty((local, ps, ps), np.int32)
        w = weights[lo:lo + local].copy()
        rngs = [np.random.RandomState(
            (seed * 1_000_003 + lo + r) % (2 ** 31)) for r in range(local)]
        if sampler.multi_date:
            first, l0 = _sample(sampler, int(idx[0]), rngs[0])
            imgs = np.empty((local,) + first.shape, np.float32)
            imgs[0], label[0] = first, l0
            for row, i in enumerate(idx[1:], start=1):
                imgs[row], label[row] = _sample(sampler, int(i), rngs[row])
            yield {"imgs": imgs, "label": label, "weight": w}
            continue
        img1 = np.empty((local, ps, ps, 13), np.float32)
        img2 = np.empty_like(img1)
        for row, i in enumerate(idx):
            a, c, l = _sample(sampler, int(i), rngs[row])
            img1[row], img2[row], label[row] = a, c, l
        yield {"img1": img1, "img2": img2, "label": label, "weight": w}


def _sample(sampler: PatchSampler, index: int, rng):
    """sampler.sample with a per-row RNG override (multi-process
    determinism: the same global row augments identically on any process).
    A compat_aug_stream sampler ignores the override — its draws are
    sequential by design."""
    saved = sampler.rng
    sampler.rng = rng
    try:
        return sampler.sample(index)
    finally:
        sampler.rng = saved


def replay_aug_draws(stream, rows: int) -> None:
    """Fast-forward a compat augmentation stream past ``rows`` samples by
    replaying the reference's exact per-sample draw sequence (randint +
    2x random — consuming the same Mersenne-Twister words matters, a
    plain skip-count would desynchronize)."""
    for _ in range(rows):
        stream.randint(0, 3)
        stream.random()
        stream.random()


def epoch_train_rows(n_samples: int, batch_size: int,
                     max_batches: int = 0,
                     ragged_tail: bool = False) -> int:
    """Rows one epoch's batch_iterator materializes (wrap-pad included;
    with ``ragged_tail`` the final batch is short, so a full epoch is
    exactly ``n_samples`` rows) — how far the compat aug stream advances
    per completed epoch (used to fast-forward it on resume)."""
    if ragged_tail:
        nb = (n_samples + batch_size - 1) // batch_size
        if max_batches and max_batches < nb:
            return max_batches * batch_size  # cap cuts before the tail
        return n_samples
    pad = (-n_samples) % batch_size
    nb = (n_samples + pad) // batch_size
    if max_batches:
        nb = min(nb, max_batches)
    return nb * batch_size


def prefetch_to_device(iterator: Iterator[dict], size: int = 2,
                       sharding=None) -> Iterator[dict]:
    """Background-thread prefetch + host→device placement.

    ``sharding`` may be a jax Sharding (or pytree of them) to place batches
    directly into their mesh layout, avoiding a host round trip under pjit.

    Multi-process (pod) runs: each process's iterator yields only its local
    rows (see :func:`batch_iterator`); the shards are assembled into one
    logical global jax.Array per leaf with
    ``jax.make_array_from_process_local_data`` — a plain ``device_put``
    against a global NamedSharding is single-process-only.
    """
    import jax

    if jax.process_count() > 1 and sharding is not None:
        def put(item):
            return jax.tree_util.tree_map(
                lambda s, x: jax.make_array_from_process_local_data(s, x),
                _sharding_for(sharding, item), item)
    else:
        def put(item):
            return (jax.device_put(item, sharding) if sharding is not None
                    else jax.device_put(item))

    if size <= 0:
        for item in iterator:
            yield put(item)
        return

    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err: list[BaseException] = []

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.name = "fabric-prefetch"
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
