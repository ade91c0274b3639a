"""Seamless whole-scene inference: the U-Net run fully convolutionally
over halo-extended horizontal bands of the scene.

The reference can only run the network on fixed tiles and stitch
(non-overlapping grid, utils/inference.py:134-236) or average overlapping
tiles — every mask pixel is predicted from at most one patch of context
and tile seams are visible (grid) or cost 4x the compute (overlap 32).
But the model is fully convolutional: nothing in it needs the 90-px patch
shape.  Run on the WHOLE scene, every pixel gets its full receptive field
of context, each pixel is computed exactly once, and there are no seams
at all.

A whole scene does not fit in HBM at full activation resolution, so the
scene is processed in horizontal bands of ``band_rows`` pixel rows, each
extended by a ``halo`` of context rows on both sides; after the forward,
the halo rows are cropped away.  Because every op in the network is
translation invariant for shifts that are multiples of the total stride
(16 = 4 max-pools) — convs are SAME, pooling grids align when band
starts are 16-aligned, and the decoder uses the shift-invariant local
upsample (ops/resize.upsample2x_local; the align-corners grid the tiled
modes keep for reference parity is position-dependent and would NOT
commute with crops) — a halo that covers the receptive field makes the
banded result EXACTLY equal to a single full-scene forward
(tests/test_fullconv.py pins this, and pins that an insufficient halo
breaks it).

The model's receptive-field radius is ~115 px (measured by
``receptive_field_radius`` below; architecture-determined, independent of
``base``), so the default ``halo=128`` (rounded up to the stride) is
exact with one 16-px step of margin.  Compute overhead over grid-mode
tiling is just the halo redundancy: ``(band_rows + 2*halo) / band_rows``
(1.25x at the 1024-row default) — ~4x cheaper than overlap-averaged
stitching while producing strictly more context per pixel than any tiled
mode.

All uniform interior bands run under one ``lax.fori_loop`` body (single
compiled forward regardless of scene height); a short tail band, if the
16-aligned scene height is not a band multiple, gets its own static
shape.  Peak memory is one band's activations plus the uint8 canvas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

STRIDE = 16  # total U-Net downsampling factor (4 max-pools)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def receptive_field_radius(model=None, base: int = 4) -> int:
    """Measured receptive-field radius (px) of the bi-date U-Net: perturb
    one input pixel, return how far the eval-mode output changes.  Used by
    tests to validate the default halo; depth-determined, so ``base`` can
    be tiny."""
    from fabric_tpu.models.bidate import BiDateNet
    if model is None:
        model = BiDateNet(base=base, dtype=jnp.float32, local_upsample=True)
    h = w = 384
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, h, w, 13), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    y0 = model.apply(variables, x, x, train=False)
    xp = x.at[0, h // 2, w // 2].add(10.0)
    y1 = model.apply(variables, xp, xp, train=False)
    changed = np.any(np.abs(np.asarray(y1 - y0)) > 0, axis=(0, 3))
    rows = np.where(changed.any(axis=1))[0]
    cols = np.where(changed.any(axis=0))[0]
    return int(max(abs(rows - h // 2).max(), abs(cols - w // 2).max()))


def make_fullconv_scene_infer(model, scene_shape: tuple[int, int],
                              band_rows: int = 1024, halo: int = 128,
                              dtype=jnp.bfloat16, band_batch: int = 1):
    """Build a jitted ``run(variables, scene1, scene2) -> (H, W) uint8``
    seamless whole-scene change-mask function.

    ``model`` must use the shift-invariant decoder upsample
    (``BiDateNet(local_upsample=True)``) — with the align-corners grid the
    banded result would not be crop-consistent.  ``band_rows`` and
    ``halo`` must be multiples of the U-Net stride (16).  The scene is
    edge-padded up to stride alignment and the mask cropped back.

    ``band_batch=B`` gathers B consecutive halo-extended bands into ONE
    (B, ctx_h, W, C) forward instead of running them sequentially at
    batch 1: batch-1 full-width convs lower at ~15 TFLOP/s on the v5e
    where batched tiles hit ~76 (BASELINE.md train-wall attribution), so
    batching the bands trades halo redundancy — smaller bands at batch B
    recompute ``(band_rows + 2*halo) / band_rows`` of the rows, 2x at 256
    vs 1.25x at 1024 — against the batched-conv rate.  Peak activation
    memory scales with ``B * (band_rows + 2*halo)`` rows, so B and
    band_rows move in opposition at fixed HBM.  The gathered windows and
    per-band crops are byte-identical to the sequential path's, and the
    forward is batch-invariant (BN folded, convs deterministic), so masks
    are EXACTLY equal for every B (tests/test_fullconv.py pins it).
    Measured v5e sweep: BASELINE.md "batched-band fullconv".
    """
    h, w = scene_shape
    if band_rows % STRIDE or halo % STRIDE:
        raise ValueError(f"band_rows and halo must be multiples of "
                         f"{STRIDE} (got {band_rows}, {halo})")
    if band_batch < 1:
        raise ValueError(f"band_batch must be >= 1 (got {band_batch})")
    if getattr(model, "local_upsample", True) is False:
        raise ValueError("fullconv banding requires the shift-invariant "
                         "decoder upsample: build the model with "
                         "local_upsample=True (align-corners upsampling "
                         "is position-dependent and does not commute "
                         "with scene crops)")
    hp, wp = _round_up(h, STRIDE), _round_up(w, STRIDE)
    apply_fn = model.apply if hasattr(model, "apply") else model

    def prob_map(variables, c1, c2):
        logits = apply_fn(variables, c1[None], c2[None], train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[0, ..., 1]

    def prob_map_batched(variables, c1, c2):
        # (B, ctx_h, wp, C) -> (B, ctx_h, wp) change probabilities
        logits = apply_fn(variables, c1, c2, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]

    ctx_h = min(hp, band_rows + 2 * halo)
    n_uniform, tail = divmod(hp, band_rows) if ctx_h < hp else (0, 0)

    @jax.jit
    def run(variables, scene1, scene2):
        s1 = jnp.pad(scene1.astype(dtype),
                     ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")
        s2 = jnp.pad(scene2.astype(dtype),
                     ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")
        if ctx_h == hp:
            mask = (prob_map(variables, s1, s2) > 0.5).astype(jnp.uint8)
            return mask[:h, :w]

        def band(canvas, y0, rows):
            # context window: halo above/below, clamped into the scene but
            # kept at the uniform ctx_h height (so every interior band —
            # including the edge-clamped first/last — shares ONE compiled
            # forward); offsets stay 16-aligned by construction.
            cs = jnp.clip(y0 - halo, 0, hp - ctx_h)
            c1 = jax.lax.dynamic_slice(
                s1, (cs, 0, 0), (ctx_h, wp, s1.shape[-1]))
            c2 = jax.lax.dynamic_slice(
                s2, (cs, 0, 0), (ctx_h, wp, s2.shape[-1]))
            p = prob_map(variables, c1, c2)
            band_mask = jax.lax.dynamic_slice(
                (p > 0.5).astype(jnp.uint8), (y0 - cs, 0), (rows, wp))
            return jax.lax.dynamic_update_slice(canvas, band_mask, (y0, 0))

        def band_group(canvas, y0, nb):
            # nb consecutive bands as one batched forward: gather their
            # (identically-clamped) context windows, run (nb, ctx_h, wp, C)
            # through the net, crop each band's kept rows, and paste the
            # contiguous (nb * band_rows, wp) slab in one update
            y0s = y0 + band_rows * jnp.arange(nb)
            css = jnp.clip(y0s - halo, 0, hp - ctx_h)
            gather = jax.vmap(lambda s, cs: jax.lax.dynamic_slice(
                s, (cs, 0, 0), (ctx_h, wp, s.shape[-1])), in_axes=(None, 0))
            p = prob_map_batched(variables, gather(s1, css), gather(s2, css))
            m = (p > 0.5).astype(jnp.uint8)
            keep = jax.vmap(lambda mi, off: jax.lax.dynamic_slice(
                mi, (off, 0), (band_rows, wp)))(m, y0s - css)
            return jax.lax.dynamic_update_slice(
                canvas, keep.reshape(nb * band_rows, wp), (y0, 0))

        canvas = jnp.zeros((hp, wp), jnp.uint8)
        if band_batch == 1:
            canvas = jax.lax.fori_loop(
                0, n_uniform,
                lambda i, c: band(c, i * band_rows, band_rows), canvas)
        else:
            bb = min(band_batch, n_uniform)  # no group taller than the scene
            n_groups, rem = divmod(n_uniform, bb)
            group_rows = bb * band_rows
            if n_groups:  # fori_loop traces its body even for zero trips
                canvas = jax.lax.fori_loop(
                    0, n_groups,
                    lambda g, c: band_group(c, g * group_rows, bb), canvas)
            if rem:  # leftover uniform bands: one smaller static batch
                canvas = band_group(canvas, n_groups * group_rows, rem)
        if tail:
            canvas = band(canvas, n_uniform * band_rows, tail)
        return canvas[:h, :w]

    return run


def make_fullconv_scene_infer_streamed(model, scene_shape: tuple[int, int],
                                       band_rows: int = 1024,
                                       halo: int = 128,
                                       dtype=jnp.bfloat16,
                                       max_in_flight: int = 2,
                                       padded_shape: tuple[int, int]
                                       | None = None):
    """Host-streamed seamless inference: like
    :func:`make_fullconv_scene_infer`, but the scene NEVER resides on the
    device — each halo-extended band is sliced out of the host arrays
    (plain ndarrays or ``np.memmap``), uploaded, run, and its kept rows
    brought back into a host canvas.  Peak HBM is one band's activations
    plus its context window, independent of scene size: on a 16 GB chip
    the in-HBM path tops out around 16k² (two bf16 13-band scenes are
    ~13 GB), while this path's device footprint at the 1024-row default
    is ~0.6 GB regardless of H — scene size is bounded only by host
    storage.

    ``padded_shape``: virtually edge-pad the scene to these dims before
    banding (rows/cols sliced past the true extent replicate the edge,
    without materializing a padded copy) — pass the serving bucket dims
    to make the streamed mask byte-identical to the in-HBM runner built
    for the bucket-padded scene (ScenePredictor does).  Default: the
    stride-aligned scene dims.  Bands lying entirely in the pad region
    are skipped, not computed — padding costs only the partial last band.

    The math is identical to the in-HBM path band for band — same edge
    padding, same clamped 16-aligned context windows — so the result is
    exactly the whole-scene forward (tests/test_fullconv.py pins streamed
    == in-HBM == whole-scene).  Upload/compute overlap via JAX async
    dispatch with at most ``max_in_flight`` bands outstanding (bounds the
    number of live context buffers on device).

    Returns ``run(variables, scene1, scene2, out=None) -> (H, W) uint8``
    — ``scene1``/``scene2`` host (H, W, C) arrays; pass ``out`` (e.g. a
    ``np.memmap``) to stream the mask to bounded host memory too.

    Reference equivalent being replaced: none — the reference tiles on
    the host and is bounded by host RAM (utils/inference.py:134-181);
    this serves unbounded scenes seamlessly from disk on one chip.
    """
    from collections import deque

    h, w = scene_shape
    if band_rows % STRIDE or halo % STRIDE:
        raise ValueError(f"band_rows and halo must be multiples of "
                         f"{STRIDE} (got {band_rows}, {halo})")
    if getattr(model, "local_upsample", True) is False:
        raise ValueError("fullconv banding requires the shift-invariant "
                         "decoder upsample: build the model with "
                         "local_upsample=True")
    if padded_shape is None:
        hp, wp = _round_up(h, STRIDE), _round_up(w, STRIDE)
    else:
        if padded_shape[0] < h or padded_shape[1] < w:
            raise ValueError(f"padded_shape {padded_shape} must cover "
                             f"({h}, {w})")
        # stride-round like the in-HBM runner does for its scene dims
        hp, wp = (_round_up(padded_shape[0], STRIDE),
                  _round_up(padded_shape[1], STRIDE))
    apply_fn = model.apply if hasattr(model, "apply") else model

    ctx_h = min(hp, band_rows + 2 * halo)
    n_uniform, tail = divmod(hp, band_rows) if ctx_h < hp else (0, 0)

    def make_kernel(rows):
        # one compiled forward per kept-rows count (uniform bands share
        # one; the tail band gets its own); the crop offset is a traced
        # scalar so edge-clamped windows reuse the same executable
        @jax.jit
        def kernel(variables, c1, c2, off):
            logits = apply_fn(variables, c1[None], c2[None], train=False)
            p = jax.nn.softmax(logits.astype(jnp.float32),
                               axis=-1)[0, ..., 1]
            return jax.lax.dynamic_slice(
                (p > 0.5).astype(jnp.uint8), (off, 0), (rows, wp))
        return kernel

    kernels: dict[int, object] = {}

    def host_ctx(scene, cs, rows_needed):
        # rows [cs, cs+rows_needed) of the stride-aligned edge-padded
        # scene, sliced straight off the host array (memmap-friendly:
        # touches only this window); rows >= h replicate the last row and
        # the W pad replicates the last column — identical to the in-HBM
        # path's jnp.pad(mode="edge")
        if cs + rows_needed <= h:
            band = np.asarray(scene[cs:cs + rows_needed])
        else:
            idx = np.minimum(np.arange(cs, cs + rows_needed), h - 1)
            band = np.asarray(scene[idx])
        if wp != w:
            band = np.pad(band, ((0, 0), (0, wp - w), (0, 0)), mode="edge")
        return jnp.asarray(band.astype(dtype))

    def run(variables, scene1, scene2, out=None):
        canvas = out if out is not None else np.empty((h, w), np.uint8)
        if canvas.shape[:2] != (h, w):
            raise ValueError(f"out must be (h, w)=({h}, {w}), got "
                             f"{canvas.shape}")

        if ctx_h == hp:  # whole scene fits one window
            c1 = host_ctx(scene1, 0, hp)
            c2 = host_ctx(scene2, 0, hp)
            kern = kernels.setdefault(hp, make_kernel(hp))
            canvas[:, :] = np.asarray(
                kern(variables, c1, c2, 0))[:h, :w]
            return canvas

        bands = [(i * band_rows, band_rows) for i in range(n_uniform)]
        if tail:
            bands.append((n_uniform * band_rows, tail))
        # bands entirely inside the virtual pad region produce no kept
        # rows — skip their forwards (the in-HBM runner on the padded
        # scene computes and crops them; equality is unaffected)
        bands = [(y0, rows) for (y0, rows) in bands if y0 < h]

        # host-side double buffering: slicing/casting a band's context
        # out of the host arrays is hundreds of MB of memcpy — prefetch
        # the next band's windows on a worker thread so it overlaps the
        # device running the current band (dispatch itself is async)
        from concurrent.futures import ThreadPoolExecutor

        def slice_ctx(y0):
            cs = int(np.clip(y0 - halo, 0, hp - ctx_h))
            return cs, host_ctx(scene1, cs, ctx_h), host_ctx(scene2, cs,
                                                             ctx_h)

        pending: deque = deque()

        def drain_one():
            y0, rows, dev = pending.popleft()
            m = np.asarray(dev)  # blocks until this band is done
            keep = min(rows, h - y0)
            canvas[y0:y0 + keep, :] = m[:keep, :w]

        with ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(slice_ctx, bands[0][0])
            for i, (y0, rows) in enumerate(bands):
                cs, c1, c2 = nxt.result()
                if i + 1 < len(bands):
                    nxt = pool.submit(slice_ctx, bands[i + 1][0])
                kern = kernels.get(rows)
                if kern is None:
                    kern = kernels[rows] = make_kernel(rows)
                pending.append((y0, rows,
                                kern(variables, c1, c2, y0 - cs)))
                if len(pending) > max_in_flight:
                    drain_one()
        while pending:
            drain_one()
        return canvas

    return run


def make_fullconv_scene_infer_multidate_streamed(
        model, scene_shape: tuple[int, int], num_dates: int,
        band_rows: int = 1024, halo: int = 128, dtype=jnp.bfloat16,
        max_in_flight: int = 2,
        padded_shape: tuple[int, int] | None = None):
    """Host-streamed multi-date seamless inference: the (T, H, W, C) date
    stack stays on the host (ndarray or ``np.memmap``); each
    halo-extended band of every date is sliced, uploaded, and run through
    the UNetLSTM / 3D U-Net fullconv path — the T-date analogue of
    :func:`make_fullconv_scene_infer_streamed`, with the same exactness
    guarantee (streamed == in-HBM == whole-scene forward) and the same
    ``padded_shape`` virtual-bucket semantics.

    Returns ``run(variables, scenes, out=None) -> (H, W) uint8``."""
    from collections import deque

    h, w = scene_shape
    if band_rows % STRIDE or halo % STRIDE:
        raise ValueError(f"band_rows and halo must be multiples of "
                         f"{STRIDE} (got {band_rows}, {halo})")
    if getattr(model, "local_upsample", True) is False:
        raise ValueError("fullconv banding requires the shift-invariant "
                         "decoder upsample: build the model with "
                         "local_upsample=True")
    if padded_shape is None:
        hp, wp = _round_up(h, STRIDE), _round_up(w, STRIDE)
    else:
        if padded_shape[0] < h or padded_shape[1] < w:
            raise ValueError(f"padded_shape {padded_shape} must cover "
                             f"({h}, {w})")
        # stride-round like the in-HBM runner does for its scene dims
        hp, wp = (_round_up(padded_shape[0], STRIDE),
                  _round_up(padded_shape[1], STRIDE))
    apply_fn = model.apply if hasattr(model, "apply") else model

    ctx_h = min(hp, band_rows + 2 * halo)
    n_uniform, tail = divmod(hp, band_rows) if ctx_h < hp else (0, 0)

    def make_kernel(rows):
        @jax.jit
        def kernel(variables, c, off):
            logits = apply_fn(variables, c[None], train=False)
            p = jax.nn.softmax(logits.astype(jnp.float32),
                               axis=-1)[0, ..., 1]
            return jax.lax.dynamic_slice(
                (p > 0.5).astype(jnp.uint8), (off, 0), (rows, wp))
        return kernel

    kernels: dict[int, object] = {}

    def host_ctx(scenes, cs, rows_needed):
        # (T, rows_needed, wp, C) window off the host stack, edge-padded
        # exactly like the in-HBM path's jnp.pad(mode="edge")
        if cs + rows_needed <= h:
            band = np.asarray(scenes[:, cs:cs + rows_needed])
        else:
            idx = np.minimum(np.arange(cs, cs + rows_needed), h - 1)
            band = np.asarray(scenes[:, idx])
        if wp != w:
            band = np.pad(band, ((0, 0), (0, 0), (0, wp - w), (0, 0)),
                          mode="edge")
        return jnp.asarray(band.astype(dtype))

    def run(variables, scenes, out=None):
        canvas = out if out is not None else np.empty((h, w), np.uint8)
        if canvas.shape[:2] != (h, w):
            raise ValueError(f"out must be (h, w)=({h}, {w}), got "
                             f"{canvas.shape}")
        if ctx_h == hp:
            c = host_ctx(scenes, 0, hp)
            kern = kernels.setdefault(hp, make_kernel(hp))
            canvas[:, :] = np.asarray(kern(variables, c, 0))[:h, :w]
            return canvas

        bands = [(i * band_rows, band_rows) for i in range(n_uniform)]
        if tail:
            bands.append((n_uniform * band_rows, tail))
        bands = [(y0, rows) for (y0, rows) in bands if y0 < h]

        # host-side double buffering (see the bidate streamed variant)
        from concurrent.futures import ThreadPoolExecutor

        def slice_ctx(y0):
            cs = int(np.clip(y0 - halo, 0, hp - ctx_h))
            return cs, host_ctx(scenes, cs, ctx_h)

        pending: deque = deque()

        def drain_one():
            y0, rows, dev = pending.popleft()
            m = np.asarray(dev)
            keep = min(rows, h - y0)
            canvas[y0:y0 + keep, :] = m[:keep, :w]

        with ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(slice_ctx, bands[0][0])
            for i, (y0, rows) in enumerate(bands):
                cs, c = nxt.result()
                if i + 1 < len(bands):
                    nxt = pool.submit(slice_ctx, bands[i + 1][0])
                kern = kernels.get(rows)
                if kern is None:
                    kern = kernels[rows] = make_kernel(rows)
                pending.append((y0, rows, kern(variables, c, y0 - cs)))
                if len(pending) > max_in_flight:
                    drain_one()
        while pending:
            drain_one()
        return canvas

    return run


def make_sharded_fullconv_infer(model, scene_shape: tuple[int, int], mesh,
                                band_rows: int = 1024, halo: int = 128,
                                dtype=jnp.bfloat16):
    """Multi-chip seamless scene inference: the scene H-sharded over
    ``mesh``'s ``data`` axis, fullconv banding run per device, halos
    exchanged over ICI.

    Each device owns ``h / n`` scene rows (so per-device memory scales as
    1/N, like :mod:`fabric_tpu.infer.sharded_scene`), but unlike the
    grid-tiled sharded mode the bands are NOT independent — every output
    row needs its receptive field of context, which at band boundaries
    lives on the neighboring device.  The halo moves over ICI: one
    ``lax.ppermute`` down and one up per date exchange ``2*halo`` edge
    rows with each neighbor (2x the interior need so the clamped uniform
    context windows of the EDGE devices — whose windows shift inward by up
    to ``2*halo``, exactly as the single-device banding clamps at the
    scene boundary — stay inside the received buffer; ppermute zero-fills
    the missing neighbor of the first/last device, and those rows are
    never selected).  Every kept row then sees byte-identical context to a
    whole-scene forward, so the sharded result is EXACTLY the
    single-device fullconv mask (tests/test_fullconv.py pins sharded ==
    whole-scene on an 8-device CPU mesh).

    Requirements: ``h % n == 0``, the per-device band ``h/n`` a multiple
    of the U-Net stride (16) and >= ``2*halo``; the serving bucket policy
    guarantees this (ScenePredictor aligns buckets to ``n * 256``).  On a
    1-device mesh this delegates to :func:`make_fullconv_scene_infer`
    (no exchange needed).  ``run(variables, s1, s2)`` accepts scenes
    placed with :func:`fabric_tpu.infer.sharded_scene.put_scene_sharded`
    (band-streamed from host memmaps) or any (H, W, C) arrays.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    h, w = scene_shape
    n = mesh.shape["data"]
    if n == 1:
        inner = make_fullconv_scene_infer(model, scene_shape,
                                          band_rows=band_rows, halo=halo,
                                          dtype=dtype)
        return lambda variables, s1, s2: inner(variables, s1, s2)
    if band_rows % STRIDE or halo % STRIDE:
        raise ValueError(f"band_rows and halo must be multiples of "
                         f"{STRIDE} (got {band_rows}, {halo})")
    if getattr(model, "local_upsample", True) is False:
        raise ValueError("fullconv banding requires the shift-invariant "
                         "decoder upsample: build the model with "
                         "local_upsample=True")
    if h % n:
        raise ValueError(f"H={h} must divide over the {n}-device data "
                         "axis; pad the scene (ScenePredictor buckets do)")
    big = h // n  # this device's scene rows
    if big % STRIDE:
        raise ValueError(f"per-device band H/n={big} must be a multiple "
                         f"of {STRIDE}")
    if big < 2 * halo:
        raise ValueError(f"per-device band H/n={big} must be >= 2*halo="
                         f"{2 * halo} (edge devices' clamped context "
                         "windows reach that deep into the neighbor)")
    wp = _round_up(w, STRIDE)
    br = min(band_rows, big)
    n_sub, tail = divmod(big, br)
    apply_fn = model.apply if hasattr(model, "apply") else model

    def band_fn(variables, s1, s2):
        # s1, s2: (big, w, c) — this device's H-band of the scene
        i = jax.lax.axis_index("data")

        def extend(s):
            s = jnp.pad(s.astype(dtype), ((0, 0), (0, wp - w), (0, 0)),
                        mode="edge")
            above = jax.lax.ppermute(  # my bottom rows -> next device
                s[-2 * halo:], "data", [(d, d + 1) for d in range(n - 1)])
            below = jax.lax.ppermute(  # my top rows -> previous device
                s[:2 * halo], "data", [(d, d - 1) for d in range(1, n)])
            # rows [i*big - 2*halo, (i+1)*big + 2*halo) of the scene
            # (zero-filled outside [0, h); never selected there)
            return jnp.concatenate([above, s, below], axis=0)

        e1, e2 = extend(s1), extend(s2)

        def prob_map(c1, c2):
            logits = apply_fn(variables, c1[None], c2[None], train=False)
            return jax.nn.softmax(logits.astype(jnp.float32),
                                  axis=-1)[0, ..., 1]

        def sub(canvas, r0, rows):
            ctx_h = rows + 2 * halo
            y0 = i * big + r0                       # global first kept row
            cs = jnp.clip(y0 - halo, 0, h - ctx_h)  # global context start
            lcs = cs - (i * big - 2 * halo)         # -> local buffer offset
            c1 = jax.lax.dynamic_slice(e1, (lcs, 0, 0),
                                       (ctx_h, wp, e1.shape[-1]))
            c2 = jax.lax.dynamic_slice(e2, (lcs, 0, 0),
                                       (ctx_h, wp, e2.shape[-1]))
            p = prob_map(c1, c2)
            band_mask = jax.lax.dynamic_slice(
                (p > 0.5).astype(jnp.uint8), (y0 - cs, 0), (rows, wp))
            return jax.lax.dynamic_update_slice(canvas, band_mask, (r0, 0))

        # the fresh canvas is replicated-TYPED under shard_map's
        # varying-axes tracking, but the loop body writes device-varying
        # rows — the fori_loop carry types must agree up front
        canvas = jnp.zeros((big, wp), jnp.uint8)
        if hasattr(jax.lax, "pcast"):
            canvas = jax.lax.pcast(canvas, ("data",), to="varying")
        else:  # older jax
            canvas = jax.lax.pvary(canvas, ("data",))
        canvas = jax.lax.fori_loop(
            0, n_sub, lambda j, c: sub(c, j * br, br), canvas)
        if tail:
            canvas = sub(canvas, n_sub * br, tail)
        return canvas[:, :w]

    sharded = shard_map(
        band_fn, mesh=mesh,
        in_specs=(P(), P("data", None, None), P("data", None, None)),
        out_specs=P("data", None))

    @jax.jit
    def run(variables, scene1, scene2):
        spec = NamedSharding(mesh, P("data", None, None))
        scene1 = jax.lax.with_sharding_constraint(scene1, spec)
        scene2 = jax.lax.with_sharding_constraint(scene2, spec)
        return sharded(variables, scene1, scene2)

    return run


def make_fullconv_scene_infer_multidate(model, scene_shape: tuple[int, int],
                                        num_dates: int,
                                        band_rows: int = 1024,
                                        halo: int = 128,
                                        dtype=jnp.bfloat16):
    """Build a jitted ``run(variables, scenes) -> (H, W) uint8`` seamless
    scene-mask function for the multi-date variants — ``scenes`` is a
    (T, H, W, C) date stack, served through UNetLSTM or UNet3D.

    Both variants are translation invariant at 16-px-aligned crops once
    built with ``local_upsample=True``: their temporal machinery — the
    ConvLSTM's 3x3 SAME gates (unet_lstm.py), the 3D SAME convs and the
    pointwise temporal max/mean collapse (unet3d.py) — is spatially
    shift-invariant, and the spatial stack is the same SAME-conv /
    aligned-pool / local-upsample pyramid as the bi-date net, so the
    banded result exactly equals a whole-scene forward
    (tests/test_fullconv.py pins this per variant)."""
    h, w = scene_shape
    if band_rows % STRIDE or halo % STRIDE:
        raise ValueError(f"band_rows and halo must be multiples of "
                         f"{STRIDE} (got {band_rows}, {halo})")
    if getattr(model, "local_upsample", True) is False:
        raise ValueError("fullconv banding requires the shift-invariant "
                         "decoder upsample: build the model with "
                         "local_upsample=True")
    hp, wp = _round_up(h, STRIDE), _round_up(w, STRIDE)
    apply_fn = model.apply if hasattr(model, "apply") else model

    def prob_map(variables, stack):
        logits = apply_fn(variables, stack[None], train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[0, ..., 1]

    ctx_h = min(hp, band_rows + 2 * halo)
    n_uniform, tail = divmod(hp, band_rows) if ctx_h < hp else (0, 0)

    @jax.jit
    def run(variables, scenes):
        s = jnp.pad(scenes.astype(dtype),
                    ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="edge")
        if ctx_h == hp:
            mask = (prob_map(variables, s) > 0.5).astype(jnp.uint8)
            return mask[:h, :w]

        def band(canvas, y0, rows):
            cs = jnp.clip(y0 - halo, 0, hp - ctx_h)
            c = jax.lax.dynamic_slice(
                s, (0, cs, 0, 0), (num_dates, ctx_h, wp, s.shape[-1]))
            p = prob_map(variables, c)
            band_mask = jax.lax.dynamic_slice(
                (p > 0.5).astype(jnp.uint8), (y0 - cs, 0), (rows, wp))
            return jax.lax.dynamic_update_slice(canvas, band_mask, (y0, 0))

        canvas = jnp.zeros((hp, wp), jnp.uint8)
        canvas = jax.lax.fori_loop(
            0, n_uniform,
            lambda i, c: band(c, i * band_rows, band_rows), canvas)
        if tail:
            canvas = band(canvas, n_uniform * band_rows, tail)
        return canvas[:h, :w]

    return run
