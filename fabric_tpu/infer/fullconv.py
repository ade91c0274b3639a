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
                              dtype=jnp.bfloat16):
    """Build a jitted ``run(variables, scene1, scene2) -> (H, W) uint8``
    seamless whole-scene change-mask function.

    ``model`` must use the shift-invariant decoder upsample
    (``BiDateNet(local_upsample=True)``) — with the align-corners grid the
    banded result would not be crop-consistent.  ``band_rows`` and
    ``halo`` must be multiples of the U-Net stride (16).  The scene is
    edge-padded up to stride alignment and the mask cropped back.
    """
    h, w = scene_shape
    if band_rows % STRIDE or halo % STRIDE:
        raise ValueError(f"band_rows and halo must be multiples of "
                         f"{STRIDE} (got {band_rows}, {halo})")
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
            c1 = jax.lax.dynamic_slice(s1, (cs, 0, 0), (ctx_h, wp, 13))
            c2 = jax.lax.dynamic_slice(s2, (cs, 0, 0), (ctx_h, wp, 13))
            p = prob_map(variables, c1, c2)
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
