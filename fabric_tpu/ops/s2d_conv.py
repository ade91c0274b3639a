"""Space-to-depth lane packing for 3x3 stride-1 SAME convolutions.

The BiDateNet forward spends its MFU slack in the Cout=64 full-resolution
layers (inc/up4/up3 — BASELINE.md stage ablation): a 64-channel conv fills
only half the MXU's 128 lanes and XLA runs it at 38-45 TFLOP/s standalone.
Every other counter-move measured on the chip lost (hand Pallas kernels
~2x slower, feature_group packing −58% — see ops/pallas_double_conv.py and
tools/ablate_train.py).  This one WINS: a 3x3 stride-1 conv on
(N, H, W, C) is *exactly* a 2x2 VALID conv on the 1-px-shifted
space-to-depth(2) tensor (N, H/2+1, W/2+1, 4C) — 4x the channels fill the
lanes, at the cost of structural-zero kernel taps (16/9 = 1.78x the MACs)
plus the layout shuffles.  Measured on the v5e at batch 128 / 96² / bf16:
direct 5.47 ms vs s2d 3.85 ms per conv — **1.42x faster despite 1.78x the
math** (`tools/ablate_train.py --microbench space_to_depth`).

Derivation of the packed kernel.  Write the direct conv as
``y[2p+di] = sum_u w[u] * x[2p+di+u-1]`` (one axis shown; u in 0..2 is the
kernel tap).  The *shifted* s2d input tensor holds
``xs[q, phase a] = x[2q+a-1]`` (the 1-px shift makes SAME zero-padding
land in the pad blocks).  Matching rows, tap (u, a) of output sub-pixel di
lives in kernel cell ``a2 = (di+u-1-a+1)//2 in {0,1}`` — i.e. a 2x2 VALID
block conv with packed kernel ``W2[a2,b2,(a,b,ci),(di,dj,co)] =
w[2*a2+a-1-di, 2*b2+b-1-dj, ci, co]`` (taps outside [-1,1] are the
structural zeros).  Chaining two convs (a DoubleConv) needs one phase
``reshift`` between them instead of a d2s+s2d round trip: the first conv's
output is the *unshifted* s2d of y (``z[q, a] = y[2q+a]``), and
``xs[q, a] = y[2q+a-1] = z[q+a-1 th block, phase 1-a]`` — four block
slices of the zero-padded z, re-interleaved (exactly SAME-padding
semantics for the second conv).

Results match the direct conv to bf16 rounding (max |delta| = 2^-9
measured; fp32 ~1e-7).  The transform targets the cuDNN algorithm choice
the reference gets for free on GPU
(/root/reference/models/unet_parts.py:8-23 double_conv) with an algebraic
re-tiling XLA cannot find itself.

**Measured verdict (r3): OFF in production.**  The isolated-conv win does
not survive the full graph: with auto-grads the train step measured
97.5 ms vs 54.7 direct; with hand-written direct-form grads
(``conv3x3_lane_packed``) still 85.3 ms; attribution shows the train-mode
forward ALONE goes 19.9 -> 42.6 ms in context — the s2d/d2s layout
shuffles break XLA's conv+BN(+ReLU) fusion clusters and force fp32
materialization of full-res tensors, exactly the composition effect that
killed the hand-written Pallas kernels (ops/pallas_double_conv.py).  At
the serving tile (64², batch 256) even the isolated conv loses (3.84 vs
2.95 ms), so no inference mode wants it either.  The module stays as the
reproducible record of the experiment (`tools/ablate_train.py
--microbench space_to_depth`, `--variant full_lane_pack[_bwd]`,
`--variant fwd_lane_pack`).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def _selection() -> np.ndarray:
    """S[a2,b2,a,b,di,dj,u,v] = 1 where packed-kernel cell (a2,b2), input
    phase (a,b), output sub-pixel (di,dj) reads direct-kernel tap (u,v)."""
    s = np.zeros((2, 2, 2, 2, 2, 2, 3, 3), np.float32)
    for a2 in range(2):
        for b2 in range(2):
            for a in range(2):
                for b in range(2):
                    for di in range(2):
                        for dj in range(2):
                            u = 2 * a2 + a - 1 - di
                            v = 2 * b2 + b - 1 - dj
                            if -1 <= u <= 1 and -1 <= v <= 1:
                                s[a2, b2, a, b, di, dj, u + 1, v + 1] = 1
    return s


_S = _selection()


def pack_kernel(kernel: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) direct kernel -> (2, 2, 4*Ci, 4*Co) s2d kernel.

    Channel layout: input block (a*2+b)*Ci + ci (input phase-major),
    output block (di*2+dj)*Co + co (output sub-pixel-major) — matching
    ``s2d``/``d2s`` below.  A tiny einsum against a constant 0/1 selection
    tensor; XLA schedules it once per forward (negligible next to the
    convs it feeds).
    """
    ci, co = kernel.shape[2], kernel.shape[3]
    w2 = jnp.einsum("ABabdeuv,uvic->ABabidec",
                    jnp.asarray(_S, kernel.dtype), kernel)
    return w2.reshape(2, 2, 4 * ci, 4 * co)


def s2d(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> shifted space-to-depth (N, H/2+1, W/2+1, 4C).

    Pads 1 px on every side (the top/left pad realizes the phase shift,
    the bottom/right pad completes the last block) then re-tiles 2x2
    pixel blocks into channels.  H and W must be even.
    """
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xr = xp.reshape(n, h // 2 + 1, 2, w // 2 + 1, 2, c)
    return xr.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h // 2 + 1, w // 2 + 1, 4 * c)


def d2s(y: jax.Array, cout: int) -> jax.Array:
    """(N, H/2, W/2, 4*Co) unshifted s2d -> (N, H, W, Co)."""
    n, h2, w2, _ = y.shape
    yr = y.reshape(n, h2, w2, 2, 2, cout)
    return yr.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h2, 2 * w2, cout)


def reshift(z: jax.Array, cout: int) -> jax.Array:
    """Unshifted s2d output (N, h2, w2, 4C) -> shifted s2d input
    (N, h2+1, w2+1, 4C) for a chained second conv (SAME zero-pad
    semantics land in the pad blocks).  xs[q, r, (a, b)] =
    zp[q+a, r+b, (1-a, 1-b)] with zp zero-padded one block on each side.
    """
    n, h2, w2, _ = z.shape
    zb = z.reshape(n, h2, w2, 2, 2, cout)
    zp = jnp.pad(zb, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    rows = []
    for a in range(2):
        cols = []
        for b in range(2):
            cols.append(zp[:, a:a + h2 + 1, b:b + w2 + 1, 1 - a, 1 - b, :])
        rows.append(jnp.stack(cols, axis=-2))
    xs = jnp.stack(rows, axis=-3)
    return xs.reshape(n, h2 + 1, w2 + 1, 4 * cout)


def conv2x2(xs: jax.Array, w2: jax.Array,
            bias: jax.Array | None = None) -> jax.Array:
    """The packed conv: 2x2 VALID at 4*Ci -> 4*Co channels, bias tiled
    over the four output sub-pixels so XLA fuses it into the conv
    epilogue."""
    y = jax.lax.conv_general_dilated(xs, w2, (1, 1), "VALID",
                                     dimension_numbers=_DN)
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y


def s2d_conv3x3(x: jax.Array, kernel: jax.Array,
                bias: jax.Array | None = None, *,
                relu: bool = False) -> jax.Array:
    """Single 3x3 SAME stride-1 conv via lane packing (round trip)."""
    co = kernel.shape[-1]
    y = conv2x2(s2d(x), pack_kernel(kernel.astype(x.dtype)),
                None if bias is None else bias)
    if relu:
        y = jax.nn.relu(y)
    return d2s(y, co)


def s2d_double_conv(x: jax.Array,
                    k1, b1, k2, b2, *,
                    extra: jax.Array | None = None,
                    k1_extra=None) -> jax.Array:
    """(conv3x3 -> bias -> ReLU) x 2 entirely in s2d space: one s2d, one
    reshift, one d2s for the pair (vs two round trips).

    ``extra``/``k1_extra``: optional second input summed into the first
    conv (the split-concat decoder form: conv(skip, Ka) + conv(up, Kb)
    — see models/blocks._SplitDoubleConv); summation happens in s2d
    space so the pair still pays a single d2s.
    """
    co1, co2 = k1.shape[-1], k2.shape[-1]
    y = conv2x2(s2d(x), pack_kernel(k1.astype(x.dtype)), b1)
    if extra is not None:
        y = y + conv2x2(s2d(extra),
                        pack_kernel(k1_extra.astype(extra.dtype)))
    y = jax.nn.relu(y)
    y = conv2x2(reshift(y, co1), pack_kernel(k2.astype(x.dtype)), b2)
    return d2s(jax.nn.relu(y), co2)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_lane_packed(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                        pack_bwd: bool = False) -> jax.Array:
    """``s2d_conv3x3`` with hand-written gradients.

    Measured necessity (BASELINE.md, r3): letting XLA differentiate the
    packed form made the full train step 1.78x SLOWER (97.5 ms vs 54.7 —
    the auto-derived grads of the 2x2 conv + layout shuffles tile
    terribly), even though the packed forward alone is 1.42x faster.
    Since the packed forward IS a 3x3 SAME conv, its exact gradients are
    the standard ones:

      dx = conv3x3(g, rot180(K) with in/out swapped)   [dgrad]
      dK = direct-conv wgrad (via jax.vjp of the direct form)
      db = sum(g) over N, H, W

    ``pack_bwd``: compute the dgrad conv itself in packed form too — it
    is another Cout<128 full-res 3x3 conv with the same lane deficiency.
    """
    return s2d_conv3x3(x, kernel, bias)


def _cv_fwd(x, kernel, bias, pack_bwd):
    return s2d_conv3x3(x, kernel, bias), (x, kernel, bias)


def _cv_bwd(pack_bwd, res, g):
    x, kernel, bias = res
    kt = kernel[::-1, ::-1].swapaxes(2, 3)
    if pack_bwd and supports(g.shape[1], g.shape[2],
                             kt.shape[2], kt.shape[3]):
        dx = s2d_conv3x3(g, kt)
    else:
        dx = jax.lax.conv_general_dilated(g, kt, (1, 1), "SAME",
                                          dimension_numbers=_DN)

    def direct_k(k):
        return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                            dimension_numbers=_DN)

    dk = jax.vjp(direct_k, kernel)[1](g)[0]
    db = g.sum((0, 1, 2)).astype(bias.dtype)
    return dx, dk, db


conv3x3_lane_packed.defvjp(_cv_fwd, _cv_bwd)


def supports(h: int, w: int, cin: int, cout: int) -> bool:
    """Gate to the shapes where packing measured a WIN on the v5e
    (BASELINE.md microbench table): lane-deficient outputs (Cout < 128),
    even spatial dims, and patch >= 96.  The shape boundary is measured,
    not theoretical — at 96²/batch 128 the packed conv runs 1.42x faster,
    but at 64²/batch 256 the direct conv is already 2x better-tiled per
    pixel and packing LOSES 1.3x, so the serving tile size stays on the
    direct path and the train patch size (96) takes the packed one."""
    return (h % 2 == 0 and w % 2 == 0 and cout < 128
            and min(h, w) >= 96)
