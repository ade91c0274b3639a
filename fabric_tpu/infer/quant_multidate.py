"""Int8 post-training-quantized forwards for the multi-date variants.

Extends :mod:`fabric_tpu.infer.quant` (see its docstring for the
roofline rationale — the win is halved HBM bytes, not MXU rate) to the
UNetLSTM and 3D U-Net families (r3 VERDICT #1).  Everything quantizes by
the same rules, built from the shared :func:`quant.make_helpers` blocks:

- The shared encoder is int8-resident exactly like the bi-date path
  (max-pool — spatial-only for NDHWC — commutes with symmetric
  quantization), run at batch N*T.
- **UNetLSTM**: the ConvLSTM gate conv splits at its [bottleneck x |
  hidden h] concat boundary (conv is linear in input channels), each
  operand int8 at its own static scale — x at the encoder's calibrated
  ``enc.x5`` scale (it IS the encoder output), h at a calibrated
  ``lstm.h`` scale (h = o*tanh(c) is bounded in (-1, 1), so the scale is
  a guaranteed cover).  Gate nonlinearities and the cell state stay in
  bf16 — O(HW·8b) per step, negligible traffic next to the convs.  The
  T-date multiplicative skip fusion relu(prod_t x_t) runs on the int8
  values dequantized in fp32 (int32 would overflow at T>=5: 127^5 > 2^31)
  and requantizes straight to the skip's calibrated ``fK`` scale.
- **UNet3D**: (3,3,3) convs quantize identically through the 3-D
  dimension numbers; the temporal skip collapse max_t commutes with
  symmetric quantization EXACTLY (monotone, shared per-tensor scale), so
  the collapsed skip reuses its level's encoder scale with zero extra
  rounding; the bottleneck mean_t dequantizes exactly as an int32 sum
  scaled by s/T.
- Decoders are the same 2-D split-conv Up stack as the bi-date path.

Stats mode (qweights None) replicates the BN-folded model.apply math
op-for-op — tests/test_quant_multidate.py pins stats-forward logits ==
model.apply logits per family — while tapping each conv input's absmax
for calibration.

Reference parity note: the reference has no multi-date implementation at
all (its UNetLSTM/ dir is empty, README.md:7) and no quantized serving
for any model; this file exists to keep the framework's own headline
serving win available across its whole model matrix.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fabric_tpu.infer.quant import _DN3, _encoder, make_helpers


def _upsample_fn(local_upsample: bool):
    from fabric_tpu.ops.resize import (upsample2x_align_corners,
                                       upsample2x_local)
    return upsample2x_local if local_upsample else upsample2x_align_corners


def _make_forward_lstm(folded_params, qweights: Optional[dict],
                       act_scales: Optional[dict], dtype=jnp.bfloat16,
                       local_upsample: bool = True):
    """UNetLSTM forward: (N, T, H, W, C) -> (N, H, W, classes) logits.

    Stats mode additionally returns {site: absmax} (models/unet_lstm.py
    is the exact math being mirrored)."""
    H = make_helpers(folded_params, qweights, act_scales, dtype,
                     upsample2x=_upsample_fn(local_upsample))
    quant = H.quant
    gp = folded_params["bottleneck_lstm"]["gates"]

    def cell_step(z, c):
        """Gate math of models/unet_lstm.ConvLSTMCell from the gate
        pre-activations ``z``; returns (h, c)."""
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f + 1.0)  # forget-gate bias init trick
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c.astype(f.dtype) + i * g
        return o * jnp.tanh(c), c

    def forward(seq, train=False):  # noqa: ARG001
        del train
        stats: dict = {}
        n, t = seq.shape[0], seq.shape[1]
        x = seq.reshape((n * t,) + seq.shape[2:]).astype(dtype)
        x1, x2, x3, x4, x5 = _encoder(H, x, act_scales, stats)

        def unfold(v):
            return v.reshape((n, t) + v.shape[1:])

        s1, s2, s3, s4, bott = (unfold(v) for v in (x1, x2, x3, x4, x5))

        # --- ConvLSTM over the temporal axis at the bottleneck ---------
        feats = gp["kernel"].shape[-1] // 4
        h = jnp.zeros(bott.shape[:1] + bott.shape[2:-1] + (feats,), dtype)
        c = jnp.zeros_like(h)
        if quant:
            s5 = act_scales["enc.x5"]
            sh = act_scales["lstm.h"]
            qx = qweights["bottleneck_lstm.gates.x"]
            qh = qweights["bottleneck_lstm.gates.h"]
            bias = qweights["bottleneck_lstm.gates"]["bias"]
        hmax = jnp.zeros((), jnp.float32)
        for step in range(t):  # T is small and static; unrolled scan
            if quant:
                # split gate conv: x side int8 at the encoder scale, h
                # side int8 at the calibrated hidden scale
                za = H.conv_raw(bott[:, step],
                                "bottleneck_lstm.gates.x").astype(
                    jnp.float32) * (qx["sw"] * s5)
                zb = H.conv_raw(H.q(h, sh),
                                "bottleneck_lstm.gates.h").astype(
                    jnp.float32) * (qh["sw"] * sh)
                z = (za + zb + bias).astype(dtype)
            else:
                zin = jnp.concatenate([bott[:, step], h], axis=-1)
                z = jax.lax.conv_general_dilated(
                    zin, gp["kernel"].astype(dtype), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")
                ) + gp["bias"].astype(dtype)
            h, c = cell_step(z, c)
            if not quant:
                hmax = jnp.maximum(
                    hmax, jnp.max(jnp.abs(h.astype(jnp.float32))))
        if not quant:
            stats["lstm.h"] = hmax

        # --- T-date multiplicative skip fusion --------------------------
        if quant:
            s = [act_scales[k] for k in
                 ("down1.conv1", "down2.conv1", "down3.conv1",
                  "down4.conv1")]

            def fuse_q(aq, sk, sfk):
                # prod in fp32: int32 overflows at T>=5 (127^5 > 2^31);
                # the f32 mantissa slack is ~2^-24 relative, below the
                # int8 quantum we round to next
                pf = jnp.maximum(
                    jnp.prod(aq.astype(jnp.float32), axis=1), 0.0
                ) * (sk ** t)
                return jnp.clip(jnp.round(pf / sfk), 0, 127).astype(
                    jnp.int8)

            f = [fuse_q(a, sk, act_scales[f"f{k}"]) for k, (a, sk) in
                 enumerate(zip((s1, s2, s3, s4), s), start=1)]
            y = H.up_q(h, f[3], act_scales["f4"], "up1")
            y = H.up_q(y, f[2], act_scales["f3"], "up2")
            y = H.up_q(y, f[1], act_scales["f2"], "up3")
            y = H.up_q(y, f[0], act_scales["f1"], "up4")
        else:
            f = [jnp.maximum(jnp.prod(a, axis=1), 0)
                 for a in (s1, s2, s3, s4)]
            for k in range(1, 5):
                stats[f"f{k}"] = jnp.max(jnp.abs(
                    f[k - 1].astype(jnp.float32)))
            y = H.up_stats(h, f[3], "up1", stats)
            y = H.up_stats(y, f[2], "up2", stats)
            y = H.up_stats(y, f[1], "up3", stats)
            y = H.up_stats(y, f[0], "up4", stats)
        logits = H.outc(y)
        return logits if quant else (logits, stats)

    return forward


def _make_forward_3d(folded_params, qweights: Optional[dict],
                     act_scales: Optional[dict], dtype=jnp.bfloat16,
                     local_upsample: bool = True):
    """UNet3D forward: (N, T, H, W, C) NDHWC -> (N, H, W, classes)
    logits; stats mode additionally returns {site: absmax}
    (models/unet3d.py is the exact math being mirrored)."""
    up2x = _upsample_fn(local_upsample)
    # one helper set runs the 3-D encoder, one the 2-D decoder; they
    # share the same site names/scales/quantized weights
    H3 = make_helpers(folded_params, qweights, act_scales, dtype, dn=_DN3)
    H2 = make_helpers(folded_params, qweights, act_scales, dtype,
                      upsample2x=up2x)

    def forward(seq, train=False):  # noqa: ARG001
        del train
        stats: dict = {}
        t = seq.shape[1]
        x = seq.astype(dtype)  # NDHWC with D = T
        x1, x2, x3, x4, x5 = _encoder(H3, x, act_scales, stats)

        if H3.quant:
            s = [act_scales[k] for k in
                 ("down1.conv1", "down2.conv1", "down3.conv1",
                  "down4.conv1", "enc.x5")]
            # skip collapse max_t: EXACT on the int8 values (monotone,
            # one shared per-tensor scale) — the skips reach the decoder
            # int8-resident at their encoder scales, no extra rounding
            k1, k2, k3, k4 = (jnp.max(v, axis=1) for v in (x1, x2, x3, x4))
            # bottleneck mean_t: exact int32 sum dequantized by s/T
            bott = (jnp.sum(x5.astype(jnp.int32), axis=1)
                    .astype(jnp.float32) * (s[4] / t)).astype(dtype)
            y = H2.up_q(bott, k4, s[3], "up1")
            y = H2.up_q(y, k3, s[2], "up2")
            y = H2.up_q(y, k2, s[1], "up3")
            y = H2.up_q(y, k1, s[0], "up4")
        else:
            k1, k2, k3, k4 = (jnp.max(v, axis=1) for v in (x1, x2, x3, x4))
            bott = jnp.mean(x5, axis=1)
            y = H2.up_stats(bott, k4, "up1", stats)
            y = H2.up_stats(y, k3, "up2", stats)
            y = H2.up_stats(y, k2, "up3", stats)
            y = H2.up_stats(y, k1, "up4", stats)
        logits = H2.outc(y)
        return logits if H3.quant else (logits, stats)

    return forward
