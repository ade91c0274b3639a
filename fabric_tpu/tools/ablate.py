"""Per-stage ablation timing of the folded eval forward.

This is the measurement tool behind BASELINE.md's "where the bf16 time
goes" table: it times jitted PREFIXES of the BiDateNet eval forward
(stage 0 = input only, 1 = +inc, 2-5 = +down1..4, 6 = +fusion,
7-10 = +up1..4, 11 = +head/argmax) so consecutive deltas give per-stage
cost under real XLA fusion.  Every intermediate in the prefix is summed
into the output to defeat dead-code elimination (those sum passes add
~0.1-0.7 ms each — subtract a bandwidth estimate when interpreting).

Usage (one stage per process on the real TPU — remote-compile latency and
the shared chip make multi-config processes unreliable, see CLAUDE.md):

  for s in $(seq 0 11); do
    python -m fabric_tpu.tools.ablate --stage $s --batch 128 --patch 128
  done

``--verify`` checks the functional forward against model.apply on CPU.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_functional(params, dtype=None, pool_impl: str = "reduce_window"):
    """Functional folded eval forward mirroring BiDateNet's graph, cut
    into stages.  ``params`` is a fold_batchnorm() tree.

    ``pool_impl='reshape'`` swaps max-pool for the bit-equivalent
    reshape-max (even dims only) — the generic reduce_window primitive
    has no transpose rule, so grad-mode callers (tools/ablate_train.py)
    need this; forward timing keeps reduce_window (the production op)."""
    import jax
    import jax.numpy as jnp
    from fabric_tpu.ops.resize import upsample2x_align_corners

    dtype = dtype or jnp.bfloat16

    def conv(x, p):
        y = jax.lax.conv_general_dilated(
            x, p["kernel"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + p["bias"].astype(dtype)

    def dc(x, p):
        x = jnp.maximum(conv(x, p["conv1"]), 0)
        return jnp.maximum(conv(x, p["conv2"]), 0)

    def pool(x):
        if pool_impl == "reshape":
            n, h, w, c = x.shape
            return x.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))
        return jax.lax.reduce_window(
            x, jnp.asarray(-jnp.inf, x.dtype), jax.lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def stages(x_d1, x_d2, upto, return_last=False):
        n = x_d1.shape[0]
        x = jnp.concatenate([x_d1, x_d2], 0).astype(dtype)
        acts = [x]
        if upto >= 1:
            acts.append(dc(acts[-1], params["inc"]))
        for i, name in enumerate(("down1", "down2", "down3", "down4")):
            if upto >= 2 + i:
                acts.append(dc(pool(acts[-1]), params[name]["conv"]))
        if upto >= 6:
            fs = [jnp.maximum(a[n:] * a[:n], 0) for a in acts[1:]]
            acts = acts[:1] + fs
        if upto >= 7:
            y = acts[-1]
            skips = acts[1:-1][::-1]  # f4, f3, f2, f1
            for i, name in enumerate(("up1", "up2", "up3", "up4")):
                if upto >= 7 + i:
                    y = upsample2x_align_corners(y)
                    y = jnp.concatenate([skips[i], y], axis=-1)
                    y = dc(y, params[name]["conv"])
                    acts.append(y)
        if upto >= 11:
            p = params["outc"]["conv"]
            lg = jax.lax.conv_general_dilated(
                acts[-1], p["kernel"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            lg = lg + p["bias"].astype(dtype)
            acts.append(jnp.argmax(lg, -1).astype(jnp.uint8))
        if return_last:
            return acts[-1]
        return sum(jnp.sum(a.astype(jnp.float32)) for a in acts)

    return stages


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--stage", type=int, default=11)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from fabric_tpu.config import Config
    from fabric_tpu.models import BiDateNet, build_model
    from fabric_tpu.ops.fold_bn import fold_batchnorm
    from fabric_tpu.train.state import create_state

    cfg = Config(dtype="bfloat16", patch_size=args.patch)
    state = create_state(cfg, build_model(cfg),
                         sample_shape=(args.patch, args.patch))
    folded = fold_batchnorm(state.params, state.batch_stats)
    fwd = build_functional(folded)

    if args.verify:
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.randn(2, 32, 32, 13), jnp.bfloat16)
        b = jnp.asarray(rng.randn(2, 32, 32, 13), jnp.bfloat16)
        ref = BiDateNet(dtype=jnp.bfloat16, fold_bn=True).apply(
            {"params": folded, "batch_stats": {}}, a, b, train=False)
        got = fwd(a, b, 11, return_last=True)
        agree = float((np.asarray(jnp.argmax(ref, -1))
                       == np.asarray(got)).mean())
        print(json.dumps({"verify_mask_agreement": agree}))
        return 0 if agree == 1.0 else 1

    rng = np.random.RandomState(0)
    d1 = jnp.asarray(rng.randn(args.batch, args.patch, args.patch, 13),
                     jnp.bfloat16)
    d2 = jnp.asarray(rng.randn(args.batch, args.patch, args.patch, 13),
                     jnp.bfloat16)
    f = jax.jit(lambda a, b: fwd(a, b, args.stage))
    t0 = time.time()
    np.asarray(f(d1, d2))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(args.iters):
        r = f(d1, d2)
    np.asarray(r)
    dt = (time.time() - t0) / args.iters
    print(json.dumps({"stage": args.stage, "ms": round(dt * 1e3, 3),
                      "compile_s": round(compile_s, 1),
                      "batch": args.batch, "patch": args.patch,
                      "backend": jax.default_backend()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
