"""Train-step attribution on the real chip (r2 VERDICT #3).

The eval forward has a per-stage breakdown (tools/ablate.py →
BASELINE.md); this is the train-side counterpart.  Two modes:

**Variant timing** (``--variant``): time one train-step variant per
process, so deltas between processes attribute the step:

  full       the production train step (fwd + bwd + SGD + metrics)
  grad       value_and_grad only, no optimizer apply / no metrics
  fwd        the train-mode forward + loss only (BN batch stats updated)
  eval_fwd   the eval-mode forward + loss (running-stat BN, no mutation)
  full_remat full with cfg.remat=True (nn.remat on every U-Net block)
  no_donate  full without buffer donation

  full-grad      = optimizer + metrics cost
  grad-fwd       = backward cost
  fwd-eval_fwd   = train-mode BN overhead (fp32 stat reductions)

**Per-stage grad timing** (``--stage K --grad``): like tools/ablate.py's
prefix timing but of ``jax.value_and_grad`` of the folded functional
forward prefix — consecutive deltas give per-stage fwd+bwd cost.  (Folded
proxy: no BN-stat update in the backward, so stage deltas attribute the
conv/resize work, which is where the FLOPs are.)

Usage (ONE config per process on the TPU, CLAUDE.md discipline):
  python -m fabric_tpu.tools.ablate_train --variant full
  python -m fabric_tpu.tools.ablate_train --stage 11 --grad

Reference workload being attributed: /root/reference/train.py:76-118
(batch of patches -> forward -> tversky -> SGD).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def _data(batch: int, patch: int):
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    return {
        "img1": jnp.asarray(rng.randn(batch, patch, patch, 13), jnp.float32),
        "img2": jnp.asarray(rng.randn(batch, patch, patch, 13), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 2, (batch, patch, patch)),
                             jnp.int32),
        "weight": jnp.ones(batch, jnp.float32),
    }


def _sync(tree):
    import jax
    import jax.numpy as jnp
    return np.asarray(jnp.sum(
        jax.tree_util.tree_leaves(tree)[0].astype(jnp.float32)))


def build_variant(variant: str, cfg, compiler_options=None):
    """-> (carry, fn) with ``(carry, sync_leaf) = fn(carry, batch)``;
    ``sync_leaf`` is an output of that step's device computation, so
    syncing it after the loop waits for the real work (jit outputs are
    never dead-code-eliminated; an unchanged passthrough input would be)."""
    import jax
    from fabric_tpu.losses import get_loss_fn
    from fabric_tpu.models import build_model
    from fabric_tpu.train.state import create_state
    from fabric_tpu.train.steps import make_train_step

    model = build_model(cfg)
    loss_fn = get_loss_fn(cfg)
    state = create_state(cfg, model)

    if variant in ("full", "full_remat", "no_donate"):
        step = make_train_step(model, loss_fn,
                               donate=variant != "no_donate",
                               compiler_options=compiler_options)

        def fn(carry, batch):
            new, stats = step(carry, batch)
            return new, stats["loss"]
        return state, fn

    if variant == "grad":
        def loss_of(params, batch_stats, batch):
            variables = {"params": params, "batch_stats": batch_stats}
            logits, updates = model.apply(
                variables, batch["img1"], batch["img2"], train=True,
                mutable=["batch_stats"])
            return loss_fn(logits, batch["label"],
                           weights=batch["weight"]), updates

        vg = jax.jit(jax.value_and_grad(loss_of, has_aux=True),
                     compiler_options=compiler_options)

        def fn(carry, batch):
            (_, updates), grads = vg(carry.params, carry.batch_stats, batch)
            # no optimizer transform runs; the grads leaf is the sync point
            return (carry.replace(batch_stats=updates["batch_stats"]),
                    jax.tree_util.tree_leaves(grads)[0])
        return state, fn

    if variant in ("fwd", "eval_fwd"):
        train = variant == "fwd"

        @functools.partial(jax.jit, compiler_options=compiler_options)
        def fwd(params, batch_stats, batch):
            variables = {"params": params, "batch_stats": batch_stats}
            if train:
                logits, updates = model.apply(
                    variables, batch["img1"], batch["img2"], train=True,
                    mutable=["batch_stats"])
                stats = updates["batch_stats"]
            else:
                logits = model.apply(variables, batch["img1"],
                                     batch["img2"], train=False)
                stats = batch_stats
            return loss_fn(logits, batch["label"],
                           weights=batch["weight"]), stats

        def fn(carry, batch):
            loss, stats = fwd(carry.params, carry.batch_stats, batch)
            return carry.replace(batch_stats=stats), loss
        return state, fn

    raise ValueError(f"unknown variant {variant!r}")


def time_variant(variant: str, batch: int, patch: int, iters: int,
                 dtype: str, compiler_options=None) -> dict:
    from fabric_tpu.config import Config
    cfg = Config(dtype=dtype, patch_size=patch, batch_size=batch,
                 remat=variant == "full_remat",
                 lane_pack="lane_pack" in variant,
                 lane_pack_bwd=variant == "full_lane_pack_bwd")
    # lane-pack variants reuse the plain builders (the packing lives in
    # cfg); the OUTPUT record keeps the requested name so an A/B's two
    # JSON lines stay distinguishable
    requested = variant
    if variant.startswith("full_lane_pack"):
        variant = "full"
    elif variant == "fwd_lane_pack":
        variant = "fwd"
    carry, fn = build_variant(variant, cfg, compiler_options)
    batch_data = _data(batch, patch)
    t0 = time.time()
    carry, leaf = fn(carry, batch_data)
    _sync(leaf)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        carry, leaf = fn(carry, batch_data)
    _sync(leaf)
    step_s = (time.time() - t0) / iters
    out = {"variant": requested, "patch": patch, "batch": batch,
           "iters": iters, "step_ms": round(step_s * 1000, 2),
           "examples_per_sec": round(batch / step_s, 1),
           "compile_s": round(compile_s, 1), "dtype": dtype}
    if compiler_options:
        out["compiler_options"] = compiler_options
    return out


def time_stage_grad(stage: int, batch: int, patch: int, iters: int,
                    dtype_name: str) -> dict:
    """Time value_and_grad of a folded forward PREFIX (stage semantics and
    DCE-defeating sums as in tools/ablate.py)."""
    import jax
    import jax.numpy as jnp
    from fabric_tpu.config import Config
    from fabric_tpu.models import build_model
    from fabric_tpu.ops.fold_bn import fold_batchnorm
    from fabric_tpu.tools.ablate import build_functional
    from fabric_tpu.train.state import create_state

    cfg = Config(dtype=dtype_name, patch_size=patch, batch_size=batch)
    model = build_model(cfg)
    state = create_state(cfg, model)
    params = fold_batchnorm(state.params, state.batch_stats)
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    # stage 11 appends the integer argmax map (not differentiable, and its
    # backward cost is ~0); grad attribution tops out at stage 10 (+up4)
    stage = min(stage, 10)
    d = _data(batch, patch)

    def objective(p):
        stages = build_functional(p, dtype, pool_impl="reshape")
        return stages(d["img1"], d["img2"], stage).astype(jnp.float32).sum()

    vg = jax.jit(jax.value_and_grad(objective))
    t0 = time.time()
    _, g = vg(params)
    _sync(g)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        _, g = vg(params)
    _sync(g)
    step_s = (time.time() - t0) / iters
    return {"stage": stage, "patch": patch, "batch": batch, "iters": iters,
            "grad_step_ms": round(step_s * 1000, 2),
            "compile_s": round(compile_s, 1), "dtype": dtype_name}


def microbench_group_conv(batch: int, patch: int, iters: int,
                          dtype_name: str) -> dict:
    """Lane-packing probe: the Siamese encoder runs 64-channel convs on a
    2N batch, leaving half the MXU's 128 lanes idle (BASELINE.md stage
    table).  The same math can run as ONE feature_group_count=2 conv on an
    N batch with 128 channels — if XLA lowers grouped convs as a single
    lane-packed MXU pass this wins ~2x on those layers; if it splits per
    group it's a wash.  This times both forms so the decision is measured,
    not guessed."""
    import jax
    import jax.numpy as jnp
    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)
    n, c = batch, 64
    x2n = jnp.asarray(rng.randn(2 * n, patch, patch, c), dt)
    xg = jnp.asarray(np.concatenate(
        [np.asarray(x2n[:n]), np.asarray(x2n[n:])], axis=-1), dt)
    k = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, dt)
    kg = jnp.concatenate([k, k], axis=-1)  # (3,3,64,128), groups=2
    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def batched(x, k):
        return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                            dimension_numbers=dn)

    @jax.jit
    def grouped(x, k):
        return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                            dimension_numbers=dn,
                                            feature_group_count=2)

    def timeit(fn, x, k):
        y = fn(x, k)
        _sync(y)
        t0 = time.time()
        for _ in range(iters):
            y = fn(x, k)
        _sync(y)
        return (time.time() - t0) / iters * 1000

    return {"microbench": "group_conv", "batch": batch, "patch": patch,
            "iters": iters, "dtype": dtype_name,
            "batched_2n_c64_ms": round(timeit(batched, x2n, k), 3),
            "grouped_n_c128_ms": round(timeit(grouped, xg, kg), 3)}


def microbench_space_to_depth(batch: int, patch: int, iters: int,
                              dtype_name: str, cin: int = 64,
                              cout: int = 64) -> dict:
    """Lane-packing probe #2: phase-shifted space-to-depth.

    The stage ablation pins the MFU ceiling on the Cout=64 full-resolution
    layers (BASELINE.md).  The remaining algebraic counter-move: a 3x3
    stride-1 conv on (N,H,W,64) is EXACTLY a 2x2 conv on the 1-px-shifted
    space-to-depth(2) tensor (N,H/2+1,W/2+1,256) — 256 in/out channels
    fill the MXU's 128 lanes, at the cost of 16/9 = 1.78x the MACs (each
    output sub-pixel ignores 1 of the 4 phase rows, but the dense kernel
    pays for it) plus the rearrangement.  Win requires >1.78x better
    tiling; this measures direct vs s2d forms on the same math and checks
    bit-equality of the result."""
    import jax
    import jax.numpy as jnp
    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)
    n = batch
    x = jnp.asarray(rng.randn(n, patch, patch, cin) * 0.1, dt)
    w = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, dt)
    dn = ("NHWC", "HWIO", "NHWC")

    # s2d weight: W2[a2,b2,(a,b,ci),(di,dj,k)] = w[u,v,ci,k] where the
    # tap of output sub-pixel (di,dj) at shifted-phase (a,b) in kernel cell
    # (a2,b2) reads input row 2*a2+a-1 relative to the output row, i.e.
    # u = 2*a2+a-1-di  (and likewise v); taps with u or v outside [-1,1]
    # are structural zeros (the 16/9 overhead).
    w2 = np.zeros((2, 2, 4 * cin, 4 * cout), np.float32)
    wf = np.asarray(w, np.float32)
    for a2 in range(2):
        for b2 in range(2):
            for a in range(2):
                for b in range(2):
                    for di in range(2):
                        for dj in range(2):
                            u = 2 * a2 + a - 1 - di
                            v = 2 * b2 + b - 1 - dj
                            if -1 <= u <= 1 and -1 <= v <= 1:
                                w2[a2, b2,
                                   (a * 2 + b) * cin:(a * 2 + b + 1) * cin,
                                   (di * 2 + dj) * cout:
                                   (di * 2 + dj + 1) * cout] \
                                    = wf[u + 1, v + 1]
    w2 = jnp.asarray(w2, dt)

    @jax.jit
    def direct(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dn)

    @jax.jit
    def s2d(x, w2):
        # pad 1 px (top/left phase shift) + 1 px bottom/right so H+2 is
        # even and every 2x2 kernel window exists; VALID 2x2 conv then
        # yields exactly H/2 x W/2 output blocks
        h = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xr = xp.reshape(x.shape[0], (h + 2) // 2, 2, (h + 2) // 2, 2, cin)
        xr = xr.transpose(0, 1, 3, 2, 4, 5).reshape(
            x.shape[0], (h + 2) // 2, (h + 2) // 2, 4 * cin)
        y = jax.lax.conv_general_dilated(xr, w2, (1, 1), "VALID",
                                         dimension_numbers=dn)
        # depth-to-space back to (N,H,W,cout)
        y = y.reshape(x.shape[0], h // 2, h // 2, 2, 2, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            x.shape[0], h, h, cout)
        return y

    ref = np.asarray(direct(x, w), np.float32)
    got = np.asarray(s2d(x, w2), np.float32)
    max_err = float(np.max(np.abs(ref - got)))

    def timeit(fn, *a):
        y = fn(*a)
        _sync(y)
        t0 = time.time()
        for _ in range(iters):
            y = fn(*a)
        _sync(y)
        return (time.time() - t0) / iters * 1000

    return {"microbench": "space_to_depth", "batch": batch, "patch": patch,
            "cin": cin, "cout": cout,
            "iters": iters, "dtype": dtype_name, "max_abs_err": max_err,
            "direct_3x3_ms": round(timeit(direct, x, w), 3),
            "s2d_2x2_ms": round(timeit(s2d, x, w2), 3)}


def microbench_int8_matmul(m: int, k: int, n: int, iters: int) -> dict:
    """int8-MXU rate probe (r3): the v5e MXU is specced at ~2x the bf16
    rate for s8 x s8 -> s32 (394 vs 197 TOPS), but isolated int8 CONVS
    time identical to bf16 through XLA (BASELINE.md) — so the int8 serving
    win is bandwidth-only today.  This times a pure matmul, the op XLA is
    most likely to lower natively, in four forms: XLA bf16, XLA int8,
    Pallas bf16, Pallas int8.  If either int8 form approaches 2x, the
    quantized convs (infer/quant.py issues s8 x s8 -> s32 convs already)
    can be re-expressed to capture it; if none does, the chip/toolchain
    has no reachable int8 MXU rate and the bandwidth framing stands."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    xi = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
    wi = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
    xb = xi.astype(jnp.bfloat16)
    wb = wi.astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    @jax.jit
    def xla_dot(x, w):
        acc = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
        return jax.lax.dot_general(x, w, dn, preferred_element_type=acc)

    def make_pallas(dtype, acc):
        tm = 1024

        def kernel(x_ref, w_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], w_ref[:], dn, preferred_element_type=acc)

        @jax.jit
        def run(x, w):
            return pl.pallas_call(
                kernel,
                grid=(m // tm,),
                in_specs=[
                    pl.BlockSpec((tm, k), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, n), acc),
            )(x, w)
        return run

    def timeit(fn, x, w):
        y = fn(x, w)
        _sync(y)
        t0 = time.time()
        for _ in range(iters):
            y = fn(x, w)
        _sync(y)
        return (time.time() - t0) / iters * 1000

    gflop = 2.0 * m * k * n / 1e9
    out = {"microbench": "int8_matmul", "m": m, "k": k, "n": n,
           "iters": iters, "gflop": round(gflop, 1)}
    # correctness pin: integer matmul is exact, so XLA int8 == Pallas int8
    ref = np.asarray(xla_dot(xi, wi))
    for name, fn, x, w in (
            ("xla_bf16", xla_dot, xb, wb),
            ("xla_int8", xla_dot, xi, wi),
            ("pallas_bf16", make_pallas(jnp.bfloat16, jnp.float32), xb, wb),
            ("pallas_int8", make_pallas(jnp.int8, jnp.int32), xi, wi)):
        try:
            if name == "pallas_int8":
                got = np.asarray(fn(xi, wi))
                out["pallas_int8_exact"] = bool(np.array_equal(ref, got))
            ms = timeit(fn, x, w)
            out[f"{name}_ms"] = round(ms, 3)
            out[f"{name}_tflops"] = round(gflop / ms, 1)
        except Exception as e:  # noqa: BLE001 — record per-form failures
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"
    return out


def microbench_int8_shift_conv(batch: int, patch: int, iters: int,
                               cin: int = 128, cout: int = 128) -> dict:
    """Rung 2 of the int8-MXU ladder: a SAME 3x3 int8 conv re-expressed as
    the sum of 9 shifted (N*H*W, Cin) @ (Cin, Cout) int8 matmuls — exact
    integer math, bit-checked against the direct s8 conv.  If XLA's int8
    DOT runs at the native MXU rate while its int8 CONV does not, this
    form captures the 2x on the compute-bound encoder levels
    (down1-down3: 128-512 channels at 32²-8², 80-100% MFU in bf16)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    n, h = batch, patch
    x = jnp.asarray(rng.randint(-127, 128, (n, h, h, cin)), jnp.int8)
    w = jnp.asarray(rng.randint(-127, 128, (3, 3, cin, cout)), jnp.int8)
    dn_conv = ("NHWC", "HWIO", "NHWC")
    dn_dot = (((1,), (0,)), ((), ()))

    @jax.jit
    def direct(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn_conv,
            preferred_element_type=jnp.int32)

    @jax.jit
    def shifted(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for u in range(3):
            for v in range(3):
                xs = jax.lax.slice(xp, (0, u, v, 0),
                                   (n, u + h, v + h, cin))
                y = jax.lax.dot_general(
                    xs.reshape(-1, cin), w[u, v], dn_dot,
                    preferred_element_type=jnp.int32)
                acc = y if acc is None else acc + y
        return acc.reshape(n, h, h, cout)

    ref = np.asarray(direct(x, w))
    got = np.asarray(shifted(x, w))

    def timeit(fn):
        y = fn(x, w)
        _sync(y)
        t0 = time.time()
        for _ in range(iters):
            y = fn(x, w)
        _sync(y)
        return (time.time() - t0) / iters * 1000

    gflop = 2.0 * 9 * n * h * h * cin * cout / 1e9
    d_ms, s_ms = timeit(direct), timeit(shifted)
    return {"microbench": "int8_shift_conv", "batch": n, "patch": h,
            "cin": cin, "cout": cout, "iters": iters,
            "exact": bool(np.array_equal(ref, got)),
            "gflop": round(gflop, 1),
            "direct_conv_ms": round(d_ms, 3),
            "direct_conv_tflops": round(gflop / d_ms, 1),
            "shifted_dot_ms": round(s_ms, 3),
            "shifted_dot_tflops": round(gflop / s_ms, 1)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None,
                    choices=["full", "grad", "fwd", "eval_fwd",
                             "full_remat", "no_donate", "full_lane_pack",
                             "full_lane_pack_bwd", "fwd_lane_pack"])
    ap.add_argument("--stage", type=int, default=None)
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--microbench",
                    choices=["group_conv", "space_to_depth", "int8_matmul",
                             "int8_shift_conv"], default=None)
    ap.add_argument("--m", type=int, default=131072)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--xla_opt", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="per-jit XLA compiler option (repeatable); the "
                         "only channel that reaches the remote TPU "
                         "compiler here (XLA_FLAGS aborts locally)")
    args = ap.parse_args(argv)
    if args.xla_opt and not args.variant:
        ap.error("--xla_opt applies to --variant runs only")
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if args.microbench == "int8_matmul":
        print(json.dumps(microbench_int8_matmul(
            args.m, args.k, args.n, args.iters)))
    elif args.microbench == "int8_shift_conv":
        print(json.dumps(microbench_int8_shift_conv(
            args.batch, args.patch, args.iters, args.cin, args.cout)))
    elif args.microbench == "group_conv":
        print(json.dumps(microbench_group_conv(
            args.batch, args.patch, args.iters, args.dtype)))
    elif args.microbench == "space_to_depth":
        print(json.dumps(microbench_space_to_depth(
            args.batch, args.patch, args.iters, args.dtype,
            args.cin, args.cout)))
    elif args.variant:
        opts = dict(kv.split("=", 1) for kv in args.xla_opt) or None
        print(json.dumps(time_variant(args.variant, args.batch, args.patch,
                                      args.iters, args.dtype, opts)))
    elif args.stage is not None:
        print(json.dumps(time_stage_grad(args.stage, args.batch, args.patch,
                                         args.iters, args.dtype)))
    else:
        ap.error("need --variant or --stage")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
