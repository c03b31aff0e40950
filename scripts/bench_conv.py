"""Conv-shaped microbenchmark: direct XLA lowering vs the in-VMEM banded
Pallas kernel, at the exact (C, O, H, W) shapes of the UNet train step.

Measures, per shape and implementation:
  * fwd ms and fwd+bwd ms (K-step chained scan in ONE device call, fenced
    by materializing a value that depends on every iteration — the honest
    fence from bench.py; block_until_ready is unreliable on the tunneled
    axon backend);
  * achieved TFLOP/s against both the true conv FLOPs and the
    lane-padded FLOPs of each lowering — the measured per-shape ceiling
    table VERDICT round-2 item 4 asks for.

Run:  python scripts/bench_conv.py            (real chip via ambient env)
      BENCH_SHAPES=small python scripts/bench_conv.py   (quick subset)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wsl4mis_tpu.ops.pallas.banded_conv_pallas import (
    banded_conv3x3_pallas,
    plan_banded,
    _ceil128,
)

# (C, O, H, W) at batch 24 — every conv-block shape of the 256^2 UNet step
# (encoder + decoder, unet.py channel plan) plus the 4-class head.
SHAPES = [
    (1, 16, 256, 256),
    (16, 16, 256, 256),
    (16, 32, 128, 128),
    (32, 32, 128, 128),
    (32, 64, 64, 64),
    (64, 64, 64, 64),
    (64, 128, 32, 32),
    (128, 128, 32, 32),
    (128, 256, 16, 16),
    (256, 256, 16, 16),
    (256, 128, 32, 32),
    (128, 64, 64, 64),
    (64, 32, 128, 128),
    (32, 16, 256, 256),
    (16, 4, 256, 256),
]
BATCH = int(os.environ.get("BENCH_BATCH", "24"))
K = int(os.environ.get("BENCH_K", "200"))  # RTT/K share ~0.2-0.4 ms/iter at 50; 200 amortizes it below the smallest conv
REPS = int(os.environ.get("BENCH_REPS", "3"))


def _direct(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b.astype(y.dtype)


def _time_chain(fn, *args):
    """K-iteration dependent chain in one jit call; returns ms/iteration."""
    jitted = jax.jit(fn)
    out = jitted(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])  # warm+fence
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = jitted(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


def bench_shape(c, o, h, w, impl, fence_ms):
    """Returns (fwd_ms, fwdbwd_ms, fence_mode) NET of the fence-only
    baseline.

    Each chain iteration feeds a data-dependent scalar of the conv output
    back into the kernel, so the K iterations cannot overlap or be
    elided; the fence-only chain (identical minus the conv) is measured
    once per (C,H,W) and subtracted — it carries the tunnel RTT/K and
    scan overhead.

    Self-validating (VERDICT r3 item 7): if the scalar-feedback reading
    implies more than BENCH_MAX_TFS (default 80, above the chip's
    measured 67 TF/s matmul calibration) the program was DCE'd despite
    the optimization_barrier; the shape is re-measured with a
    full-tensor sum feedback (cannot be narrowed), netting a fence that
    carries the same sum — no rows ever need hand-exclusion."""
    key = jax.random.key(0)
    kx, kk = jax.random.split(key)
    x = jax.random.normal(kx, (BATCH, h, w, c), jnp.bfloat16)
    kern = (jax.random.normal(kk, (3, 3, c, o), jnp.float32) * 0.1).astype(
        jnp.bfloat16
    )
    b = jnp.zeros((o,), jnp.bfloat16)
    if impl == "pallas":
        if plan_banded(c, o, h, w) is None:
            return None
        conv = banded_conv3x3_pallas
    else:
        conv = _direct

    def fwd_chain(k0, x):
        def body(kk_, _):
            # optimization_barrier forces the FULL conv output to exist
            # (no DCE/narrowing), while the serializing feedback is one
            # element — so the chain adds ~zero non-conv work. (The old
            # tanh(sum(y)) feedback cost a full f32 reduction per
            # iteration, which for the fast shapes exceeded the conv and
            # drove the fence-subtracted reading to the 1e-3 clamp —
            # the bogus sub-10us rows in the round-3 first run.)
            y = jax.lax.optimization_barrier(conv(x, kk_, b))
            kk2 = kk_ + (y[0, 0, 0, 0].astype(jnp.float32) * 1e-30).astype(
                kk_.dtype
            )
            return kk2, None

        kN, _ = jax.lax.scan(body, k0, None, length=K)
        return kN

    fwd_ms = _time_chain(fwd_chain, kern, x) - fence_ms
    fence_mode = "scalar"

    true_g = 2 * BATCH * h * w * 9 * c * o / 1e9
    max_tfs = float(os.environ.get("BENCH_MAX_TFS", "80"))
    if fwd_ms <= 0 or true_g / max(fwd_ms, 1e-6) > max_tfs:
        # DCE suspected: re-measure with an un-narrowable sum feedback and
        # a sum-bearing fence.
        def fwd_chain_sum(k0, x):
            def body(kk_, _):
                y = conv(x, kk_, b)
                s = jnp.sum(y.astype(jnp.float32))
                return kk_ + (s * 1e-30).astype(kk_.dtype), None

            return jax.lax.scan(body, k0, None, length=K)[0]

        def fence_chain_sum(k0, x):
            def body(kk_, _):
                s = jnp.sum(
                    (x * (1.0 + kk_[0, 0, 0, 0])).astype(jnp.float32)
                )
                return kk_ + (s * 1e-30).astype(kk_.dtype), None

            return jax.lax.scan(body, k0, None, length=K)[0]

        xo = jax.random.normal(kx, (BATCH, h, w, o), jnp.bfloat16)
        sum_fence = _time_chain(fence_chain_sum, kern, xo)
        fwd_ms = _time_chain(fwd_chain_sum, kern, x) - sum_fence
        fence_mode = "sum"

    def step_chain(k0, x):
        def body(kk_, _):
            def loss(kk2):
                return jnp.sum(conv(x, kk2, b).astype(jnp.float32) ** 2)

            g = jax.grad(loss)(kk_)
            return kk_ - (1e-12 * g).astype(kk_.dtype), None

        kN, _ = jax.lax.scan(body, k0, None, length=K)
        return kN

    fb_ms = _time_chain(step_chain, kern, x) - fence_ms
    return max(fwd_ms, 1e-3), max(fb_ms, 1e-3), fence_mode


def bench_fence(c, o, h, w):
    """Fence-only chain: same scalar feedback, no conv."""
    kx, _ = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (BATCH, h, w, c), jnp.bfloat16)
    kern = jnp.zeros((3, 3, c, o), jnp.bfloat16)

    def chain(k0, x):
        def body(kk_, _):
            # scalar-only serializing chain: the fence now measures just
            # the per-call RTT share + scan overhead (the conv chains'
            # feedback is equally scalar, so the subtraction is fair)
            e = jax.lax.optimization_barrier(
                x[0, 0, 0, 0] * (1.0 + kk_[0, 0, 0, 0].astype(jnp.float32))
            )
            kk2 = kk_.at[0, 0, 0, 0].add((e * 1e-30).astype(kk_.dtype))
            return kk2, None

        return jax.lax.scan(body, k0, None, length=K)[0]

    return _time_chain(chain, kern, x)


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} batch={BATCH} K={K}", flush=True)
    rows = []
    shapes = SHAPES if os.environ.get("BENCH_SHAPES") != "small" else SHAPES[1:4]
    for c, o, h, w in shapes:
        true_g = 2 * BATCH * h * w * 9 * c * o / 1e9
        pad_direct_g = 2 * BATCH * h * w * _ceil128(9 * c) * _ceil128(o) / 1e9
        plan = plan_banded(c, o, h, w)
        pad_banded_g = (
            BATCH * h * w * plan.cost_per_pixel / 1e9 if plan else None
        )
        fence_ms = bench_fence(c, o, h, w)
        row = {
            "shape": f"{c}->{o}@{h}x{w}",
            "true_gflop": round(true_g, 2),
            "pad_direct_gflop": round(pad_direct_g, 2),
            "pad_banded_gflop": round(pad_banded_g, 2) if pad_banded_g else None,
            "J": plan.j if plan else None,
            "fence_ms": round(fence_ms, 3),
        }
        for impl in ("direct", "pallas"):
            r = bench_shape(c, o, h, w, impl, fence_ms)
            if r is None:
                row[impl] = None
                continue
            fwd_ms, fb_ms, fence_mode = r
            row[impl] = {
                "fwd_ms": round(fwd_ms, 3),
                "fwdbwd_ms": round(fb_ms, 3),
                "fwd_true_tfs": round(true_g / fwd_ms, 1),
                "fwd_pad_tfs": round(
                    (pad_banded_g if impl == "pallas" else pad_direct_g)
                    / fwd_ms, 1),
                "fence_mode": fence_mode,
            }
            print(json.dumps(row | {"impl": impl}), flush=True)
        rows.append(row)
    print("\n# summary (fwd ms direct -> pallas):")
    for r in rows:
        d, p = r.get("direct"), r.get("pallas")
        if d and p:
            print(
                f"{r['shape']:>18}: {d['fwd_ms']:7.3f} -> {p['fwd_ms']:7.3f} "
                f"ms ({d['fwd_ms']/p['fwd_ms']:4.2f}x) | fwd+bwd "
                f"{d['fwdbwd_ms']:7.3f} -> {p['fwdbwd_ms']:7.3f} "
                f"({d['fwdbwd_ms']/p['fwdbwd_ms']:4.2f}x)"
            )
        elif d:
            print(f"{r['shape']:>18}: {d['fwd_ms']:7.3f} ms (direct only)")


if __name__ == "__main__":
    main()
