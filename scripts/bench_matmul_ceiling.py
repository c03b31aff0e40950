#!/usr/bin/env python
"""Re-calibrate the chip's sustained bf16 matmul throughput (the MFU
denominator and the 'padded-flop ceiling' the banded-conv kernel is judged
against — RESULTS.md round-2 measured 67 TF/s for chained 4096^3).

Chains K dependent matmuls inside ONE device call (lax.scan carrying the
activations), fenced by materializing a slice of the result — the same
honest fence bench.py uses. Reports TF/s per size; also an MXU-shaped
(M huge, K=512, N=128) variant matching the banded kernel's dot shapes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K_STEPS = int(os.environ.get("CEIL_K", "30"))


def bench_square(n: int) -> float:
    a = jax.random.normal(jax.random.key(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (n, n), jnp.bfloat16)

    @jax.jit
    def run(a, b):
        def body(x, _):
            y = jax.lax.dot(x, b, preferred_element_type=jnp.bfloat16)
            # renormalize so values stay finite across the chain
            return y * jnp.bfloat16(1e-2), None

        out, _ = jax.lax.scan(body, a, None, length=K_STEPS)
        return out

    out = run(a, b)
    np.asarray(jax.device_get(out[0, :8]))
    t0 = time.perf_counter()
    out = run(a, b)
    np.asarray(jax.device_get(out[0, :8]))
    dt = time.perf_counter() - t0
    return 2.0 * n * n * n * K_STEPS / dt / 1e12


def bench_banded_shape(m: int, k: int, n: int) -> float:
    """A (m,k)@(k,n) chain shaped like the banded kernel's dots."""
    a = jax.random.normal(jax.random.key(0), (m, k), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (k, n), jnp.bfloat16)
    c = jax.random.normal(jax.random.key(2), (n, k), jnp.bfloat16)

    @jax.jit
    def run(a):
        def body(x, _):
            y = jax.lax.dot(x, b, preferred_element_type=jnp.float32)
            x2 = jax.lax.dot(y.astype(jnp.bfloat16), c,
                             preferred_element_type=jnp.bfloat16)
            return x2 * jnp.bfloat16(1e-2), None

        out, _ = jax.lax.scan(body, a, None, length=K_STEPS)
        return out

    out = run(a)
    np.asarray(jax.device_get(out[0, :8]))
    t0 = time.perf_counter()
    out = run(a)
    np.asarray(jax.device_get(out[0, :8]))
    dt = time.perf_counter() - t0
    return 2.0 * m * k * n * 2 * K_STEPS / dt / 1e12


def main():
    rows = {}
    for n in (1024, 2048, 4096, 8192):
        rows[f"square_{n}"] = round(bench_square(n), 2)
    # the banded fwd dot at 16->16@256x256, batch 24: M = BH*G rows per
    # grid cell, but effectively XLA sees (BH*G, 128)@(128,128); model the
    # whole-row variant M = 24*256*32 pixels / ... use M=8192 tiles
    for m, k, n in ((8192, 512, 128), (8192, 128, 128), (32768, 512, 128)):
        rows[f"mkn_{m}x{k}x{n}"] = round(bench_banded_shape(m, k, n), 2)
    rows["device"] = jax.devices()[0].device_kind
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
