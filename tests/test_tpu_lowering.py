"""TPU-backed lowering smoke for every Pallas kernel's non-interpret path.

Round-4 postmortem: the Pallas max-pool kernel passed full bit-parity in
interpret mode but failed Mosaic lowering on the real chip (non-unit-step
getitem -> gather, "Only 2D gather is supported"), killing a whole TPU
chain (RESULTS.md round 4). Interpret mode executes the kernel body as
plain jnp, so lowering-only failures are invisible to the CPU suite.

This module compiles (does not run) each kernel fwd+bwd for the real
backend. Under pytest the conftest pins JAX to CPU, so these tests skip;
run the same checks against the live chip with

    python tests/test_tpu_lowering.py        # ambient JAX_PLATFORMS=axon

which any TPU chain should do once before committing hours to a config
that enables a new kernel.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _backend_is_tpu():
    import jax

    return jax.devices()[0].platform in ("tpu", "axon")


def _compile(fn, *args):
    import jax

    jax.jit(fn).lower(*args).compile()


def _smokes():
    """Yield (name, thunk) pairs; each thunk compiles one kernel path."""
    import jax
    import jax.numpy as jnp

    from wsl4mis_tpu.ops.pallas.augment_pallas import augment_batch_pallas
    from wsl4mis_tpu.ops.pallas.banded_conv_pallas import (
        banded_conv3x3_pallas,
        eligible,
    )
    from wsl4mis_tpu.ops.pallas.gated_crf_pallas import gated_crf_loss_pallas
    from wsl4mis_tpu.ops.pallas.maxpool_pallas import max_pool_2x2_pallas

    key = jax.random.PRNGKey(0)

    def pool():
        x = jax.random.normal(key, (2, 64, 256, 16), jnp.bfloat16)

        def f(x):
            return jnp.sum(max_pool_2x2_pallas(x).astype(jnp.float32))

        _compile(jax.value_and_grad(f), x)

    def conv():
        x = jax.random.normal(key, (2, 256, 256, 16), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, 16, 16), jnp.bfloat16)
        b = jnp.zeros((16,), jnp.bfloat16)
        assert eligible(x.shape, k.shape)

        def f(x, k, b):
            return jnp.sum(
                banded_conv3x3_pallas(x, k, b).astype(jnp.float32)
            )

        _compile(jax.value_and_grad(f, argnums=(0, 1, 2)), x, k, b)

    def conv_smallc():
        # c=1 stem admission (round 4): J=128 window, nfull=1 + 2-lane rem
        x = jax.random.normal(key, (2, 256, 256, 1), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, 1, 16), jnp.bfloat16)
        b = jnp.zeros((16,), jnp.bfloat16)
        assert eligible(x.shape, k.shape)

        def f(x, k, b):
            return jnp.sum(
                banded_conv3x3_pallas(x, k, b).astype(jnp.float32)
            )

        _compile(jax.value_and_grad(f, argnums=(0, 1, 2)), x, k, b)

    def conv_mdense():
        # M=2 dense plan (round 4): 4D (rows, K/M, M, 128) block view +
        # fixed-parity piece slices in fwd AND wgrad
        from wsl4mis_tpu.ops.pallas.banded_conv_pallas import plan_banded

        x = jax.random.normal(key, (2, 256, 256, 32), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, 32, 16), jnp.bfloat16)
        b = jnp.zeros((16,), jnp.bfloat16)
        p = plan_banded(32, 16, 256, 256)
        assert p is not None and p.m == 2, p

        def f(x, k, b):
            return jnp.sum(
                banded_conv3x3_pallas(x, k, b).astype(jnp.float32)
            )

        _compile(jax.value_and_grad(f, argnums=(0, 1, 2)), x, k, b)

    def conv_chain():
        # flat-chained pair: grouped-out conv -> elementwise -> grouped-in
        from wsl4mis_tpu.ops.pallas.banded_conv_pallas import (
            banded_conv3x3_pallas_stats_grouped_in,
            banded_conv3x3_pallas_stats_grouped_out,
        )

        x = jax.random.normal(key, (2, 256, 256, 16), jnp.bfloat16)
        k1 = jax.random.normal(key, (3, 3, 16, 16), jnp.bfloat16)
        k2 = jax.random.normal(key, (3, 3, 16, 16), jnp.bfloat16)

        def f(x, k1, k2):
            yg, s1, s2 = banded_conv3x3_pallas_stats_grouped_out(x, k1)
            mul = jnp.tile(s1 - s2, 8).astype(yg.dtype)  # per-lane affine
            y = jax.nn.leaky_relu(yg * mul)
            y4, t1, t2 = banded_conv3x3_pallas_stats_grouped_in(
                y, x.shape[2], k2
            )
            return jnp.sum(y4.astype(jnp.float32)) + jnp.sum(t1) + jnp.sum(t2)

        _compile(jax.value_and_grad(f, argnums=(0, 1, 2)), x, k1, k2)

    def conv_pool_chain():
        # round-5 flat seam: grouped-io conv -> flat selection-matmul pool
        # -> grouped-io conv, no 4D tensor anywhere in the seam
        from wsl4mis_tpu.ops.maxpool import max_pool_2x2_flat
        from wsl4mis_tpu.ops.pallas.banded_conv_pallas import (
            banded_conv3x3_pallas_stats_grouped_io,
        )

        x = jax.random.normal(key, (2, 256, 32, 128), jnp.bfloat16)  # flat
        k1 = jax.random.normal(key, (3, 3, 16, 16), jnp.bfloat16)
        k2 = jax.random.normal(key, (3, 3, 16, 32), jnp.bfloat16)

        def f(x, k1, k2):
            yg, s1, s2 = banded_conv3x3_pallas_stats_grouped_io(x, 256, k1)
            n, h = yg.shape[0], yg.shape[1]
            yf = yg.reshape(n, h, 256 * 16)
            pf = max_pool_2x2_flat(yf, 16)
            y2, t1, t2 = banded_conv3x3_pallas_stats_grouped_io(
                pf.reshape(n, h // 2, (256 * 16) // 256, 128), 128, k2
            )
            return (jnp.sum(y2.astype(jnp.float32)) + jnp.sum(s1)
                    + jnp.sum(s2) + jnp.sum(t1) + jnp.sum(t2))

        _compile(jax.value_and_grad(f, argnums=(0, 1, 2)), x, k1, k2)

    def conv_split_flat():
        # round-5 UpBlock flat path: conv(concat(a,b)) as two kernel-split
        # grouped-io convs summed, no materialized concat
        from wsl4mis_tpu.ops.pallas.banded_conv_pallas import (
            banded_conv3x3_pallas_stats_grouped_io,
        )

        a = jax.random.normal(key, (2, 256, 32, 128), jnp.bfloat16)
        b = jax.random.normal(key, (2, 256, 32, 128), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, 32, 16), jnp.bfloat16)
        bias = jnp.zeros((16,), jnp.bfloat16)

        def f(a, b, k, bias):
            ya, _, _ = banded_conv3x3_pallas_stats_grouped_io(
                a, 256, k[:, :, :16], bias
            )
            yb, _, _ = banded_conv3x3_pallas_stats_grouped_io(
                b, 256, k[:, :, 16:]
            )
            return jnp.sum((ya + yb).astype(jnp.float32))

        _compile(jax.value_and_grad(f, argnums=(0, 1, 2, 3)), a, b, k, bias)

    def crf():
        p = jax.nn.softmax(jax.random.normal(key, (2, 64, 64, 4)), axis=-1)
        img = jax.random.normal(key, (2, 64, 64, 1))

        def f(p):
            return gated_crf_loss_pallas(p, img)

        _compile(jax.value_and_grad(f), p)

    def aug():
        imgs = jax.random.normal(key, (4, 256, 256), jnp.float32)
        labs = jnp.zeros((4, 256, 256), jnp.int32)
        _compile(lambda r: augment_batch_pallas(r, imgs, labs), key)

    yield "maxpool", pool
    yield "banded_conv", conv
    yield "banded_conv_smallc", conv_smallc
    yield "banded_conv_mdense", conv_mdense
    yield "banded_conv_chain", conv_chain
    yield "conv_pool_chain_flat", conv_pool_chain
    yield "conv_split_flat", conv_split_flat
    yield "gated_crf", crf
    yield "augment", aug


@pytest.mark.slow
def test_tpu_lowering_all():
    if not _backend_is_tpu():
        pytest.skip("real TPU backend required (conftest pins CPU)")
    for name, thunk in _smokes():
        thunk()


if __name__ == "__main__":
    ok = True
    for name, thunk in _smokes():
        try:
            thunk()
            print(f"LOWER_OK {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            ok = False
            msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
            print(f"LOWER_FAIL {name}: {msg}", flush=True)
    sys.exit(0 if ok else 1)
