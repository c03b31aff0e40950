"""Profiling helpers.

The reference's only timing tool is a CUDA-event forward/backward
micro-benchmark (networks_other.py:203-258, unused by the scripts). The
TPU-native equivalents here are used by bench.py and available to users:

  * measure_fwd_bwd_time — honest device timing of a model's forward and
    forward+backward passes with block_until_ready fences;
  * trace — context manager around jax.profiler for a TensorBoard trace.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def measure_fwd_bwd_time(model, variables, x, n_warmup: int = 3,
                         n_iters: int = 20):
    """Returns (fwd_seconds, fwd_bwd_seconds) per iteration."""

    @jax.jit
    def fwd(v, x):
        out = model.apply(v, x, train=False)
        if isinstance(out, (tuple, list)):
            out = out[0]
        return jnp.sum(out)

    @jax.jit
    def fwd_bwd(v, x):
        def loss(params):
            out = model.apply(
                {**v, "params": params}, x, train=False
            )
            if isinstance(out, (tuple, list)):
                out = out[0]
            return jnp.sum(out * out)

        return jax.grad(loss)(v["params"])

    for _ in range(n_warmup):
        jax.block_until_ready(fwd(variables, x))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(variables, x)
    jax.block_until_ready(out)
    t_fwd = (time.perf_counter() - t0) / n_iters

    for _ in range(n_warmup):
        jax.block_until_ready(fwd_bwd(variables, x))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        g = fwd_bwd(variables, x)
    jax.block_until_ready(g)
    t_fwd_bwd = (time.perf_counter() - t0) / n_iters
    return t_fwd, t_fwd_bwd


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
