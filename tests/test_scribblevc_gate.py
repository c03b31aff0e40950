"""rep_gate semantics: one gated forward must reproduce both phases of
the reference's epoch switch (train_ACDC_scribblevc.py:219, memory on
after epoch 4) that the step previously expressed as a lax.cond over two
full model applies (removed: it doubled saved activations and OOMed HBM
at bench batch sizes — RESULTS.md round 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsl4mis_tpu.models.scribblevc import ScribbleVC


@pytest.fixture(scope="module")
def setup():
    model = ScribbleVC(num_classes=4, dtype=jnp.float32, batch_size=2)
    x = jax.random.uniform(jax.random.key(1), (2, 256, 256, 1), jnp.float32)
    variables = dict(
        model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(0)},
            jnp.zeros((1, 256, 256, 1), jnp.float32), train=False,
        )
    )
    # non-trivial prototypes so the injection actually moves the output
    mem = variables["class_memory"]
    variables["class_memory"] = {
        "hist_conv": jax.random.normal(
            jax.random.key(2), mem["hist_conv"].shape, jnp.float32
        ),
        "hist_tran": jax.random.normal(
            jax.random.key(3), mem["hist_tran"].shape, jnp.float32
        ),
        "initialized": jnp.ones((), jnp.float32),
    }
    return model, variables, x


def _apply(model, variables, x, **kw):
    return model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.key(7)},
        mutable=["batch_stats", "class_memory"], **kw,
    )


def test_gate_zero_matches_no_memory_forward(setup):
    model, variables, x = setup
    out_off, mut_off = _apply(model, variables, x, use_class_rep=False)
    out_gate, mut_gate = _apply(
        model, variables, x, use_class_rep=True,
        rep_gate=jnp.zeros((), jnp.float32),
    )
    for a, b in zip(jax.tree.leaves(out_off), jax.tree.leaves(out_gate)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # memory untouched at gate 0
    for k in ("hist_conv", "hist_tran", "initialized"):
        np.testing.assert_array_equal(
            np.asarray(mut_gate["class_memory"][k]),
            np.asarray(variables["class_memory"][k]),
        )


def test_gate_one_matches_ungated_memory_forward(setup):
    model, variables, x = setup
    out_mem, mut_mem = _apply(model, variables, x, use_class_rep=True)
    out_gate, mut_gate = _apply(
        model, variables, x, use_class_rep=True,
        rep_gate=jnp.ones((), jnp.float32),
    )
    for a, b in zip(jax.tree.leaves(out_mem), jax.tree.leaves(out_gate)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in ("hist_conv", "hist_tran", "initialized"):
        np.testing.assert_array_equal(
            np.asarray(mut_mem["class_memory"][k]),
            np.asarray(mut_gate["class_memory"][k]),
        )
