"""The round-5 flat-seam promotion (df1e8dd) made WSL4MIS_POOL_CHAIN and
WSL4MIS_UP_CHAIN default to "flat". The parity tests set every knob
explicitly, so nothing else asserts that a plain TPU process (no env)
actually engages the seams. These tests simulate the TPU knob resolution
(impl knobs pinned to their TPU defaults) and check the eligibility
predicates fire for the production UNet shapes with the chain knobs
UNSET — i.e. the defaults themselves route the fast path.
"""

import jax.numpy as jnp  # noqa: F401  (keeps jax import cost in one place)
import pytest

from wsl4mis_tpu.models.unet import (
    DEFAULT_FEATURES,
    _flat_seam_ok,
    _up_flat_ok,
    chain_ok,
)


@pytest.fixture()
def tpu_defaults(monkeypatch):
    # what a real TPU process resolves to with NO env set
    monkeypatch.setenv("WSL4MIS_CONV_IMPL", "pallas")
    monkeypatch.setenv("WSL4MIS_POOL_IMPL", "fused3")
    monkeypatch.setenv("WSL4MIS_TCONV_IMPL", "matmul")
    for k in ("WSL4MIS_POOL_CHAIN", "WSL4MIS_UP_CHAIN",
              "WSL4MIS_CONV_CHAIN", "WSL4MIS_BN_IMPL"):
        monkeypatch.delenv(k, raising=False)


def test_pool_seams_default_on(tpu_defaults):
    """Every encoder conv->pool->conv seam of the b24 production UNet
    engages flat with the chain knobs unset."""
    f = DEFAULT_FEATURES
    sh = (24, 256, 256, 1)
    engaged = []
    for i in range(len(f) - 1):
        engaged.append(_flat_seam_ok(sh, f[i], f[i + 1], True))
        sh = (24, sh[1] // 2, sh[2] // 2, f[i])
    # the deep stages fall off banded eligibility; the expensive
    # full-resolution seams (stage 0/1) must be flat by default
    assert engaged[0] and engaged[1], engaged


def test_up_seams_default_on(tpu_defaults):
    """The decoder's shallow (expensive) UpBlock engages the split-kernel
    flat path by default."""
    assert _up_flat_ok((24, 256, 256, 16), 16, 16, True)


def test_chain_off_in_eval(tpu_defaults):
    assert not chain_ok((24, 256, 256, 1), 16, False)
    assert not _flat_seam_ok((24, 256, 256, 1), 16, 32, False)
    assert not _up_flat_ok((24, 256, 256, 16), 16, 16, False)


def test_knob_off_restores_4d(tpu_defaults, monkeypatch):
    monkeypatch.setenv("WSL4MIS_POOL_CHAIN", "off")
    assert not _flat_seam_ok((24, 256, 256, 1), 16, 32, True)
    monkeypatch.setenv("WSL4MIS_UP_CHAIN", "off")
    assert not _up_flat_ok((24, 256, 256, 16), 16, 16, True)
