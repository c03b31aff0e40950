"""Weak/strong + CTAugment transforms (reference dataset.py:86-204)."""

import numpy as np
import pytest

from wsl4mis_tpu.data.weak_strong import (
    OPS,
    CTATransform,
    CTAugment,
    OpCall,
    WeakStrongAugment,
    cta_apply,
)


@pytest.fixture
def sample():
    rng = np.random.default_rng(0)
    return {
        "image": rng.random((70, 80)).astype(np.float32),
        "label": rng.integers(0, 4, (70, 80)).astype(np.int32),
    }


def test_weak_strong_keys_shapes(sample):
    t = WeakStrongAugment((64, 64), seed=0)
    out = t(sample)
    assert set(out) == {"image", "image_weak", "image_strong", "label_aug"}
    for k in out:
        assert out[k].shape == (64, 64), k
    # weak is a pure isometry of the resized image: same multiset of values
    assert np.allclose(np.sort(out["image"].ravel()),
                       np.sort(out["image_weak"].ravel()))
    # label follows the weak geometry, never the photometric jitter
    assert set(np.unique(out["label_aug"])) <= {0, 1, 2, 3}


def test_weak_strong_deterministic(sample):
    a = WeakStrongAugment((64, 64), seed=7)(sample)
    b = WeakStrongAugment((64, 64), seed=7)(sample)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_ops_preserve_range():
    rng = np.random.default_rng(1)
    x = rng.random((32, 32)).astype(np.float32)
    for name, (fn, _, bins) in OPS.items():
        args = tuple(0.3 for _ in bins)
        y = fn(x, *args)
        assert y.shape == x.shape, name
        assert np.isfinite(y).all(), name
        assert -0.01 <= y.min() and y.max() <= 1.01, name


def test_cta_apply_label_geometric_only():
    lab = np.zeros((32, 32), np.float32)
    lab[8:24, 8:24] = 3
    ops = [OpCall("invert", ()), OpCall("translate_x", (0.9,))]
    out = cta_apply(lab, ops, is_label=True)
    # invert skipped on labels; translate moved the square
    assert set(np.unique(out)) <= {0.0, 3.0}
    assert not np.array_equal(out, lab)


def test_ctaugment_policy_and_rates():
    cta = CTAugment(depth=2, seed=3)
    pol = cta.policy(probe=False)
    assert len(pol) == 2
    for call in pol:
        assert call.name in OPS
        for a in call.args:
            assert 0.0 <= a < 1.0
    before = {n: [w.copy() for w in ws] for n, ws in cta.rates.items()}
    for _ in range(20):
        cta.update_rates(cta.policy(probe=True), proximity=0.0)
    changed = any(
        not np.array_equal(w0, w1)
        for n in OPS
        for w0, w1 in zip(before[n], cta.rates[n])
    )
    assert changed
    # weights stay in (0, 1]
    for ws in cta.rates.values():
        for w in ws:
            assert (w > 0).all() and (w <= 1).all()


def test_ctaugment_low_weight_bins_excluded():
    cta = CTAugment(depth=1, seed=5)
    (w,) = cta.rates["brightness"]
    w[:] = 1e-6
    w[4] = 1.0  # only bin 4 survives the 0.2 threshold
    for _ in range(10):
        v = cta._sample_arg(w, probe=False)
        assert 4 / 17 <= v < 5 / 17


def test_cta_transform(sample):
    t = CTATransform((64, 64), CTAugment(seed=11))
    out = t(sample)
    assert out["image_weak"].shape == (64, 64)
    assert out["image_strong"].shape == (64, 64)
    assert out["label_aug"].dtype == np.int32
    assert set(np.unique(out["label_aug"])) <= {0, 1, 2, 3}
    # replaying the recorded ops reproduces the outputs
    again = t(sample, ops_weak=out["ops_weak"], ops_strong=out["ops_strong"])
    np.testing.assert_array_equal(out["image_strong"], again["image_strong"])
