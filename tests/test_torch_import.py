"""Round-trip test for the efficientnet_pytorch -> flax weight converter
(VERDICT r3 item 8; reference: net_factory.py:16 loads ImageNet encoder
weights via the efficient_encoder.py:125-199 URL map).

No egress in this environment, so the torch file is SYNTHESIZED with the
exact efficientnet_pytorch key naming and shapes (derived independently
from the compound-scaling math), then converted and strict-shape-merged
into a real `EffiUNet.init` tree — any naming or layout drift on either
side fails the merge.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsl4mis_tpu.models.efficientunet import (
    _BASE_BLOCKS,
    _SCALING,
    EffiUNet,
    round_filters,
    round_repeats,
)
from wsl4mis_tpu.utils.torch_import import (
    convert_efficientnet_encoder,
    load_pretrained_encoder,
)


def synth_state_dict(model_name: str, rng: np.random.RandomState):
    """Synthetic efficientnet_pytorch state_dict (correct keys/shapes)."""
    width, depth, _ = _SCALING[model_name]
    sd = {}

    # small weight scale: iid N(0,1) weights explode through b3's 26
    # swish blocks (activation overflow -> NaN); the test pins naming and
    # shapes, not large-magnitude numerics
    def randn(*shape):
        return (0.05 * rng.randn(*shape)).astype(np.float32)

    def bn(prefix, ch):
        sd[f"{prefix}.weight"] = 1.0 + randn(ch)
        sd[f"{prefix}.bias"] = randn(ch)
        sd[f"{prefix}.running_mean"] = randn(ch)
        sd[f"{prefix}.running_var"] = np.ones(ch, np.float32)
        sd[f"{prefix}.num_batches_tracked"] = np.int64(0)

    stem = round_filters(32, width)
    sd["_conv_stem.weight"] = randn(stem, 3, 3, 3)
    bn("_bn0", stem)

    bi = 0
    for e, k, _s, fin, fout, r in _BASE_BLOCKS:
        in_f = round_filters(fin, width)
        out_f = round_filters(fout, width)
        for j in range(round_repeats(r, depth)):
            pre = f"_blocks.{bi}"
            bin_ = in_f if j == 0 else out_f
            exp = bin_ * e
            if e != 1:
                sd[f"{pre}._expand_conv.weight"] = randn(
                    exp, bin_, 1, 1
                )
                bn(f"{pre}._bn0", exp)
            sd[f"{pre}._depthwise_conv.weight"] = randn(
                exp, 1, k, k
            )
            bn(f"{pre}._bn1", exp)
            se = max(1, int(bin_ * 0.25))
            sd[f"{pre}._se_reduce.weight"] = randn(
                se, exp, 1, 1
            )
            sd[f"{pre}._se_reduce.bias"] = randn(se)
            sd[f"{pre}._se_expand.weight"] = randn(
                exp, se, 1, 1
            )
            sd[f"{pre}._se_expand.bias"] = randn(exp)
            sd[f"{pre}._project_conv.weight"] = randn(
                out_f, exp, 1, 1
            )
            bn(f"{pre}._bn2", out_f)
            bi += 1

    # head keys the encoder ignores (reference pops only _fc,
    # efficient_encoder.py:105-108; _conv_head/_bn1 are unused by taps)
    head = round_filters(1280, width)
    sd["_conv_head.weight"] = randn(head, out_f, 1, 1)
    bn("_bn1", head)
    sd["_fc.weight"] = randn(1000, head)
    sd["_fc.bias"] = randn(1000)
    # real efficientnet_pytorch checkpoints hold torch.Tensors (and load
    # under torch.load(weights_only=True), which rejects numpy pickles) —
    # the synthetic one must match for the converter-CLI e2e path
    import torch

    return {k: torch.as_tensor(v) for k, v in sd.items()}


@pytest.mark.parametrize("model_name", ["efficientnet-b0", "efficientnet-b3"])
def test_convert_and_merge_roundtrip(model_name):
    rng = np.random.RandomState(0)
    sd = synth_state_dict(model_name, rng)
    model = EffiUNet(encoder_name=model_name, num_classes=4,
                     dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 1), jnp.float32), train=False,
    )
    merged = load_pretrained_encoder(
        dict(variables), sd, model_name, in_channels=1
    )

    # every encoder leaf replaced, exact shapes
    scope = next(
        k for k in variables["params"] if k.startswith("EfficientNetEncoder")
    )
    flat_old = jax.tree_util.tree_flatten_with_path(
        variables["params"][scope]
    )[0]
    flat_new = dict(
        jax.tree_util.tree_flatten_with_path(merged["params"][scope])[0]
    )
    assert len(flat_old) == len(flat_new)
    n_replaced = 0
    for path, old in flat_old:
        new = flat_new[path]
        assert new.shape == old.shape, path
        n_replaced += int(not np.array_equal(np.asarray(new),
                                             np.asarray(old)))
    # all encoder params come from the torch file (random vs random —
    # collisions impossible)
    assert n_replaced == len(flat_old)

    # stem patching: in_channels=1 sums the RGB filters
    # (efficient_encoder.py:53-54)
    stem = np.asarray(merged["params"][scope]["Conv_0"]["kernel"])
    want = np.asarray(sd["_conv_stem.weight"]).sum(axis=1).transpose(1, 2, 0)
    np.testing.assert_allclose(stem[..., 0, :], want, rtol=1e-6)

    # merged tree still runs
    out = model.apply(
        {"params": merged["params"], "batch_stats": merged["batch_stats"]},
        jnp.zeros((1, 64, 64, 1), jnp.float32), train=False,
    )
    assert out.shape == (1, 64, 64, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_wrong_model_name_rejected():
    rng = np.random.RandomState(1)
    sd = synth_state_dict("efficientnet-b0", rng)
    with pytest.raises(ValueError):
        convert_efficientnet_encoder(sd, "efficientnet-b3", in_channels=1)
