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


# ---------------------------------------------------------------------------
# Numeric forward parity (VERDICT r4 item 6): the converter is proven
# weight-correct, not just shape-correct, by running the SAME state_dict
# through (a) a line-by-line torch reimplementation of the
# efficientnet_pytorch encoder forward (Conv2dStaticSamePadding = TF-style
# asymmetric SAME, BN eps 1e-3, swish, SE on block-input channels,
# id_skip; efficient_encoder.py:83-103 tap points) and (b) the flax
# EfficientNetEncoder after convert_efficientnet_encoder, and comparing
# every stage tap. Eval mode on both sides (running stats, no
# drop-connect), float32 both sides.
# ---------------------------------------------------------------------------


def torch_encoder_taps(sd, model_name: str, x_nchw, in_channels: int = 1):
    """efficientnet_pytorch EfficientNetEncoder.forward in plain torch ops
    (reference math: efficient_encoder.py:36-66 patch_first_conv,
    :83-103 stage taps; efficientnet_pytorch MBConvBlock semantics)."""
    import math

    import torch
    import torch.nn.functional as F

    from wsl4mis_tpu.models.efficientunet import _BASE_BLOCKS, _SCALING

    width, depth, _ = _SCALING[model_name]

    def same_pad(x, k, s):
        ih, iw = x.shape[-2:]
        ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
        pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
        return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))

    def bn(x, pre):
        return F.batch_norm(
            x, sd[f"{pre}.running_mean"], sd[f"{pre}.running_var"],
            sd[f"{pre}.weight"], sd[f"{pre}.bias"], False, 0.0, 1e-3,
        )

    def swish(x):
        return x * torch.sigmoid(x)

    w = sd["_conv_stem.weight"]
    if in_channels == 1:
        w = w.sum(dim=1, keepdim=True)
    h = F.conv2d(same_pad(x_nchw, 3, 2), w, stride=2)
    h = swish(bn(h, "_bn0"))
    feats = [x_nchw, h]
    from wsl4mis_tpu.models.efficientunet import round_repeats

    bi = 0
    for gi, (e, k, s, _fin, _fout, r) in enumerate(_BASE_BLOCKS):
        for j in range(round_repeats(r, depth)):
            pre = f"_blocks.{bi}"
            stride = s if j == 0 else 1
            inp = h
            if e != 1:
                h = swish(
                    bn(F.conv2d(h, sd[f"{pre}._expand_conv.weight"]),
                       f"{pre}._bn0")
                )
            ch = h.shape[1]
            h = F.conv2d(
                same_pad(h, k, stride), sd[f"{pre}._depthwise_conv.weight"],
                stride=stride, groups=ch,
            )
            h = swish(bn(h, f"{pre}._bn1"))
            sq = h.mean(dim=(2, 3), keepdim=True)
            sq = swish(F.conv2d(sq, sd[f"{pre}._se_reduce.weight"],
                                sd[f"{pre}._se_reduce.bias"]))
            sq = torch.sigmoid(F.conv2d(sq, sd[f"{pre}._se_expand.weight"],
                                        sd[f"{pre}._se_expand.bias"]))
            h = h * sq
            h = bn(F.conv2d(h, sd[f"{pre}._project_conv.weight"]),
                   f"{pre}._bn2")
            if stride == 1 and inp.shape[1] == h.shape[1]:
                h = h + inp  # drop-connect is a no-op in eval
            bi += 1
        if gi in {1, 2, 4, 6}:
            feats.append(h)
    return feats


@pytest.mark.parametrize("model_name", ["efficientnet-b0", "efficientnet-b3"])
def test_forward_numeric_parity_vs_torch(model_name):
    import torch

    from wsl4mis_tpu.models.efficientunet import EfficientNetEncoder

    rng = np.random.RandomState(7)
    sd = synth_state_dict(model_name, rng)
    x = rng.rand(2, 64, 64, 1).astype(np.float32)

    with torch.no_grad():
        t_feats = torch_encoder_taps(
            sd, model_name,
            torch.as_tensor(x.transpose(0, 3, 1, 2)), in_channels=1,
        )

    params, stats = convert_efficientnet_encoder(sd, model_name,
                                                 in_channels=1)
    enc = EfficientNetEncoder(model_name=model_name, dtype=jnp.float32)
    j_feats = enc.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False,
    )

    assert len(t_feats) == len(j_feats) == 6
    for i, (tf_, jf) in enumerate(zip(t_feats, j_feats)):
        t_np = tf_.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
        j_np = np.asarray(jf, np.float32)
        assert t_np.shape == j_np.shape, f"tap {i}"
        np.testing.assert_allclose(
            j_np, t_np, rtol=2e-3, atol=2e-4,
            err_msg=f"tap {i} ({model_name})",
        )
