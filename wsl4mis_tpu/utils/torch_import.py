"""Torch-weight import for the EfficientNet encoder.

The reference loads ImageNet-pretrained encoder weights by default
(net_factory.py:16 -> Effi_UNet(..., encoder_weights='imagenet');
efficient_encoder.py:125-199 maps encoder names to efficientnet_pytorch
checkpoint URLs). This environment has no egress, so `efficient_unet`
trains from scratch — but a user with a locally downloaded
efficientnet_pytorch `state_dict` (the url_map .pth files) can recover the
capability by converting it to the flax param tree with this module
(VERDICT r3 item 8).

Key-naming contract (efficientnet_pytorch):
  _conv_stem.weight, _bn0.*                      stem
  _blocks.{i}._expand_conv.weight, _bn0.*        when expand_ratio != 1
  _blocks.{i}._depthwise_conv.weight, _bn1.*
  _blocks.{i}._se_reduce|_se_expand.{weight,bias}
  _blocks.{i}._project_conv.weight, _bn2.*
  _conv_head.weight, _bn1.*, _fc.*               unused by the encoder's
                                                 feature taps — ignored
                                                 (the reference pops _fc,
                                                 efficient_encoder.py:105)

The first conv is patched for non-RGB inputs exactly as the reference's
patch_first_conv (efficient_encoder.py:36-66): in_channels==1 sums the RGB
filters, ==2 scales the first two by 3/2, >3 keeps the random init.
"""

from __future__ import annotations

import numpy as np

from wsl4mis_tpu.models.efficientunet import (
    _BASE_BLOCKS,
    _SCALING,
    round_filters,
    round_repeats,
)


def _conv_w(w) -> np.ndarray:
    """torch (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.ascontiguousarray(np.asarray(w, np.float32).transpose(2, 3, 1, 0))


def _bn(sd, prefix):
    return (
        {
            "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
        },
        {
            "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
            "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
        },
    )


def convert_efficientnet_encoder(state_dict, model_name: str,
                                 in_channels: int = 1):
    """Convert an efficientnet_pytorch state_dict to the flax
    `EfficientNetEncoder` subtrees.

    Returns (params, batch_stats): dicts shaped exactly like the
    corresponding subtrees of `EffiUNet.init(...)["params"/"batch_stats"]
    ["EfficientNetEncoder_0"]`. Raises KeyError on missing keys and
    ValueError on block-count mismatch (wrong model_name for the file).
    """
    sd = {
        k: np.asarray(v, np.float32)
        for k, v in state_dict.items()
        if not k.endswith("num_batches_tracked")
    }
    width, depth, _ = _SCALING[model_name]
    n_blocks = sum(round_repeats(r, depth) for *_a, r in _BASE_BLOCKS)
    got = {
        int(k.split(".")[1]) for k in sd if k.startswith("_blocks.")
    }
    if got and max(got) + 1 != n_blocks:
        raise ValueError(
            f"state_dict has {max(got) + 1} blocks but {model_name} "
            f"defines {n_blocks} — wrong model_name for this file?"
        )

    params: dict = {}
    stats: dict = {}

    # stem, patched for in_channels (efficient_encoder.py:36-66)
    w = np.asarray(sd["_conv_stem.weight"], np.float32)  # (O, 3, 3, 3)
    if in_channels == 1:
        w = w.sum(axis=1, keepdims=True)
    elif in_channels == 2:
        w = w[:, :2] * (3.0 / 2.0)
    elif in_channels != 3:
        w = None  # reference re-inits randomly; keep the flax init
    if w is not None:
        params["Conv_0"] = {"kernel": _conv_w(w)}
    p, s = _bn(sd, "_bn0")
    params["BatchNorm_0"] = p
    stats["BatchNorm_0"] = s

    bi = 0
    for gi, (e, _k, _s, _fin, _fout, r) in enumerate(_BASE_BLOCKS):
        for _j in range(round_repeats(r, depth)):
            pre = f"_blocks.{bi}"
            bp: dict = {}
            bs: dict = {}
            ci = 0  # flax auto-number within MBConv
            ni = 0
            if e != 1:
                bp[f"Conv_{ci}"] = {
                    "kernel": _conv_w(sd[f"{pre}._expand_conv.weight"])
                }
                ci += 1
                p, s = _bn(sd, f"{pre}._bn0")
                bp[f"BatchNorm_{ni}"] = p
                bs[f"BatchNorm_{ni}"] = s
                ni += 1
            bp[f"Conv_{ci}"] = {
                "kernel": _conv_w(sd[f"{pre}._depthwise_conv.weight"])
            }
            ci += 1
            p, s = _bn(sd, f"{pre}._bn1")
            bp[f"BatchNorm_{ni}"] = p
            bs[f"BatchNorm_{ni}"] = s
            ni += 1
            for se in ("_se_reduce", "_se_expand"):
                bp[f"Conv_{ci}"] = {
                    "kernel": _conv_w(sd[f"{pre}.{se}.weight"]),
                    "bias": np.asarray(sd[f"{pre}.{se}.bias"], np.float32),
                }
                ci += 1
            bp[f"Conv_{ci}"] = {
                "kernel": _conv_w(sd[f"{pre}._project_conv.weight"])
            }
            p, s = _bn(sd, f"{pre}._bn2")
            bp[f"BatchNorm_{ni}"] = p
            bs[f"BatchNorm_{ni}"] = s
            params[f"MBConv_{bi}"] = bp
            stats[f"MBConv_{bi}"] = bs
            bi += 1

    # sanity: scaled stem width must match the file
    stem_out = params["BatchNorm_0"]["scale"].shape[0]
    want = round_filters(32, width)
    if stem_out != want:
        raise ValueError(
            f"stem width {stem_out} != {want} expected for {model_name}"
        )
    return params, stats


def load_pretrained_encoder(variables, state_dict, model_name: str,
                            in_channels: int = 1):
    """Return a copy of an EffiUNet variables dict with the encoder
    subtree replaced by the converted torch weights.

    `variables` is the dict from `EffiUNet.init(...)` (or the checkpoint
    equivalent); the encoder scope is auto-located. Every converted leaf
    must match the existing leaf's shape or ValueError is raised — the
    round-trip guarantee tests/test_torch_import.py pins.
    """
    params, stats = convert_efficientnet_encoder(
        state_dict, model_name, in_channels
    )
    return merge_encoder_subtrees(variables, params, stats)


def merge_encoder_subtrees(variables, params, stats):
    """Strict-shape merge of converted encoder (params, batch_stats)
    subtrees into an EffiUNet variables dict (scope auto-located)."""
    scope = next(
        k for k in variables["params"] if k.startswith("EfficientNetEncoder")
    )

    def merge(dst, src, path):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise ValueError(f"no target for converted {path}/{k}")
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{path}/{k}")
            else:
                cur = np.asarray(dst[k])
                if cur.shape != v.shape:
                    raise ValueError(
                        f"{path}/{k}: converted shape {v.shape} != "
                        f"model shape {cur.shape}"
                    )
                out[k] = v.astype(cur.dtype)
        return out

    new = dict(variables)
    new["params"] = dict(variables["params"])
    new["params"][scope] = merge(
        variables["params"][scope], params, scope
    )
    if "batch_stats" in variables:
        new["batch_stats"] = dict(variables["batch_stats"])
        new["batch_stats"][scope] = merge(
            variables["batch_stats"][scope], stats, scope
        )
    return new
