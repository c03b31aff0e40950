#!/usr/bin/env python
"""Convert an efficientnet_pytorch checkpoint to a flax msgpack encoder
file for `efficient_unet` (VERDICT r3 item 8).

The reference's net_factory.py:16 loads ImageNet weights from the
efficient_encoder.py:125-199 URL map; with a locally downloaded .pth:

  python scripts/convert_torch_weights.py \
      --torch_ckpt efficientnet-b3-5fb5a3c3.pth \
      --model_name efficientnet-b3 --in_channels 1 \
      --out model/effib3_imagenet_1ch.msgpack

Then train with it:

  python scripts/train_fully_supervised_2D.py --model efficient_unet \
      --encoder_weights model/effib3_imagenet_1ch.msgpack ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsl4mis_tpu.utils.checkpoint import save_checkpoint
from wsl4mis_tpu.utils.torch_import import convert_efficientnet_encoder

parser = argparse.ArgumentParser()
parser.add_argument("--torch_ckpt", type=str, required=True,
                    help="efficientnet_pytorch state_dict (.pth)")
parser.add_argument("--model_name", type=str, default="efficientnet-b3")
parser.add_argument("--in_channels", type=int, default=1)
parser.add_argument("--out", type=str, required=True,
                    help="output .msgpack path")

if __name__ == "__main__":
    args = parser.parse_args()
    import torch

    sd = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params, stats = convert_efficientnet_encoder(
        sd, args.model_name, args.in_channels
    )
    import numpy as np

    # flax msgpack holds arrays only — record in_channels numerically;
    # the model name is implied by the shapes (strict-shape merge)
    save_checkpoint(args.out, {
        "encoder_params": params,
        "encoder_batch_stats": stats,
        "in_channels": np.int32(args.in_channels),
    })
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    print(f"wrote {args.out}: {n / 1e6:.2f}M encoder params "
          f"({args.model_name}, in_channels={args.in_channels})")
