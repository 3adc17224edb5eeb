"""Convert torchvision VGG-19 weights to the nfs_tpu .npz layout.

The reference loaded a frozen pretrained TF graph (SURVEY.md §2 "Frozen
loss-CNN plumbing"); our rebuild standardizes on VGG-19 (BASELINE.json)
with a file-based loader. This environment has no network and no cached
torchvision weights (SURVEY.md §7 step-3 risk), so this converter is the
documented path for users who have them:

    python scripts/convert_vgg_weights.py \\
        --src ~/.cache/torch/hub/checkpoints/vgg19-dcbb9e9d.pth \\
        --out vgg19_imagenet.npz

then pass --vgg_weights vgg19_imagenet.npz to the stylize CLI (or
LossConfig.vgg_weights). Layout: '{conv_name}/w' as (3, 3, Cin, Cout)
HWIO float32 and '{conv_name}/b' as (Cout,). Preprocessing assumption:
RGB in [0,1], ImageNet mean/std (torch convention) — matches
nfs_tpu.features.vgg.preprocess.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# torchvision vgg19.features indices of the 16 convs, in order
_TV_CONV_INDICES = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30,
                    32, 34]
_NAMES = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3", "conv3_4",
    "conv4_1", "conv4_2", "conv4_3", "conv4_4",
    "conv5_1", "conv5_2", "conv5_3", "conv5_4",
]


def convert(src: str, out: str) -> None:
    import torch

    state = torch.load(src, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    flat = {}
    for idx, name in zip(_TV_CONV_INDICES, _NAMES):
        w = state[f"features.{idx}.weight"].numpy()  # OIHW
        b = state[f"features.{idx}.bias"].numpy()
        flat[f"{name}/w"] = np.ascontiguousarray(
            w.transpose(2, 3, 1, 0)).astype(np.float32)  # -> HWIO
        flat[f"{name}/b"] = b.astype(np.float32)
    np.savez(out, **flat)
    print(f"wrote {out}: {len(flat)} arrays")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True,
                   help="torchvision vgg19 .pth state dict")
    p.add_argument("--out", default="vgg19_imagenet.npz")
    args = p.parse_args()
    convert(args.src, args.out)


if __name__ == "__main__":
    main()
