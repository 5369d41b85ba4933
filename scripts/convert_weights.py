#!/usr/bin/env python
"""Convert a torch backbone checkpoint (.pth state_dict) to a segtpu
orbax-loadable params file.

Replaces the reference's runtime downloads (reference models/resnet.py:292-306)
with an offline step:

    python scripts/convert_weights.py --family resnet --arch resnet50 \
        --style encoding --input resnet50s.pth --output pretrained/resnet50s

Families: resnet (style torchvision|encoding), vgg16 (--bn), densenet,
xception. The output directory can be passed to model-building code that
merges backbone params (flax trees merge by scope name 'backbone').
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", required=True,
                   choices=["resnet", "vgg16", "densenet", "xception"])
    p.add_argument("--arch", default=None,
                   help="resnet18/34/50/101/152 or densenet121/169/201/161")
    p.add_argument("--style", default="torchvision",
                   choices=["torchvision", "encoding"])
    p.add_argument("--bn", action="store_true", help="vgg16: BN variant")
    p.add_argument("--input", required=True, help=".pth state_dict path")
    p.add_argument("--output", required=True, help="output orbax directory")
    args = p.parse_args()

    import torch

    from segtpu.utils import weight_convert as wc

    sd = torch.load(args.input, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    extras = {}
    if args.family == "resnet":
        params, stats = wc.convert_resnet(sd, arch=args.arch or "resnet50",
                                          style=args.style)
    elif args.family == "vgg16":
        params, stats = wc.convert_vgg16(sd, batch_norm=args.bn)
        if not args.bn and "classifier.0.weight" in sd:
            # FCN8's conv6/conv7 from VGG's FC layers (reference
            # models/fcn.py:39-45) — required by segtpu.pretrained for FCN8.
            extras = wc.convert_vgg16_classifier(sd)
    elif args.family == "densenet":
        params, stats = wc.convert_densenet(sd, arch=args.arch or "densenet201")
    else:
        params, stats = wc.convert_xception(sd)

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(args.output)
    tree = {"params": params, "batch_stats": stats}
    if extras:
        tree["extras"] = extras
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    n = sum(getattr(v, "size", 0) for v in
            __import__("flax").traverse_util.flatten_dict(params).values())
    print(f"wrote {path} ({n:,} backbone params)")


if __name__ == "__main__":
    main()
