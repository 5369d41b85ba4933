#!/usr/bin/env python
"""Export a trained segtpu checkpoint as a self-contained serving artifact.

    python scripts/export_model.py --model saved/PSPNet/<ts>/best_model \
        --output exported/pspnet --batch 1 --hw 1025,2049

Produces ``model.stablehlo`` (jax.export serialization — weights embedded,
lowered for CPU+TPU) and ``serving.json`` (input signature, palette,
normalization). Serve with only jax installed:

    from segtpu.serving import load_serving_artifact   # or inline the
    call, meta = load_serving_artifact("exported/pspnet")  # 10-line loader
    preds, conf = call(uint8_batch)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model", required=True,
                   help="checkpoint directory (orbax) with meta.json")
    p.add_argument("-o", "--output", required=True, help="output directory")
    p.add_argument("-b", "--batch", type=int, default=1)
    p.add_argument("--hw", default="513,513",
                   help="input H,W the program is compiled for")
    p.add_argument("--platforms", default="cpu,tpu")
    args = p.parse_args()

    from segtpu.serving import export_checkpoint

    hw = tuple(int(v) for v in args.hw.split(","))
    out = export_checkpoint(args.model, args.output, batch=args.batch,
                            hw=hw, platforms=args.platforms.split(","))
    print(f"exported to {out}")


if __name__ == "__main__":
    main()
