#!/usr/bin/env python
"""Convert a reference torch checkpoint (best_network.pth) into an orbax
checkpoint directory loadable via ``checkpoint_path`` / ``lidf_ckpt_path``.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/import_torch_ckpt.py \
      --pth /path/to/best_network.pth --out logs/imported_lidf/ckpt [--stage lidf]

The stage is auto-detected from the checkpoint keys (stage-2 refine ckpts
carry ``pnet_model_refine``, train_refine.py:363-368).
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True, help="reference .pth checkpoint")
    ap.add_argument("--out", required=True, help="output orbax ckpt dir")
    ap.add_argument("--stage", default="auto", choices=["auto", "lidf", "refine"])
    args = ap.parse_args()

    from implicit_depth_tpu.utils.torch_import import import_torch_checkpoint
    stage = import_torch_checkpoint(args.pth, args.out, args.stage)
    print(f"imported {stage} checkpoint from {args.pth} -> {args.out}")


if __name__ == "__main__":
    main()
