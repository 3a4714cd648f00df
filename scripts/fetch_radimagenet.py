#!/usr/bin/env python
"""One-shot offline fetch of RadImageNet backbone weights.

The reference downloads ``Lab-Rasool/RadImageNet`` from the HF Hub at model
BUILD time (/root/reference/code/foundation_model.py:72-97) — a network
dependency inside the training path.  dmf_tpu's registry takes local paths
only (models/backbones/registry.py), so run THIS script once on a machine
with network access, then point ``--pretrained-dwi/--pretrained-dce`` (or
``build_backbone(..., pretrained_path=...)``) at the downloaded file.

Usage:
    python scripts/fetch_radimagenet.py [--name resnet50] [--out weights/]

The downloaded ``ResNet50.pt`` is a Lab-Rasool-layout state_dict; the
registry remaps it with ``map_rasool_to_timm_keys`` automatically when
``backbone_str='radimagenet'`` (models/backbones/importers.py:67-81).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

FILES = {"resnet50": "ResNet50.pt", "resnet101": "ResNet101.pt"}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--name", default="resnet50", choices=sorted(FILES))
    ap.add_argument("--out", default="weights",
                    help="directory to place the checkpoint in")
    args = ap.parse_args()

    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        print("huggingface_hub is not installed; install it (network build "
              "host only) or copy the checkpoint manually:\n"
              f"  https://huggingface.co/Lab-Rasool/RadImageNet/{FILES[args.name]}",
              file=sys.stderr)
        return 2

    os.makedirs(args.out, exist_ok=True)
    dest = os.path.join(args.out, FILES[args.name])
    if os.path.exists(dest):
        print(f"already present: {dest}")
        return 0
    path = hf_hub_download(repo_id="Lab-Rasool/RadImageNet",
                           filename=FILES[args.name])
    shutil.copy2(path, dest)
    print(f"fetched {dest} — pass it as pretrained_path / --pretrained-*")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
