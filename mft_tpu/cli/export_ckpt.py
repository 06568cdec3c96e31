"""Checkpoint exporter: ``.ckpt`` (pytree) -> reference ``.tar`` (torch).

The inverse of ``cli/import_ckpt.py``: models trained by this framework
become ``torch.save({'epoch', 'state': model.state_dict()})`` files the
reference loads directly (train.py:196-205, finetune.py:60-64) — so a
reference deployment can consume models trained here, and on a
real-dataset day the reference's own eval code can independently verify
this framework's training (cross-implementation parity evidence).

Example::

    python -m mft_tpu.cli.export_ckpt logs/checkpoints/miniImageNet/ResNet10_gnnnet_aug_5way_5shot/600.ckpt \
        --model ResNet10 --out ref_ckpts/600.tar
"""

from __future__ import annotations

import argparse
import os
import sys

from mft_tpu.models import backbone as bb


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src", nargs="+", help=".ckpt checkpoint file(s)")
    ap.add_argument("--model", default="ResNet10", choices=sorted(bb.MODEL_REGISTRY))
    ap.add_argument("--out", default=None,
                    help="output .tar (single src) or directory (default: alongside src)")
    a = ap.parse_args(argv)

    from flax import serialization

    from mft_tpu.utils.torch_import import export_state_dict, save_torch_tar

    bcfg = bb.MODEL_REGISTRY[a.model]()
    if len(a.src) > 1 and a.out and not os.path.isdir(a.out):
        ap.error("--out must be a directory when exporting multiple checkpoints")
    for src in a.src:
        with open(src, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        sd = export_state_dict(raw["params"], raw["stats"], bcfg)
        epoch = int(raw.get("epoch", 0))
        base = os.path.basename(src).replace(".ckpt", ".tar")
        if a.out is None:
            dst = os.path.join(os.path.dirname(src) or ".", base)
        elif os.path.isdir(a.out):
            dst = os.path.join(a.out, base)
        else:
            dst = a.out
        save_torch_tar(dst, epoch, sd)
        print(f"{src} -> {dst} (epoch {epoch}, {len(sd)} tensors)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
