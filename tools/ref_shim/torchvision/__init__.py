"""Minimal torchvision stand-in for RUNNING the reference end to end.

This environment has torch but NOT torchvision; the reference's data layer
imports ``torchvision.transforms`` and ``torchvision.datasets.ImageFolder``
(/root/reference/datasets/CropDisease_few_shot.py:7,11, data/datamgr.py).
This package provides exactly the surface those modules use, reproducing
the reference-era torchvision semantics with plain PIL/torch — the same
exact-PIL reproductions that ``tools/gen_pixel_golden.py`` pinned against
recorded reference draws (torchvision's list-size Resize/Scale IS
``img.resize((w, h), BILINEAR)``; CenterCrop's offsets are
``int(round((H-s)/2))``).

Scope: enough to run the reference's ``finetune.py`` whole-script for the
reference-e2e parity fixture (tools/run_reference_e2e.py); it is only ever
importable when that tool puts ``tools/ref_shim`` on ``sys.path``.  The
random transforms (RandomSizedCrop & friends) are implemented with torch
RNG but their draw DISTRIBUTIONS are not bit-matched to any torchvision
release; the committed fixtures therefore run with ``--gen_examples 0``,
where only the deterministic clean chain executes.
"""

from . import datasets, transforms  # noqa: F401

__version__ = "0.0-mft-ref-shim"
