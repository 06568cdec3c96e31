"""Checkpoint I/O with the reference's epoch-numbered layout.

Reference semantics reproduced (SURVEY.md §5 checkpoint/resume):

* ``torch.save({'epoch': e, 'state': ...}, '<ckpt_dir>/<e>.tar')`` every
  ``save_freq`` epochs and at stop (train.py:46-58) -> here
  ``<ckpt_dir>/<e>.ckpt`` holding a msgpack-serialized pytree
  ``{"epoch", "params", "stats", "opt_state"}`` via flax.serialization,
* resolution helpers: by-epoch (io_utils.py:49-51), latest-numeric
  (io_utils.py:53-62), best-with-fallback (io_utils.py:64-69),
* resume drops the FO-MAML bookkeeping copies — functional purity means we
  never persist them in the first place (train.py:196-205 equivalent).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(ckpt_dir: str, epoch: int, tree: Any) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"{epoch}.ckpt")
    tree = jax.tree.map(np.asarray, tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(tree))
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, like: Any) -> Any:
    """Deserialize into the structure of ``like`` (a template pytree)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(like, f.read())


def get_assigned_file(ckpt_dir: str, num: int) -> str:
    """io_utils.py:49-51."""
    return os.path.join(ckpt_dir, f"{num}.ckpt")


def get_resume_file(ckpt_dir: str) -> Optional[str]:
    """Latest numeric checkpoint (io_utils.py:53-62)."""
    files = glob.glob(os.path.join(ckpt_dir, "*.ckpt"))
    epochs = []
    for f in files:
        m = re.fullmatch(r"(\d+)\.ckpt", os.path.basename(f))
        if m:
            epochs.append(int(m.group(1)))
    if not epochs:
        return None
    return os.path.join(ckpt_dir, f"{max(epochs)}.ckpt")


def get_best_file(ckpt_dir: str) -> Optional[str]:
    """best_model.ckpt if present, else latest (io_utils.py:64-69)."""
    best = os.path.join(ckpt_dir, "best_model.ckpt")
    if os.path.isfile(best):
        return best
    return get_resume_file(ckpt_dir)
