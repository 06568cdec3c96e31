"""Checkpoint layout + resolution semantics (reference io_utils parity)."""

import os

import jax.numpy as jnp
import numpy as np

from mft_tpu.utils import checkpoint as ck


def _tree(v=0.0):
    return {"epoch": 3, "params": {"w": jnp.full((4,), v), "nested": [{"b": jnp.ones((2, 2)) * v}]}}


def test_save_load_roundtrip(tmp_path):
    d = str(tmp_path / "ckpts")
    t = _tree(2.5)
    path = ck.save_checkpoint(d, 50, t)
    assert path.endswith("50.ckpt")
    loaded = ck.load_checkpoint(path, _tree(0.0))
    np.testing.assert_array_equal(np.asarray(loaded["params"]["w"]), np.full((4,), 2.5))
    np.testing.assert_array_equal(np.asarray(loaded["params"]["nested"][0]["b"]), np.ones((2, 2)) * 2.5)
    assert loaded["epoch"] == 3


def test_resolution_helpers(tmp_path):
    d = str(tmp_path)
    assert ck.get_resume_file(d) is None
    for e in (10, 50, 400):
        ck.save_checkpoint(d, e, _tree(float(e)))
    # latest-numeric (io_utils.py:53-62)
    assert ck.get_resume_file(d).endswith("400.ckpt")
    # by-epoch (io_utils.py:49-51)
    assert ck.get_assigned_file(d, 50).endswith("50.ckpt")
    # best falls back to latest (io_utils.py:64-69)
    assert ck.get_best_file(d).endswith("400.ckpt")
    ck.save_checkpoint(d, 0, _tree(0.0))
    os.rename(os.path.join(d, "0.ckpt"), os.path.join(d, "best_model.ckpt"))
    assert ck.get_best_file(d).endswith("best_model.ckpt")


def test_checkpoint_dir_layout(tmp_path):
    from mft_tpu.config import Paths, checkpoint_dir

    p = Paths(save_dir=str(tmp_path))
    d = checkpoint_dir(p, "miniImageNet", "ResNet10", "gnnnet", train_aug=True, n_way=5, n_shot=5)
    # reference layout (train.py:175-180)
    assert d.endswith("checkpoints/miniImageNet/ResNet10_gnnnet_aug_5way_5shot")
    d2 = checkpoint_dir(p, "miniImageNet", "ResNet10", "baseline", train_aug=True)
    assert d2.endswith("checkpoints/miniImageNet/ResNet10_baseline_aug")
