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


def test_eval_loader_rejects_malformed_checkpoint(tmp_path):
    """A checkpoint missing params/stats (or with missing keys inside them)
    must raise instead of silently evaluating template-initialized values
    (VERDICT r2 Weak #5; reference torch load_state_dict fails loudly)."""
    import flax.serialization as ser
    import jax
    import pytest

    from mft_tpu.cli.finetune import _load_backbone_state
    from mft_tpu.models import backbone as bb

    bcfg = bb.ResNetCfg((1, 1), (8, 16), "simple", flatten=True)
    feature, stats = jax.jit(lambda k: bb.init_backbone(k, bcfg))(jax.random.PRNGKey(0))

    # missing "stats" tree entirely
    p1 = tmp_path / "no_stats.ckpt"
    p1.write_bytes(ser.msgpack_serialize({"epoch": 0, "params": ser.to_state_dict({"feature": feature})}))
    with pytest.raises(ValueError, match="missing required tree"):
        _load_backbone_state(str(p1), bcfg)

    # truncated params tree (feature subtree partially absent)
    broken = ser.to_state_dict({"feature": feature})
    del broken["feature"]["stem_conv"]
    p2 = tmp_path / "truncated.ckpt"
    p2.write_bytes(
        ser.msgpack_serialize({"epoch": 0, "params": broken, "stats": ser.to_state_dict(stats)})
    )
    with pytest.raises(ValueError):
        _load_backbone_state(str(p2), bcfg)

    # intact checkpoint still loads
    p3 = tmp_path / "ok.ckpt"
    p3.write_bytes(
        ser.msgpack_serialize(
            {"epoch": 0, "params": ser.to_state_dict({"feature": feature}), "stats": ser.to_state_dict(stats)}
        )
    )
    params, st = _load_backbone_state(str(p3), bcfg)
    np.testing.assert_array_equal(np.asarray(params["feature"]["stem_conv"]), np.asarray(feature["stem_conv"]))


def test_checkpoint_dir_layout(tmp_path):
    from mft_tpu.config import Paths, checkpoint_dir

    p = Paths(save_dir=str(tmp_path))
    d = checkpoint_dir(p, "miniImageNet", "ResNet10", "gnnnet", train_aug=True, n_way=5, n_shot=5)
    # reference layout (train.py:175-180)
    assert d.endswith("checkpoints/miniImageNet/ResNet10_gnnnet_aug_5way_5shot")
    d2 = checkpoint_dir(p, "miniImageNet", "ResNet10", "baseline", train_aug=True)
    assert d2.endswith("checkpoints/miniImageNet/ResNet10_baseline_aug")
