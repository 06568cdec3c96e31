"""tools/parity_oneshot.py: the day-one real-data parity harness.

The full run is exercised by ``--smoke`` manually (it drives the same CLI
mains the e2e suite covers); here we pin the cheap contracts: the stage
check reports missing datasets with actionable pointers and exits 2, and
reports staged datasets and exits 0.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import parity_oneshot  # noqa: E402


def test_status_missing_datasets_exits_2(tmp_path, monkeypatch, capsys):
    # point every dataset at an empty dir: all missing
    for name in ("MINIIMAGENET", "CROPDISEASE", "EUROSAT", "ISIC", "CHESTX"):
        monkeypatch.setenv(f"MFT_{name}_PATH", str(tmp_path / name.lower()))
    rc = parity_oneshot.main(["--status"])
    out = capsys.readouterr().out
    assert rc == 2
    assert "[MISSING] miniImageNet" in out
    assert "MFT_CROPDISEASE_PATH" in out
    assert "expected layout" in out


def test_status_synthetic_staged_exits_0(capsys, monkeypatch):
    # main() setdefaults MFT_SAVE_DIR_PATH etc. for the smoke run; pin them
    # via monkeypatch so the mutation is rolled back after the test instead
    # of leaking into the rest of the session
    monkeypatch.setenv("MFT_SAVE_DIR_PATH", "/tmp/mft_parity_smoke/logs")
    rc = parity_oneshot.main(["--status", "--smoke"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "[staged] synthetic" in out


@pytest.mark.slow
def test_import_reference_ckpts_stage(tmp_path, monkeypatch):
    """--import_ckpts: a reference save_dir of trained .tar checkpoints
    lands in this framework's layout, ready for the eval stage."""
    torch = pytest.importorskip("torch")
    import jax
    import numpy as np

    from mft_tpu import config as cfg_mod
    from mft_tpu.methods.baseline import init_classifier
    from mft_tpu.methods import gnnnet as gn
    from mft_tpu.models import backbone as bb
    from mft_tpu.models.backbone import ResNetCfg
    from mft_tpu.utils.torch_import import export_state_dict, save_torch_tar

    tiny = ResNetCfg((1, 1, 1, 1), (8, 12, 14, 16), "simple")
    ip, istats = bb.init_backbone(jax.random.PRNGKey(0), tiny)
    ip, istats = jax.tree.map(np.asarray, (ip, istats))
    head = jax.tree.map(np.asarray, gn.init_head(jax.random.PRNGKey(1),
                                                 gn.GnnNetCfg(feat_dim=16, n_way=5, n_support=5)))
    clf = jax.tree.map(np.asarray, init_classifier(jax.random.PRNGKey(2), 16, 64))

    # reference-layout tree (note the reference's 'miniImagenet' casing)
    ref = tmp_path / "ref_logs"
    bdir = ref / "checkpoints" / "miniImagenet" / "ResNet10_baseline_aug"
    gdir = ref / "checkpoints" / "miniImagenet" / "ResNet10_gnnnet_aug_5way_5shot"
    bdir.mkdir(parents=True)
    gdir.mkdir(parents=True)
    save_torch_tar(str(bdir / "400.tar"), 400,
                   export_state_dict({"feature": ip, "classifier": clf}, istats, tiny))
    gsd = export_state_dict({"feature": ip, "fc": head["fc"], "gnn": head["gnn"]}, istats, tiny)
    save_torch_tar(str(gdir / "400.tar"), 400, gsd)
    save_torch_tar(str(gdir / "600.tar"), 600, gsd)

    monkeypatch.setenv("MFT_SAVE_DIR_PATH", str(tmp_path / "logs"))
    paths = cfg_mod.Paths.load()
    assert parity_oneshot._import_reference_ckpts(str(ref), paths, "miniImageNet", need50=False)
    out_b = cfg_mod.checkpoint_dir(paths, "miniImageNet", "ResNet10", "baseline", train_aug=True)
    out_g = cfg_mod.checkpoint_dir(paths, "miniImageNet", "ResNet10", "gnnnet",
                                   train_aug=True, n_way=5, n_shot=5)
    assert os.path.exists(os.path.join(out_b, "400.ckpt"))
    assert os.path.exists(os.path.join(out_g, "400.ckpt"))
    assert os.path.exists(os.path.join(out_g, "600.ckpt"))
    # missing 50-shot dir is reported, not silently skipped
    assert not parity_oneshot._import_reference_ckpts(str(ref), paths, "miniImageNet", need50=True)


def test_published_targets_cite_reference():
    # the comparison targets are the reference README's published numbers
    assert parity_oneshot.PUBLISHED[("CropDisease", 5)] == (98.78, 0.19)
    assert parity_oneshot.PUBLISHED_AVERAGE == 73.78
