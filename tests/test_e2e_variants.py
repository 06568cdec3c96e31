"""End-to-end smoke for the remaining driver variants: the ensemble
(--method all), the 50-shot compressed-GNN wrappers, and DampNet."""

import os

import pytest

pytestmark = pytest.mark.slow  # multi-minute CLI drives (cold compiles)

COMMON = [
    "--dataset", "synthetic", "--model", "ResNet10", "--image_size", "32", "--base_size", "48",
    "--seed", "10",
]


@pytest.fixture()
def save_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("MFT_SAVE_DIR_PATH", str(tmp_path))
    return tmp_path


def test_ensemble_method_all(save_dir, capsys):
    from mft_tpu.cli import finetune as ft
    from mft_tpu.cli import train as tr

    # the ensemble loads baseline@400 and gnn@600 checkpoints
    # (finetune.py:455-550); train 0 epochs and rename
    tr.main(COMMON + ["--method", "baseline", "--num_classes", "10", "--batch_size", "8",
                      "--stop_epoch", "0", "--save_freq", "1"])
    tr.main(COMMON + ["--method", "gnnnet", "--n_shot", "2", "--stop_epoch", "0", "--save_freq", "1",
                      "--episodes_per_epoch", "1", "--train_aug"])
    b_dir = save_dir / "checkpoints" / "synthetic" / "ResNet10_baseline"
    g_dir = save_dir / "checkpoints" / "synthetic" / "ResNet10_gnnnet_aug_5way_2shot"
    os.rename(b_dir / "0.ckpt", b_dir / "400.ckpt")
    os.rename(g_dir / "0.ckpt", g_dir / "600.ckpt")
    # NOTE: baseline dir has no _aug suffix unless --train_aug; ensemble
    # resolves with the same flag -> drop train_aug for baseline but the
    # reference appends _aug to both when --train_aug; easiest: rename dir
    os.rename(b_dir, save_dir / "checkpoints" / "synthetic" / "ResNet10_baseline_aug")

    ft.main(COMMON + ["--method", "all", "--test_dataset", "synthetic", "--n_shot", "2",
                      "--train_aug", "--save_iter", "400", "--iter_num", "2", "--eval_batch", "2",
                      "--gen_examples", "1", "--fine_tune_epoch", "1"])
    out = capsys.readouterr().out
    assert "Test Acc" in out


def test_ensemble_aug_dir_quirk(save_dir, capsys):
    """Reference quirk: the method=all dispatch appends '_aug' to the GNN
    checkpoint dir UNCONDITIONALLY (finetune.py:516-523, finetune_50.py:552)
    while the baseline dir is train_aug-gated (:473-480).  Evaluating
    --method all WITHOUT --train_aug must therefore load the GNN member
    from the _aug directory and the baseline from the plain one."""
    from mft_tpu.cli import finetune as ft
    from mft_tpu.cli import train as tr

    tr.main(COMMON + ["--method", "baseline", "--num_classes", "10", "--batch_size", "8",
                      "--stop_epoch", "0", "--save_freq", "1"])
    tr.main(COMMON + ["--method", "gnnnet", "--n_shot", "2", "--stop_epoch", "0", "--save_freq", "1",
                      "--episodes_per_epoch", "1", "--train_aug"])
    b_dir = save_dir / "checkpoints" / "synthetic" / "ResNet10_baseline"
    g_dir = save_dir / "checkpoints" / "synthetic" / "ResNet10_gnnnet_aug_5way_2shot"
    os.rename(b_dir / "0.ckpt", b_dir / "400.ckpt")
    os.rename(g_dir / "0.ckpt", g_dir / "600.ckpt")

    ft.main(COMMON + ["--method", "all", "--test_dataset", "synthetic", "--n_shot", "2",
                      "--save_iter", "400", "--iter_num", "2", "--eval_batch", "2",
                      "--gen_examples", "1", "--fine_tune_epoch", "1"])
    assert "Test Acc" in capsys.readouterr().out


def test_train50_and_finetune50_wrappers(save_dir, capsys):
    """50-shot wrappers select the compressed GNN (eff_support halved)."""
    from mft_tpu.cli import train_50 as tr50

    args = COMMON + ["--method", "gnnnet", "--n_shot", "4", "--stop_epoch", "0",
                     "--episodes_per_epoch", "1"]
    # n_shot=4 overrides the 50 default: wrapper must not clobber explicit flags
    tr50.main(args)
    d = save_dir / "checkpoints" / "synthetic" / "ResNet10_gnnnet_5way_4shot"
    assert os.path.exists(d / "0.ckpt")

    from mft_tpu.methods.gnnnet import GnnNetCfg

    assert GnnNetCfg(n_support=50, support_compress=2).eff_support == 25


def test_train50_finetune_stage(save_dir):
    """train_50 --fine_tune at a REAL n_shot=50: the compressed 130-node
    graph AND the 5-epoch inner schedule (gnnnet_copy.py:177; the 5-shot
    stage uses 15) end to end through the CLI.  The synthetic classes hold
    48 images, so the sampler's tiny-class replacement fallback covers the
    50+16 per-class draw."""
    from mft_tpu.cli import train_50 as tr50

    args = COMMON + ["--method", "gnnnet", "--n_shot", "50",
                     "--episodes_per_epoch", "1"]
    tr50.main(args + ["--stop_epoch", "0"])
    d = save_dir / "checkpoints" / "synthetic" / "ResNet10_gnnnet_5way_50shot"
    assert os.path.exists(d / "0.ckpt")
    tr50.main(args + ["--start_epoch", "1", "--stop_epoch", "1", "--fine_tune"])
    assert os.path.exists(d / "1.ckpt")


def test_finetune50_driver_e2e(save_dir, capsys):
    """The 50-shot eval wrapper end to end at REAL n_shot=50 geometry:
    cli.finetune_50 delegates to the shared driver, which selects the
    compressed 130-node GNN member automatically (support_compress=2 at
    n_shot >= 50) and runs the full bank -> adapt -> compressed-head-score
    composition (reference finetune_50.py)."""
    from mft_tpu.cli import finetune_50 as ft50
    from mft_tpu.cli import train_50 as tr50

    tr50.main(COMMON + ["--method", "gnnnet", "--n_shot", "50",
                        "--episodes_per_epoch", "1", "--stop_epoch", "0"])
    d = save_dir / "checkpoints" / "synthetic" / "ResNet10_gnnnet_5way_50shot"
    assert os.path.exists(d / "0.ckpt")

    ft50.main(COMMON + ["--method", "gnnnet", "--test_dataset", "synthetic",
                        "--save_iter", "0", "--iter_num", "1", "--eval_batch", "1",
                        "--gen_examples", "1", "--fine_tune_epoch", "1"])
    assert "Test Acc" in capsys.readouterr().out


def test_resnet10_fw_trains(save_dir):
    """--model ResNet10_FW: the feature-wise-transformation backbone
    (sampled per-channel affine noise, reference backbone.py:314-350)
    through the episodic training driver."""
    from mft_tpu.cli import train as tr

    tr.main(COMMON + ["--model", "ResNet10_FW", "--method", "gnnnet", "--n_shot", "2",
                      "--stop_epoch", "0", "--save_freq", "1", "--episodes_per_epoch", "1",
                      "--train_aug"])
    d = save_dir / "checkpoints" / "synthetic" / "ResNet10_FW_gnnnet_aug_5way_2shot"
    assert os.path.exists(d / "0.ckpt")


def test_resnet18_train_and_eval(save_dir, capsys):
    """--model ResNet18 (the third entry of the reference's model_dict,
    io_utils.py:7-8) end to end through train + finetune: exercises the
    multi-block final stage's adaptation boundary (adapt_split hands only
    the stage's LAST block to the inner loop — the documented deviation
    from the reference's names[:-9] slice, models/backbone.py docstring)
    in the driver path, not just the oracle tests."""
    from mft_tpu.cli import finetune as ft
    from mft_tpu.cli import train as tr

    common = [f if f != "ResNet10" else "ResNet18" for f in COMMON]
    tr.main(common + ["--method", "gnnnet", "--n_shot", "2", "--stop_epoch", "0",
                      "--save_freq", "1", "--episodes_per_epoch", "1"])
    d = save_dir / "checkpoints" / "synthetic" / "ResNet18_gnnnet_5way_2shot"
    assert os.path.exists(d / "0.ckpt")

    ft.main(common + ["--method", "gnnnet", "--test_dataset", "synthetic", "--n_shot", "2",
                      "--save_iter", "0", "--iter_num", "2", "--eval_batch", "2",
                      "--gen_examples", "1", "--fine_tune_epoch", "1"])
    assert "Test Acc" in capsys.readouterr().out


def test_protonet_freeze_and_minibatch_eval(save_dir, capsys):
    """The remaining eval-driver surfaces: the ProtoNet head
    (finetune.py:441-442,619), --freeze_backbone (finetune.py:123-135), and
    the bit-faithful --bn_mode minibatch path, all through the CLIs."""
    from mft_tpu.cli import finetune as ft
    from mft_tpu.cli import train as tr

    tr.main(COMMON + ["--method", "protonet", "--n_shot", "2", "--stop_epoch", "0",
                      "--save_freq", "1", "--episodes_per_epoch", "1"])
    base = COMMON + ["--method", "protonet", "--test_dataset", "synthetic", "--n_shot", "2",
                     "--save_iter", "0", "--iter_num", "2", "--eval_batch", "2",
                     "--gen_examples", "1", "--fine_tune_epoch", "1"]
    ft.main(base)
    assert "Test Acc" in capsys.readouterr().out

    ft.main(base + ["--freeze_backbone"])
    assert "Test Acc" in capsys.readouterr().out

    ft.main(base + ["--bn_mode", "minibatch"])
    assert "Test Acc" in capsys.readouterr().out


def test_dampnet_train_and_eval(save_dir, capsys):
    from mft_tpu.cli import finetune as ft
    from mft_tpu.cli import train as tr

    tr.main(COMMON + ["--method", "dampnet_full_class", "--n_shot", "2", "--stop_epoch", "1",
                      "--save_freq", "1", "--episodes_per_epoch", "2"])
    d = save_dir / "checkpoints" / "synthetic" / "ResNet10_dampnet_full_class_5way_2shot"
    assert os.path.exists(d / "1.ckpt")

    ft.main(COMMON + ["--method", "dampnet_full_class", "--test_dataset", "synthetic", "--n_shot", "2",
                      "--save_iter", "1", "--iter_num", "2", "--eval_batch", "2",
                      "--gen_examples", "1", "--fine_tune_epoch", "1"])
    out = capsys.readouterr().out
    # the 1-epoch checkpoint predates the prototype-refresh epoch, so the
    # eval driver must run the source-prototype sweep (finetune_50.py:591-622)
    assert "dampnet source prototypes computed" in out
    assert "Test Acc" in out

    # --unsupervised wires the unsup recovery path (reference
    # set_forward_unsup, dampnet_full.py:298-348): recovery conditioned on an
    # external unlabeled dataset's feature statistics
    ft.main(COMMON + ["--method", "dampnet_full_class", "--test_dataset", "synthetic", "--n_shot", "2",
                      "--unsupervised", "synthetic",
                      "--save_iter", "1", "--iter_num", "2", "--eval_batch", "2",
                      "--gen_examples", "1", "--fine_tune_epoch", "1"])
    out = capsys.readouterr().out
    assert "unsup recovery stats" in out and "Test Acc" in out

    # the no-adaptation composition (reference nofinetune ds branch with
    # probe fusion, finetune.py:331-417) stays reachable via --dampnet_eval
    ft.main(COMMON + ["--method", "dampnet_full_class", "--test_dataset", "synthetic", "--n_shot", "2",
                      "--dampnet_eval", "nofinetune",
                      "--save_iter", "1", "--iter_num", "2", "--eval_batch", "2",
                      "--gen_examples", "1", "--fine_tune_epoch", "1"])
    assert "Test Acc" in capsys.readouterr().out


def test_dampnet_prototype_variant_train_and_eval(save_dir, capsys):
    """--method dampnet = the prototype variant (reference methods/dampnet.py,
    dispatchable from train.py:155): rolling store + znorm projections."""
    from mft_tpu.cli import finetune as ft
    from mft_tpu.cli import train as tr

    tr.main(COMMON + ["--method", "dampnet", "--n_shot", "2", "--stop_epoch", "1",
                      "--save_freq", "1", "--episodes_per_epoch", "3"])
    d = save_dir / "checkpoints" / "synthetic" / "ResNet10_dampnet_5way_2shot"
    assert os.path.exists(d / "1.ckpt")
    # the rolling store advanced past its 150 start (3 episodes x 2 epochs)
    import flax.serialization as ser

    with open(d / "1.ckpt", "rb") as f:
        raw = ser.msgpack_restore(f.read())
    assert int(raw["damp_state"]["count"]) == 156
    assert raw["damp_state"]["store_mean"].shape[0] == 20

    ft.main(COMMON + ["--method", "dampnet", "--test_dataset", "synthetic", "--n_shot", "2",
                      "--save_iter", "1", "--iter_num", "2", "--eval_batch", "2",
                      "--gen_examples", "1", "--fine_tune_epoch", "1"])
    out = capsys.readouterr().out
    assert "dampnet source prototypes computed" in out and "Test Acc" in out

    # resume restores damp_state: without the damp_state template key the
    # deserializer silently drops it and the run restarts with count=150 and
    # a zeroed rolling store
    tr.main(COMMON + ["--method", "dampnet", "--n_shot", "2", "--start_epoch", "2",
                      "--stop_epoch", "2", "--save_freq", "1", "--episodes_per_epoch", "3"])
    with open(d / "2.ckpt", "rb") as f:
        raw = ser.msgpack_restore(f.read())
    assert int(raw["damp_state"]["count"]) == 159  # 156 carried over + 3
