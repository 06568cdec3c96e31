"""End-to-end smoke: train -> checkpoint -> cross-domain eval via the CLIs,
on the synthetic dataset with tiny shapes (the minimum slice of SURVEY.md §7)."""

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


def test_train_baseline_and_episodic_and_eval(save_dir):
    from mft_tpu.cli import finetune as ft
    from mft_tpu.cli import train as tr

    # 1) supervised baseline pretraining, 2 epochs
    tr.main(COMMON + ["--method", "baseline", "--num_classes", "10", "--batch_size", "8",
                      "--stop_epoch", "1", "--save_freq", "1"])
    assert os.path.exists(save_dir / "checkpoints" / "synthetic" / "ResNet10_baseline" / "1.ckpt")

    # 2) episodic GnnNet meta-training, 1 epoch x 2 episodes
    tr.main(COMMON + ["--method", "gnnnet", "--n_shot", "5", "--stop_epoch", "1", "--save_freq", "1",
                      "--episodes_per_epoch", "2"])
    gnn_dir = save_dir / "checkpoints" / "synthetic" / "ResNet10_gnnnet_5way_5shot"
    assert os.path.exists(gnn_dir / "1.ckpt")

    # 3) meta fine-tuning stage on top (FO-MAML inner loop), resuming
    tr.main(COMMON + ["--method", "gnnnet", "--n_shot", "5", "--start_epoch", "2", "--stop_epoch", "2",
                      "--save_freq", "1", "--episodes_per_epoch", "2", "--fine_tune"])
    assert os.path.exists(gnn_dir / "2.ckpt")

    # 4) cross-domain eval of the GNN member with support augmentation
    ft.main(COMMON + ["--method", "gnnnet", "--test_dataset", "synthetic", "--n_shot", "5",
                      "--save_iter", "2", "--iter_num", "4", "--eval_batch", "2",
                      "--gen_examples", "2", "--fine_tune_epoch", "1"])


def test_eval_is_deterministic_given_seed(save_dir, capsys):
    """The reference's seed discipline (SetDataset2 seeding, finetune.py:425):
    two runs with the same seed score identical episodes identically."""
    from mft_tpu.cli import finetune as ft
    from mft_tpu.cli import train as tr

    tr.main(COMMON + ["--method", "gnnnet", "--n_shot", "2", "--stop_epoch", "0", "--save_freq", "1",
                      "--episodes_per_epoch", "1"])
    args = COMMON + ["--method", "gnnnet", "--test_dataset", "synthetic", "--n_shot", "2",
                     "--save_iter", "0", "--iter_num", "2", "--eval_batch", "2",
                     "--gen_examples", "1", "--fine_tune_epoch", "1"]
    ft.main(args)
    out1 = capsys.readouterr().out
    ft.main(args)
    out2 = capsys.readouterr().out
    accs1 = [l for l in out1.splitlines() if l.replace(".", "").isdigit()]
    accs2 = [l for l in out2.splitlines() if l.replace(".", "").isdigit()]
    assert accs1 == accs2 and len(accs1) >= 2
