"""save_features / feature-based test workflow (the upstream cdfsl-benchmark
stage reconstructed from the reference's vestigial feature loader)."""


import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu.core.episode import EpisodeSpec
from mft_tpu.data.feature_store import load_features, sample_feature_episode, save_features


def test_store_roundtrip_per_class_dict(tmp_path):
    rs = np.random.RandomState(0)
    feats = rs.randn(30, 8).astype(np.float32)
    labels = np.repeat(np.arange(3), 10)
    p = str(tmp_path / "novel.npz")
    save_features(p, feats, labels)
    d = load_features(p)
    assert sorted(d) == [0, 1, 2]
    np.testing.assert_array_equal(d[1], feats[10:20])


def test_sample_feature_episode_shapes(tmp_path):
    cl = {c: np.random.RandomState(c).randn(9, 4).astype(np.float32) for c in range(6)}
    rs = np.random.Generator(np.random.Philox(key=1))
    ep, classes = sample_feature_episode(cl, 4, 2, 3, rs)
    assert ep.shape == (4, 5, 4) and len(set(classes.tolist())) == 4


def test_probe_program_learns_separable_features():
    from mft_tpu.cli.test import make_probe_program

    spec = EpisodeSpec(3, 5, 5)
    program = make_probe_program(spec, feat_dim=16, adaptation=True)
    rs = np.random.RandomState(1)
    centers = rs.randn(3, 1, 16) * 3.0
    eps = (centers + rs.randn(3, 10, 16) * 0.2).astype(np.float32)[None]
    acc = program(jnp.asarray(eps), jax.random.split(jax.random.PRNGKey(0), 1))
    assert float(acc[0]) > 90.0


def test_save_and_test_clis_end_to_end(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("MFT_SAVE_DIR_PATH", str(tmp_path))
    from mft_tpu.cli import save_features as sf
    from mft_tpu.cli import test as tst
    from mft_tpu.cli import train as tr

    common = ["--dataset", "synthetic", "--model", "ResNet10", "--image_size", "32",
              "--base_size", "48", "--seed", "10"]
    tr.main(common + ["--method", "baseline", "--num_classes", "10", "--batch_size", "8",
                      "--stop_epoch", "0", "--save_freq", "1"])
    sf.main(common + ["--method", "baseline", "--split", "novel", "--save_iter", "0"])
    feat_file = tmp_path / "features" / "synthetic" / "ResNet10_baseline" / "novel.npz"
    assert feat_file.exists()
    tst.main(common + ["--method", "baseline", "--split", "novel", "--adaptation",
                       "--n_shot", "2", "--iter_num", "4", "--eval_batch", "2"])
    out = capsys.readouterr().out
    assert "Test Acc" in out
