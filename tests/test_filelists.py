"""Filelist writers + round-trip through the json manifest loader."""

import json
import os

import numpy as np
from PIL import Image

from mft_tpu.cli import make_filelists
from mft_tpu.data import filelists, manifests


def _tree(root, n_classes=8, per_class=3):
    rs = np.random.RandomState(0)
    for c in range(n_classes):
        d = os.path.join(root, f"cls{c:03d}")
        os.makedirs(d)
        for i in range(per_class):
            Image.fromarray((rs.rand(8, 8, 3) * 255).astype(np.uint8)).save(os.path.join(d, f"{i}.jpg"))


def test_index_split_writer_and_roundtrip(tmp_path):
    data = tmp_path / "data"
    out = tmp_path / "out"
    os.makedirs(data)
    _tree(str(data))
    make_filelists.main(["--mode", "index_split", "--data_root", str(data), "--out", str(out)])
    # CUB-style residues: base %2==0 -> classes {0,2,4,6}; val %4==1 -> {1,5}; novel %4==3 -> {3,7}
    base = json.load(open(out / "base.json"))
    assert sorted(set(base["image_labels"])) == [0, 2, 4, 6]
    novel = json.load(open(out / "novel.json"))
    assert sorted(set(novel["image_labels"])) == [3, 7]
    m = manifests.json_filelist(str(out / "base.json"))
    assert m.n_classes == 4 and len(m) == 12


def test_csv_split_writer(tmp_path):
    data = tmp_path / "data"
    csvd = tmp_path / "csv"
    out = tmp_path / "out"
    os.makedirs(data)
    os.makedirs(csvd)
    _tree(str(data), n_classes=4, per_class=2)
    for csv_name, classes in [("train", ["cls000", "cls001"]), ("val", ["cls002"]), ("test", ["cls003"])]:
        with open(csvd / f"{csv_name}.csv", "w") as f:
            f.write("filename,label\n")
            for c in classes:
                for i in range(2):
                    f.write(f"{i}.jpg,{c}\n")
    make_filelists.main(["--mode", "csv_split", "--data_root", str(data), "--csv_dir", str(csvd), "--out", str(out)])
    base = json.load(open(out / "base.json"))
    assert len(base["image_names"]) == 4
    novel = json.load(open(out / "novel.json"))
    assert len(novel["image_names"]) == 2


def test_cross_writer(tmp_path):
    mini = tmp_path / "mini"
    cub = tmp_path / "cub"
    out = tmp_path / "out"
    os.makedirs(mini)
    os.makedirs(cub)
    _tree(str(mini), n_classes=3, per_class=2)
    _tree(str(cub), n_classes=8, per_class=2)
    filelists.write_cross_filelists(str(mini), str(cub), str(out))
    base = json.load(open(out / "base.json"))
    assert sorted(set(base["image_labels"])) == [0, 1, 2]  # ALL mini classes
    val = json.load(open(out / "val.json"))
    assert sorted(set(val["image_labels"])) == [1, 5]


def test_cub_filelists_consumed_end_to_end(tmp_path, monkeypatch):
    """make_filelists -> registry CUB entry -> EpisodeStream -> train step:
    the written base/val/novel.json are consumable datasets, not just files
    (reference workflow: write_CUB_filelist.py -> data/datamgr.py JSON
    pipeline -> train.py --dataset CUB)."""
    import jax

    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.data import registry
    from mft_tpu.data.pipeline import EpisodeStream

    data = tmp_path / "cub_images"
    out = tmp_path / "filelists" / "CUB"
    os.makedirs(data)
    _tree(str(data), n_classes=8, per_class=6)
    make_filelists.main(["--mode", "index_split", "--data_root", str(data), "--out", str(out)])

    entry = registry.get("CUB")
    paths = {"CUB": str(out)}
    base = registry.build_manifest(entry, paths, split="base")
    novel = registry.build_manifest(entry, paths, split="novel")
    assert base.n_classes == 4 and novel.n_classes == 2

    spec = EpisodeSpec(n_way=2, n_support=2, n_query=1)
    stream = EpisodeStream(novel, spec, n_episodes=2, base_size=16, seed=0)
    images, classes = next(iter(stream))
    assert images.shape == (2, 3, 16, 16, 3) and images.dtype == np.uint8

    # one episodic train step on the base split proves the full consume path
    from mft_tpu.methods import gnnnet as gn
    from mft_tpu.models import backbone as bb
    from mft_tpu.train import optimizers as opt
    from mft_tpu.train import steps

    bcfg = bb.ResNetCfg((1, 1), (8, 16))
    gcfg = gn.GnnNetCfg(feat_dim=16, n_way=2, n_support=2, proj_dim=8, gnn_nf=4)
    kb, kh = jax.random.split(jax.random.PRNGKey(0))
    feature, stats = bb.init_backbone(kb, bcfg)
    head = gn.init_head(kh, gcfg)
    params = {"feature": feature, "fc": head["fc"], "gnn": head["gnn"]}
    tx = opt.torch_adam(1e-3)
    st = EpisodeStream(base, spec, n_episodes=1, base_size=16, seed=0)
    ep, _ = next(iter(st))
    x = (ep.astype(np.float32) / 255.0)[None]  # [1, n_way, s+q, H, W, 3]
    _, _, _, m = steps.episodic_train_step(
        params, stats, tx.init(params), x, jax.random.PRNGKey(1),
        method="gnnnet", bcfg=bcfg, gcfg=gcfg, spec=spec, tx=tx,
    )
    assert np.isfinite(float(m["loss"]))


def test_cross_filelists_consumed(tmp_path):
    """cross entry: base = miniImageNet classes, novel = CUB subset."""
    from mft_tpu.data import registry

    mini = tmp_path / "mini"
    cub = tmp_path / "cub"
    out = tmp_path / "filelists" / "cross"
    os.makedirs(mini)
    os.makedirs(cub)
    _tree(str(mini), n_classes=3, per_class=2)
    _tree(str(cub), n_classes=8, per_class=2)
    filelists.write_cross_filelists(str(mini), str(cub), str(out))
    paths = {"cross": str(out)}
    entry = registry.get("cross")
    base = registry.build_manifest(entry, paths, split="base")
    novel = registry.build_manifest(entry, paths, split="novel")
    assert base.n_classes == 3 and novel.n_classes == 2
    # default (train) builder is the base split
    assert len(registry.build_manifest(entry, paths)) == len(base)


def test_backbone_registry_variants():
    from mft_tpu.models import backbone as bb

    # reference backbone.py:512-527 factories all constructible
    assert set(bb.MODEL_REGISTRY) == {
        "ResNet10", "ResNet10_FW", "ResNet18", "ResNet34", "ResNet8", "ResNet_3", "ResNet_fin"
    }
    assert bb.resnet_fin().stem is False and bb.resnet_fin().stem_in == 256


def test_utils_parity():
    from mft_tpu.utils.metrics import one_hot, sparsity

    oh = one_hot([0, 2, 1], 3)
    np.testing.assert_array_equal(oh, [[1, 0, 0], [0, 0, 1], [0, 1, 0]])
    s = sparsity({0: [np.array([1.0, 0.0]), np.array([1.0, 1.0])], 1: [np.array([0.0, 0.0])]})
    assert abs(s - (1.5 + 0.0) / 2) < 1e-6
