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
