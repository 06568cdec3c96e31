"""Data layer: manifests, episodic sampler determinism, host pipeline."""

import json
import os

import numpy as np
from PIL import Image

from mft_tpu.core.episode import EpisodeSpec
from mft_tpu.data import manifests as mf
from mft_tpu.data import registry
from mft_tpu.data.pipeline import BatchStream, EpisodeStream, decode_image
from mft_tpu.data.sampler import EpisodicSampler


def _make_image_tree(root, n_classes=4, per_class=6, size=40):
    rs = np.random.RandomState(0)
    for c in range(n_classes):
        d = os.path.join(root, f"class_{c:02d}")
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            arr = (rs.rand(size, size, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"img_{i}.png"))


def test_image_folder_manifest(tmp_path):
    _make_image_tree(tmp_path)
    m = mf.image_folder(str(tmp_path))
    assert m.n_classes == 4 and len(m) == 24
    assert [len(ix) for ix in m.by_class()] == [6, 6, 6, 6]
    # sorted class-dir order (torchvision ImageFolder contract)
    assert m.class_names == [f"class_{c:02d}" for c in range(4)]


def test_json_filelist_manifest(tmp_path):
    meta = {
        "label_names": ["a", "b"],
        "image_names": ["x0.jpg", "x1.jpg", "x2.jpg"],
        "image_labels": [7, 9, 7],  # non-contiguous labels get remapped
    }
    p = tmp_path / "base.json"
    p.write_text(json.dumps(meta))
    m = mf.json_filelist(str(p))
    assert m.n_classes == 2
    np.testing.assert_array_equal(m.labels, [0, 1, 0])


def test_isic_csv_manifest(tmp_path):
    csv = tmp_path / "gt.csv"
    # ISIC_003 pins the reference's exact (labels != 0).argmax semantics
    # (ISIC_few_shot.py:39-40): the FIRST NONZERO column wins, not the max
    csv.write_text(
        "image,MEL,NV,BCC\nISIC_001,0.0,1.0,0.0\nISIC_002,1.0,0.0,0.0\nISIC_003,0.5,0.0,1.0\n"
    )
    m = mf.isic_csv(str(csv), str(tmp_path))
    assert m.n_classes == 3
    np.testing.assert_array_equal(m.labels, [1, 0, 0])
    assert m.items[0].endswith("ISIC_001.jpg")


def test_chestx_csv_manifest(tmp_path):
    csv = tmp_path / "Data_Entry_2017.csv"
    csv.write_text(
        "Image Index,Finding Labels,x\n"
        "a.png,Cardiomegaly,1\n"
        "b.png,Cardiomegaly|Effusion,1\n"  # multi-label rows dropped
        "c.png,Pneumonia,1\n"  # excluded pathology
        "d.png,Effusion,1\n"
    )
    m = mf.chestx_csv(str(csv), str(tmp_path))
    assert len(m) == 2 and m.n_classes == 7
    np.testing.assert_array_equal(m.labels, [1, 2])


def test_caltech256_excludes_clutter(tmp_path):
    """The reference's caltech loader globs '%03d*' for cat in range(0, 257)
    (caltech256_few_shot.py:51-54): 257.clutter is never reached.  The
    faithful builder drops it."""
    for name in ("001.ak47", "002.american-flag", "257.clutter"):
        d = tmp_path / name
        d.mkdir()
        (d / "img.jpg").write_bytes(b"\xff\xd8\xff\xd9")
    m = mf.caltech256(str(tmp_path))
    assert m.n_classes == 2
    assert m.class_names == ["001.ak47", "002.american-flag"]
    assert all("clutter" not in p for p in m.items)


def test_cifar100_mod3_split(tmp_path):
    """The reference's cifar base/val/novel grouping is ``label % 3 ==
    {0, 1, 2}`` (cifar_few_shot.py:27-37,63-71) — NOT the CUB writer's
    %2/%4 rule."""
    import pickle

    data = (np.arange(12 * 3072, dtype=np.int64) % 255).astype(np.uint8).reshape(12, 3072)
    with open(tmp_path / "train", "wb") as f:
        pickle.dump({"data": data, "fine_labels": list(range(12))}, f)
    base = mf.cifar100(str(tmp_path), "base")
    val = mf.cifar100(str(tmp_path), "val")
    novel = mf.cifar100(str(tmp_path), "novel")
    assert base.n_classes == 34 and val.n_classes == 33 and novel.n_classes == 33
    # classes 0,3,6,9 -> base (remapped 0..3); 1,4,7,10 -> val; 2,5,8,11 -> novel
    for m in (base, val, novel):
        assert len(m) == 4
        np.testing.assert_array_equal(m.labels, [0, 1, 2, 3])


def test_synthetic_manifest_deterministic():
    a = mf.synthetic(n_classes=3, per_class=4, seed=1)
    b = mf.synthetic(n_classes=3, per_class=4, seed=1)
    np.testing.assert_array_equal(a.items[0], b.items[0])
    assert len(a) == 12


def test_sampler_deterministic_and_valid():
    m = mf.synthetic(n_classes=8, per_class=10)
    spec = EpisodeSpec(5, 2, 3)
    s1 = EpisodicSampler(m.by_class(), spec, n_episodes=6, seed=10)
    s2 = EpisodicSampler(m.by_class(), spec, n_episodes=6, seed=10)
    for i in range(6):
        e1, e2 = s1.episode(i), s2.episode(i)
        # EpisodicBatchSampler2 contract: fixed seed -> identical episodes
        np.testing.assert_array_equal(e1.classes, e2.classes)
        np.testing.assert_array_equal(e1.items, e2.items)
        assert len(set(e1.classes.tolist())) == 5  # distinct classes
        for k, c in enumerate(e1.classes):
            # items belong to the right class, no repeats within an episode
            assert set(e1.items[k]) <= set(m.by_class()[c].tolist())
            assert len(set(e1.items[k].tolist())) == spec.n_per_class
    # different seed -> different episodes
    s3 = EpisodicSampler(m.by_class(), spec, n_episodes=6, seed=11)
    assert any(not np.array_equal(s1.episode(i).classes, s3.episode(i).classes) for i in range(6))


def test_episode_stream_shapes(tmp_path):
    _make_image_tree(tmp_path, n_classes=5, per_class=8)
    m = mf.image_folder(str(tmp_path))
    spec = EpisodeSpec(3, 2, 2)
    stream = EpisodeStream(m, spec, n_episodes=3, base_size=48, workers=4)
    out = list(stream)
    assert len(out) == 3
    imgs, classes = out[0]
    assert imgs.shape == (3, 4, 48, 48, 3) and imgs.dtype == np.uint8
    assert imgs.min() >= 0 and imgs.max() <= 255
    assert classes.shape == (3,)


def test_episode_stream_releases_decode_pool():
    """Dropping a stream shuts its persistent decode pool down — the drivers
    build one stream per EPOCH, so leaked pools would strand ~16 idle threads
    per epoch over a 600-epoch run."""
    import gc

    m = mf.synthetic(n_classes=4, per_class=6)
    stream = EpisodeStream(m, EpisodeSpec(2, 2, 1), n_episodes=2, base_size=32, workers=4)
    pool = stream._decode_pool
    list(stream)  # exercise the pool
    assert not pool._shutdown
    del stream
    gc.collect()
    assert pool._shutdown


def test_episode_stream_cache_roundtrip(tmp_path):
    """The decoded-episode cache returns byte-identical episodes on re-runs
    (decode skipped entirely) and invalidates on any key change."""
    _make_image_tree(tmp_path / "imgs", n_classes=5, per_class=8)
    m = mf.image_folder(str(tmp_path / "imgs"))
    spec = EpisodeSpec(3, 2, 2)
    cache = str(tmp_path / "epcache")
    kw = dict(base_size=48, workers=4, cache_dir=cache)

    first = list(EpisodeStream(m, spec, n_episodes=3, **kw))
    key_dirs = os.listdir(cache)
    assert len(key_dirs) == 1
    files = sorted(os.listdir(os.path.join(cache, key_dirs[0])))
    assert files == ["ep00000.npy", "ep00001.npy", "ep00002.npy"]

    # cached pass: identical bytes even if the source images vanish
    for f in os.listdir(tmp_path / "imgs" / "class_00"):
        os.remove(tmp_path / "imgs" / "class_00" / f)
    second = list(EpisodeStream(m, spec, n_episodes=3, **kw))
    for (a, ca), (b, cb) in zip(first, second):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(ca, cb)

    # a different seed/resolution keys a different cache dir
    EpisodeStream(m, spec, n_episodes=3, base_size=48, workers=4, seed=99, cache_dir=cache)
    assert len(os.listdir(cache)) == 2


def test_batch_stream(tmp_path):
    _make_image_tree(tmp_path, n_classes=2, per_class=5)
    m = mf.image_folder(str(tmp_path))
    stream = BatchStream(m, batch_size=4, n_batches=2, base_size=32, workers=2)
    batches = list(stream)
    assert len(batches) == 2
    x, y = batches[0]
    assert x.shape == (4, 32, 32, 3) and y.shape == (4,)
    # DataLoader(shuffle=True) semantics: one epoch-wide permutation chunked
    # into batches (no item repeats within a pass), not independent draws
    rs = np.random.Generator(np.random.Philox(key=stream.seed))
    perm = rs.permutation(len(m))
    np.testing.assert_array_equal(batches[0][1], m.labels[perm[:4]])
    np.testing.assert_array_equal(batches[1][1], m.labels[perm[4:8]])


def test_replay_batch_stream(tmp_path):
    """Explicit minibatch replay (cli.train --method baseline
    --episode_manifest): exact files in exact slots, labels via the
    manifest's path->label map, root-relative paths resolved."""
    import pytest

    from mft_tpu.data.pipeline import ReplayBatchStream

    _make_image_tree(tmp_path, n_classes=2, per_class=4)
    m = mf.image_folder(str(tmp_path))
    rel = [os.path.relpath(p, str(tmp_path)) for p in m.items]
    label_of = {r: int(l) for r, l in zip(rel, m.labels)}
    batches = [[rel[0], rel[5]], [rel[3], rel[1]]]
    stream = ReplayBatchStream(batches, label_of, base_size=32, root=str(tmp_path), workers=2)
    got = list(stream)
    assert len(got) == 2
    np.testing.assert_array_equal(got[0][1], [label_of[rel[0]], label_of[rel[5]]])
    np.testing.assert_array_equal(got[1][1], [label_of[rel[3]], label_of[rel[1]]])
    # slot-exact pixels: batch 0 slot 0 is exactly rel[0] decoded
    np.testing.assert_array_equal(got[0][0][0], decode_image(m.items[0], 32))
    with pytest.raises(ValueError, match="ragged"):
        ReplayBatchStream([[rel[0]], [rel[1], rel[2]]], label_of, base_size=32,
                          root=str(tmp_path), workers=2)


def test_batch_stream_tiny_dataset(tmp_path):
    # batch_size > dataset: pad by re-permuting, every item still appears
    _make_image_tree(tmp_path, n_classes=2, per_class=3)
    m = mf.image_folder(str(tmp_path))
    stream = BatchStream(m, batch_size=8, n_batches=2, base_size=32, workers=2)
    for x, y in stream:
        assert x.shape == (8, 32, 32, 3)
        assert set(np.unique(y)) == {0, 1}


def test_decode_inmemory_array():
    arr = (np.random.RandomState(0).rand(20, 30, 3) * 255).astype(np.uint8)
    out = decode_image(arr, 16)
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8


def test_registry_covers_reference_datasets():
    # SURVEY.md §2.4: the 8 per-domain pipelines + synthetic
    for name in ["miniImageNet", "CropDisease", "EuroSAT", "ISIC", "ChestX", "DTD", "cifar100", "caltech256"]:
        e = registry.get(name)
        assert e.train_aug.image_size == 224
    # ChestX: no flips (Chest_few_shot.py:326)
    assert not registry.get("ChestX").eval_aug.hflip
    # CropDisease eval: H+V flips, scale (0.5, 0.9) (CropDisease_few_shot.py:271)
    cd = registry.get("CropDisease").eval_aug
    assert cd.hflip and cd.vflip and cd.scale_min == 0.5
