"""Subprocess bootstrap: run the reference's OWN finetune.py end to end.

Executes /root/reference/finetune.py whole-script — argparse -> checkpoint
loading -> SetDataset2/EpisodicBatchSampler2 loader -> per-episode transfer
fine-tune -> printed CI (finetune.py:424-682) — against a staged on-disk
ImageFolder tree and reference-format ``.tar`` checkpoints exported by this
framework, and records:

* the per-episode accuracies and the final mean/CI,
* the EXACT episode composition (which files, in which support/query slot,
  for every episode) by wrapping the shim ImageFolder with a recorder —
  so ``mft_tpu.cli.finetune --episode_manifest`` can replay the identical
  episodes through this framework's driver.

The only modification to the reference source is the episode count
(``iter_num = 600`` -> the requested N; image geometry, n_query=15, and
every algorithmic constant run as shipped).  torch ``.cuda()`` calls are
neutralized exactly as tools/gen_golden_reference.py does (no GPU here),
and the missing torchvision dependency is satisfied by tools/ref_shim
(clean-chain pixel semantics pinned by tests/fixtures/pixel_golden.npz).

This file is invoked by tools/run_reference_e2e.py; it is torch-slow
(~1-2 min/episode on this 1-core host) and meant for one-time fixture
generation, not CI.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REFERENCE = os.environ.get("MFT_REFERENCE_DIR", "/root/reference")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data_root", required=True,
                    help="staged dataset root: <data_root>/dataset/train/<class>/*.jpg")
    ap.add_argument("--save_dir", required=True,
                    help="reference save_dir holding checkpoints/miniImageNet/*.tar")
    ap.add_argument("--out", required=True, help="output JSON path")
    ap.add_argument("--method", default="all")
    ap.add_argument("--driver", default="finetune", choices=("finetune", "finetune_50"),
                    help="which reference driver script to execute.  finetune_50.py is the "
                         "one whose dampnet dispatch WORKS upstream (the 5-shot finetune.py "
                         "dampnet path crashes — see README quirks), so dampnet tiers run "
                         "through it")
    ap.add_argument("--mini_root", default=None,
                    help="staged miniImageNet ImageFolder root for the dampnet source sweep "
                         "(finetune_50.py:591-622); its shuffled access order is recorded as "
                         "sweep_order so the mft_tpu side can replay the exact per-batch BN "
                         "composition")
    ap.add_argument("--iter_num", type=int, default=8)
    ap.add_argument("--n_shot", type=int, default=5)
    ap.add_argument("--fine_tune_epoch", type=int, default=1)
    ap.add_argument("--gen_examples", type=int, default=0)
    ap.add_argument("--save_iter", type=int, default=600)
    ap.add_argument("--train_aug", action="store_true")
    a = ap.parse_args(argv)

    sys.path.insert(0, os.path.join(_HERE, "ref_shim"))  # torchvision stand-in
    sys.path.insert(0, _REFERENCE)

    import numpy as np
    import torch
    import torch.nn as nn

    # no GPU in this harness: same neutralization as tools/gen_golden_reference.py
    torch.Tensor.cuda = lambda self, *args, **kw: self
    nn.Module.cuda = lambda self, *args, **kw: self

    import configs

    configs.save_dir = a.save_dir
    configs.CropDisease_path = a.data_root

    import datasets.CropDisease_few_shot as cd

    # the dataset module captured the path via ``from configs import *``
    cd.CropDisease_path = a.data_root

    sweep_order: list[str] = []
    if a.mini_root:
        configs.miniImageNet_path = a.mini_root

        import datasets.miniImageNet_few_shot as mi

        mi.miniImageNet_path = a.mini_root

        # The dampnet sweep loader hardcodes num_workers=4
        # (finetune_50.py:592 + miniImageNet_few_shot.py:158): worker
        # subprocesses would hide __getitem__ calls from the in-process
        # recorder.  Forcing num_workers=0 records them without changing
        # the data: the shuffle permutation is drawn by the sampler in the
        # parent process either way, so batch composition is identical.
        _DL = torch.utils.data.DataLoader

        class _InProcessDL(_DL):
            def __init__(self, *args, **kw):
                kw["num_workers"] = 0
                kw.pop("pin_memory", None)
                super().__init__(*args, **kw)

        torch.utils.data.DataLoader = _InProcessDL

        # index -> path map in SimpleDataset's enumeration order (it
        # preloads PIL images, losing paths; ImageFolder.samples preserves
        # the same sorted order, miniImageNet_few_shot.py:31-35)
        mini_samples = mi.ImageFolder(a.mini_root).samples
        _orig_get = mi.SimpleDataset.__getitem__

        def _recording_get(self, i):
            item = _orig_get(self, i)
            sweep_order.append(os.path.relpath(mini_samples[i][0], a.mini_root))
            return item

        mi.SimpleDataset.__getitem__ = _recording_get

    # ---- episode recorder: every ImageFolder access, in order -------------
    record: list[int] = []
    folders: list = []
    base_folder = cd.ImageFolder

    class RecordingImageFolder(base_folder):
        def __init__(self, *args, **kw):
            super().__init__(*args, **kw)
            folders.append(self)

        def __getitem__(self, index):
            item = super().__getitem__(index)  # may raise IndexError (enumerate() end probe)
            record.append(int(index))
            return item

    cd.ImageFolder = RecordingImageFolder

    # ---- run the reference driver as __main__ ------------------------------
    src_path = os.path.join(_REFERENCE, f"{a.driver}.py")
    with open(src_path) as f:
        src = f.read()
    n_sites = src.count("iter_num = 600")
    assert n_sites == 2, f"expected 2 iter_num sites in {a.driver}.py, found {n_sites}"
    src = src.replace("iter_num = 600", f"iter_num = {a.iter_num}")

    sys.argv = [
        f"{a.driver}.py", "--method", a.method, "--test_dataset", "CropDisease",
        "--n_shot", str(a.n_shot), "--save_iter", str(a.save_iter),
        "--fine_tune_epoch", str(a.fine_tune_epoch),
        "--gen_examples", str(a.gen_examples),
    ] + (["--train_aug"] if a.train_aug else [])

    g = {"__name__": "__main__", "__file__": src_path}
    exec(compile(src, src_path, "exec"), g)  # noqa: S102 — running the reference IS the point

    # ---- extract results ----------------------------------------------------
    acc_all = [float(x) for x in np.asarray(g["acc_all"]).tolist()]
    assert len(acc_all) == a.iter_num, (len(acc_all), a.iter_num)

    assert len(folders) == 1, f"expected one eval ImageFolder, saw {len(folders)}"
    dat = folders[0]
    n_items = len(dat)
    per_episode = 5 * (a.n_shot + 15)
    # SetDataset2.__init__ enumerates the whole dataset once (indices 0..N-1
    # in order) to build sub_meta; episode accesses follow, class-major then
    # position (nested per-class DataLoader batches, num_workers=0)
    assert record[:n_items] == list(range(n_items)), "unexpected construction access order"
    ep_rec = record[n_items:]
    assert len(ep_rec) == a.iter_num * per_episode, (len(ep_rec), a.iter_num, per_episode)

    episodes = []
    for e in range(a.iter_num):
        chunk = ep_rec[e * per_episode : (e + 1) * per_episode]
        ways = []
        for c in range(5):
            idxs = chunk[c * (a.n_shot + 15) : (c + 1) * (a.n_shot + 15)]
            labels = {dat.samples[i][1] for i in idxs}
            assert len(labels) == 1, f"episode {e} way {c} mixes classes: {labels}"
            ways.append([os.path.relpath(dat.samples[i][0], a.data_root) for i in idxs])
        episodes.append(ways)

    acc = np.asarray(acc_all)
    out = {
        "method": a.method,
        "driver": a.driver,
        "iter_num": a.iter_num,
        "n_shot": a.n_shot,
        "n_query": 15,
        "fine_tune_epoch": a.fine_tune_epoch,
        "gen_examples": a.gen_examples,
        "save_iter": a.save_iter,
        "train_aug": bool(a.train_aug),
        "torch_version": torch.__version__,
        "acc_all": acc_all,
        "acc_mean": float(acc.mean()),
        "ci95": float(1.96 * acc.std() / np.sqrt(len(acc))),
        "episodes": episodes,
    }
    if a.mini_root:
        # one full pass over the staged miniImageNet tree, in the shuffled
        # order the reference's sweep actually used (chunks of 64 = the
        # train-mode BN batches its prototype features were computed with)
        out["sweep_order"] = sweep_order
    os.makedirs(os.path.dirname(os.path.abspath(a.out)), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(out, f)
    print(f"[ref_e2e] {a.method}: mean={out['acc_mean']:.2f}% ci={out['ci95']:.2f} -> {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
