"""Subprocess bootstrap: run the reference's OWN train.py end to end.

Executes /root/reference/train.py whole-script — argparse -> SetDataManager/
EpisodicBatchSampler loader -> resume from an assigned checkpoint ->
train_loop2 / train_loop_finetune epochs -> MAML_update at stop ->
torch.save (train.py:26-63,112-207) — against a staged miniImageNet
ImageFolder tree and a reference-format ``0.tar`` exported by this
framework, and records:

* the per-episode training losses (by wrapping set_forward_loss /
  set_forward_loss_finetune),
* the EXACT episode composition (which files, which way, which slot, per
  episode) by wrapping the ImageFolder with a recorder — so
  ``mft_tpu.cli.train --episode_manifest`` can replay identical episodes,
* the saved checkpoints' paths (state compared by the orchestrator).

Source patches: none.  Reduced geometry comes from supported knobs — the
episode count via a SetDataManager wrapper forcing ``n_eposide``, and the
per-episode image count via the staged per-class image count (SubDataset's
DataLoader yields min(batch_size, per_class) images, so per_class=8 gives
n_query=3 through the reference's own dynamic n_query recompute,
meta_template.py:81).  num_workers is forced to 0 so the in-process
recorder sees every access (the sampler draws happen in the parent either
way — batch composition is unchanged).

Invoked by tools/run_reference_train_e2e.py; torch-slow (~30-60 s/episode
at 224 px on this 1-core host) — one-time fixture generation, not CI.
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
    ap.add_argument("--mini_root", required=True,
                    help="staged miniImageNet ImageFolder root (64 classes, SetDataset "
                         "hardcodes range(64), miniImageNet_few_shot.py:52)")
    ap.add_argument("--save_dir", required=True,
                    help="reference save_dir; must hold checkpoints/miniImageNet/"
                         "ResNet10_gnnnet_5way_5shot/0.tar for the resume path")
    ap.add_argument("--out", required=True, help="output JSON path")
    ap.add_argument("--method", default="gnnnet", choices=("gnnnet", "baseline"),
                    help="baseline = supervised pretraining (SimpleDataManager batches, "
                         "BaselineTrain.train_loop, train.py:77-109)")
    ap.add_argument("--fine_tune", action="store_true",
                    help="the meta fine-tune stage: train_loop_finetune + MAML_update at stop "
                         "(train.py:49-58)")
    ap.add_argument("--episodes_per_epoch", type=int, default=3)
    ap.add_argument("--start_epoch", type=int, default=1)
    ap.add_argument("--stop_epoch", type=int, default=3,
                    help="reference exclusive bound: epochs start_epoch..stop_epoch-1 run")
    ap.add_argument("--n_shot", type=int, default=5)
    ap.add_argument("--driver", default="train", choices=("train", "train_50"),
                    help="train_50.py dispatches gnnnet at n_shot=50 to the compressed-graph "
                         "gnnnet_copy variant via train_loop50 (train_50.py:40-44,153-157)")
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
    configs.miniImageNet_path = a.mini_root

    import datasets.miniImageNet_few_shot as mi

    mi.miniImageNet_path = a.mini_root  # captured via ``from configs import *``

    # in-process loading so the recorder sees every access (the outer loader
    # hardcodes num_workers=12, miniImageNet_few_shot.py:182)
    _DL = torch.utils.data.DataLoader

    class _InProcessDL(_DL):
        def __init__(self, *args, **kw):
            kw["num_workers"] = 0
            kw.pop("pin_memory", None)
            super().__init__(*args, **kw)

    torch.utils.data.DataLoader = _InProcessDL

    # reduced episode count through the manager's own knob
    _orig_sdm_init = mi.SetDataManager.__init__

    def _small_sdm_init(self, *args, **kw):
        kw["n_eposide"] = a.episodes_per_epoch
        _orig_sdm_init(self, *args, **kw)

    mi.SetDataManager.__init__ = _small_sdm_init

    # ---- access recorder + loss recorder per method ------------------------
    record: list[int] = []
    folders: list = []
    losses: list[float] = []

    if a.method == "baseline":
        # SimpleDataset preloads PIL images at construction, losing paths;
        # its __getitem__ order IS the shuffled batch composition
        # (miniImageNet_few_shot.py:21-45).  ImageFolder.samples preserves
        # the same sorted enumeration order for the index -> path map.
        mini_samples = mi.ImageFolder(a.mini_root).samples
        _orig_get = mi.SimpleDataset.__getitem__

        def _recording_get(self, i):
            item = _orig_get(self, i)
            record.append(int(i))
            return item

        mi.SimpleDataset.__getitem__ = _recording_get

        from methods import baselinetrain as ref_bt

        _orig_fl = ref_bt.BaselineTrain.forward_loss

        def _recording_fl(self, x, y):
            out = _orig_fl(self, x, y)
            losses.append(float(out.item()))
            return out

        ref_bt.BaselineTrain.forward_loss = _recording_fl
    else:
        base_folder = mi.ImageFolder

        class RecordingImageFolder(base_folder):
            def __init__(self, *args, **kw):
                super().__init__(*args, **kw)
                folders.append(self)

            def __getitem__(self, index):
                item = super().__getitem__(index)  # may raise IndexError (enumerate() end probe)
                record.append(int(index))
                return item

        mi.ImageFolder = RecordingImageFolder

        if a.driver == "train_50" and a.n_shot == 50:
            # train_50.py:153-157 dispatches to the compressed-graph variant
            from methods import gnnnet_copy as ref_gnn_mod
        else:
            from methods import gnnnet as ref_gnn_mod

        loss_attr = "set_forward_loss_finetune" if a.fine_tune else "set_forward_loss"
        _orig_loss = getattr(ref_gnn_mod.GnnNet, loss_attr)

        def _recording_loss(self, x, *args, **kw):
            out = _orig_loss(self, x, *args, **kw)
            losses.append(float(out.item()))
            return out

        setattr(ref_gnn_mod.GnnNet, loss_attr, _recording_loss)

    # ---- run the reference driver as __main__ ------------------------------
    src_path = os.path.join(_REFERENCE, f"{a.driver}.py")
    with open(src_path) as f:
        src = f.read()

    sys.argv = [
        f"{a.driver}.py", "--method", a.method, "--dataset", "miniImageNet",
        "--model", "ResNet10", "--n_shot", str(a.n_shot),
        "--train_n_way", "5", "--test_n_way", "5",
        "--start_epoch", str(a.start_epoch), "--stop_epoch", str(a.stop_epoch),
        "--save_freq", "1",
    ] + (["--fine_tune"] if a.fine_tune else [])

    g = {"__name__": "__main__", "__file__": src_path}
    exec(compile(src, src_path, "exec"), g)  # noqa: S102 — running the reference IS the point

    # ---- extract results ----------------------------------------------------
    n_epochs = a.stop_epoch - a.start_epoch

    if a.method == "baseline":
        n_items = len(mini_samples)
        bs = 16  # SimpleDataManager(image_size, batch_size=16), train.py:79
        batches_per_epoch = -(-n_items // bs)
        assert len(losses) == n_epochs * batches_per_epoch, (len(losses), n_epochs, batches_per_epoch)
        assert len(record) == n_epochs * n_items, (len(record), n_epochs, n_items)
        batches = []
        for e in range(n_epochs):
            chunk = record[e * n_items : (e + 1) * n_items]
            assert sorted(chunk) == list(range(n_items)), "shuffle=True must be a permutation"
            for b in range(batches_per_epoch):
                idxs = chunk[b * bs : (b + 1) * bs]
                batches.append([os.path.relpath(mini_samples[i][0], a.mini_root) for i in idxs])
        ckpt_dir = os.path.join(a.save_dir, "checkpoints", "miniImageNet", "ResNet10_baseline")
        out = {
            "method": "baseline",
            "fine_tune": False,
            "start_epoch": a.start_epoch,
            "stop_epoch": a.stop_epoch,
            "batch_size": bs,
            "batches_per_epoch": batches_per_epoch,
            "torch_version": torch.__version__,
            "losses": losses,
            "batches": batches,
            "ckpt_dir": ckpt_dir,
            "saved": sorted(f for f in os.listdir(ckpt_dir) if f.endswith(".tar") and f != "0.tar"),
        }
        os.makedirs(os.path.dirname(os.path.abspath(a.out)), exist_ok=True)
        with open(a.out, "w") as f:
            json.dump(out, f)
        print(f"[ref_train] baseline: {len(losses)} batch losses -> {a.out}")
        return 0

    n_episodes = n_epochs * a.episodes_per_epoch
    assert len(losses) == n_episodes, (len(losses), n_episodes)

    assert len(folders) == 1, f"expected one train ImageFolder, saw {len(folders)}"
    dat = folders[0]
    n_items = len(dat.samples)
    # SetDataset.__init__ enumerates the whole ImageFolder once (indices
    # 0..N-1 in order, miniImageNet_few_shot.py:57) before episode accesses
    assert record[:n_items] == list(range(n_items)), "unexpected construction access order"
    ep_rec = record[n_items:]
    per_class = n_items // len({s[1] for s in dat.samples})
    per_episode = 5 * per_class  # SubDataset yields min(batch_size, per_class) = all images
    assert len(ep_rec) == n_episodes * per_episode, (len(ep_rec), n_episodes, per_episode)

    episodes = []
    for e in range(n_episodes):
        chunk = ep_rec[e * per_episode : (e + 1) * per_episode]
        ways = []
        for c in range(5):
            idxs = chunk[c * per_class : (c + 1) * per_class]
            labels = {dat.samples[i][1] for i in idxs}
            assert len(labels) == 1, f"episode {e} way {c} mixes classes: {labels}"
            ways.append([os.path.relpath(dat.samples[i][0], a.mini_root) for i in idxs])
        episodes.append(ways)

    ckpt_dir = os.path.join(a.save_dir, "checkpoints", "miniImageNet",
                            f"ResNet10_{a.method}_5way_{a.n_shot}shot")
    saved = sorted(
        f for f in os.listdir(ckpt_dir) if f.endswith(".tar") and f != "0.tar"
    )
    out = {
        "method": a.method,
        "driver": a.driver,
        "fine_tune": bool(a.fine_tune),
        "start_epoch": a.start_epoch,
        "stop_epoch": a.stop_epoch,
        "episodes_per_epoch": a.episodes_per_epoch,
        "n_shot": a.n_shot,
        "n_query": per_class - a.n_shot,
        "per_class": per_class,
        "torch_version": torch.__version__,
        "losses": losses,
        "episodes": episodes,
        "ckpt_dir": ckpt_dir,
        "saved": saved,
    }
    os.makedirs(os.path.dirname(os.path.abspath(a.out)), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(out, f)
    print(f"[ref_train] {a.method}{' fine_tune' if a.fine_tune else ''}: "
          f"losses={['%.4f' % x for x in losses]} -> {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
