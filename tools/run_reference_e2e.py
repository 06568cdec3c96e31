"""Whole-driver parity: run the reference's OWN finetune.py and match it.

The last parity tier available without real datasets (VERDICT r4 Missing
#2): everything below the driver is pinned by run-the-reference goldens,
but nothing ran /root/reference/finetune.py ITSELF — argparse -> checkpoint
loading -> SetDataset2/EpisodicBatchSampler2 loader -> episode loop ->
printed CI (finetune.py:424-682).  This tool does, and compares it against
``mft_tpu.cli.finetune`` on identical staged data:

1. stage a deterministic tiny JPEG ImageFolder tree in the reference's
   CropDisease layout (``<root>/dataset/train/<class>/*.jpg``),
2. build random-init checkpoints in BOTH formats from one seed — ours
   (``.ckpt``) and, via ``cli.export_ckpt``, reference ``.tar``s the
   reference loads directly,
3. subprocess-run the reference driver (tools/ref_e2e_bootstrap.py; the
   only source patch is iter_num 600 -> N) for ``--method gnnnet`` and
   ``--method all``, recording per-episode accuracies AND the exact
   episode file composition,
4. run ``mft_tpu.cli.finetune`` twice per method on the same tree at
   strict-parity flags: REPLAY mode (``--episode_manifest`` = the
   reference's exact episodes: per-episode comparison — identical input
   pixels, since the clean chain is pixel-exact at the default base) and
   FREE mode (our own sampler: whole-protocol mean comparison),
5. write ``tests/fixtures/reference_e2e.json`` with everything;
   ``tests/test_reference_e2e.py`` replays our side against it in CI.

Residual divergence in replay mode is ONLY the inner-loop RNG (minibatch
shuffle order, throwaway-classifier init) — both sides optimize the same
bank from the same weights on the same pixels.

Run (one-time, torch-slow: ~1-2 min/episode for method=all on this host):

    python tools/run_reference_e2e.py --iter_num 8
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# this tool is host/CPU work (staging, checkpoint init, torch subprocesses);
# the ambient JAX_PLATFORMS=axon tunnel must not be touched — device init
# through the tunnel can block indefinitely under contention
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
FIXTURE = os.path.join(_REPO, "tests", "fixtures", "reference_e2e.json")

# staged-tree geometry: 38 classes (SetDataset2 hardcodes range(38) for
# CropDisease, datasets/CropDisease_few_shot.py:88 — every class must be
# non-empty), exactly n_support+n_query images per class so both samplers
# use every image of a drawn class and differ only in slot order
STAGE = dict(n_classes=38, per_class=20, size=64, tint=0.45, quality=92, seed=7)

# staged miniImageNet for the dampnet source sweep (finetune_50.py:591-622):
# ImageFolder directly at the root (no dataset/train subdir,
# miniImageNet_few_shot.py:31), and the image count MUST be a multiple of
# the sweep batch 64 — the reference preallocates
# ``torch.zeros(len(loader), 64, f)`` and assigns full batches, so a ragged
# final batch crashes it (finetune_50.py:607-610)
MINI_STAGE = dict(n_classes=16, per_class=16, size=64, tint=0.45, quality=92, seed=11,
                  subdir="")


def stage_dataset(root: str, *, n_classes: int, per_class: int, size: int, tint: float,
                  quality: int, seed: int, subdir: str = "dataset/train") -> str:
    """Write ``<root>/<subdir>/class_XX/imgYYY.jpg``; returns a content
    hash over every encoded byte (fixture validity check: PIL's JPEG encoder
    must produce the same bytes for the comparison to be exact)."""
    import numpy as np
    from PIL import Image

    rs = np.random.RandomState(seed)
    tints = rs.rand(n_classes, 1, 1, 3)
    h = hashlib.sha1()
    for c in range(n_classes):
        d = os.path.join(root, subdir, f"class_{c:02d}") if subdir else os.path.join(root, f"class_{c:02d}")
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            img = np.clip(tint * tints[c] + (1.0 - tint) * rs.rand(size, size, 3), 0, 1)
            p = os.path.join(d, f"img{i:03d}.jpg")
            Image.fromarray((img * 255).astype(np.uint8)).save(p, quality=quality)
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()


def make_checkpoints(our_save: str, ref_save: str | None, seed: int) -> str:
    """Random-init baseline@400 + gnnnet@600 in both formats from one seed
    (``ref_save=None`` skips the torch export — the CI replay test only
    needs the ``.ckpt`` side).  Returns a parameter hash (fixture validity:
    the jax PRNG must reproduce the same weights for the comparison to be
    exact)."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # env var alone loses to the ambient axon tunnel
    import numpy as np

    from mft_tpu.methods import dampnet as dn
    from mft_tpu.methods import gnnnet as gn
    from mft_tpu.models import backbone as bb
    from mft_tpu.utils import checkpoint as ckpt

    bcfg = bb.resnet10()
    gcfg = gn.GnnNetCfg(feat_dim=bcfg.feat_dim, n_way=5, n_support=5)
    kb, kg, kh, kd, kdd = jax.random.split(jax.random.PRNGKey(seed), 5)
    f_b, s_b = bb.init_backbone(kb, bcfg)
    f_g, s_g = bb.init_backbone(kg, bcfg)
    head = gn.init_head(kh, gcfg)
    f_d, s_d = bb.init_backbone(kd, bcfg)
    dcfg = dn.DampNetCfg(feat_dim=bcfg.feat_dim, n_way=5, n_support=5, stat="class")
    dparams, dstate = dn.init_dampnet(kdd, dcfg)  # dstate uninitialized: both
    # drivers derive the source prototypes from their own miniImageNet sweep
    to_np = lambda t: jax.tree.map(np.asarray, t)

    h = hashlib.sha1()
    for leaf in jax.tree.leaves(to_np((f_b, f_g, head, f_d, dparams))):
        h.update(np.asarray(leaf, np.float32).tobytes())

    jobs = [
        ("miniImageNet/ResNet10_baseline_aug", 400, {"feature": to_np(f_b)}, to_np(s_b), None),
        ("miniImageNet/ResNet10_gnnnet_aug_5way_5shot", 600,
         {"feature": to_np(f_g), "fc": to_np(head["fc"]), "gnn": to_np(head["gnn"])}, to_np(s_g), None),
        ("miniImageNet/ResNet10_dampnet_full_class_aug_5way_5shot", 600,
         {"feature": to_np(f_d), **to_np(dparams)}, to_np(s_d), to_np(dstate)),
    ]
    for rel, epoch, params, stats, damp_state in jobs:
        d_our = os.path.join(our_save, "checkpoints", rel)
        blob = {"epoch": epoch, "params": params, "stats": stats}
        if damp_state is not None:
            blob["damp_state"] = damp_state
        ckpt.save_checkpoint(d_our, epoch, blob)
        if ref_save is None:
            continue
        from mft_tpu.cli import export_ckpt

        d_ref = os.path.join(ref_save, "checkpoints", rel)
        os.makedirs(d_ref, exist_ok=True)
        rc = export_ckpt.main([
            os.path.join(d_our, f"{epoch}.ckpt"), "--model", "ResNet10",
            "--out", os.path.join(d_ref, f"{epoch}.tar"),
        ])
        assert rc == 0, f"export failed for {rel}"
    return h.hexdigest()


def run_reference(data_root: str, ref_save: str, out_json: str, *, method: str, iter_num: int,
                  fine_tune_epoch: int, driver: str = "finetune", mini_root: str | None = None) -> dict:
    cmd = [
        sys.executable, os.path.join(_HERE, "ref_e2e_bootstrap.py"),
        "--data_root", data_root, "--save_dir", ref_save, "--out", out_json,
        "--method", method, "--iter_num", str(iter_num), "--n_shot", "5",
        "--fine_tune_epoch", str(fine_tune_epoch), "--gen_examples", "0",
        "--save_iter", "600", "--train_aug", "--driver", driver,
    ] + (["--mini_root", mini_root] if mini_root else [])
    r = subprocess.run(cmd, cwd=_REPO, text=True, capture_output=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:])
        raise RuntimeError(f"reference driver failed for method={method}")
    with open(out_json) as f:
        return json.load(f)


def ours_cmd(method: str, iter_num: int, fine_tune_epoch: int, *, manifest: str | None,
             data_root: str | None = None, eval_batch: int = 2) -> list:
    cmd = [
        sys.executable, "-m", "mft_tpu.cli.finetune",
        "--method", method, "--test_dataset", "CropDisease", "--n_shot", "5",
        "--train_aug", "--save_iter", "600", "--fine_tune_epoch", str(fine_tune_epoch),
        "--gen_examples", "0", "--iter_num", str(iter_num), "--eval_batch", str(eval_batch),
        "--bn_mode", "minibatch", "--dtype", "float32", "--inner_param_dtype", "float32",
    ]
    if manifest:
        cmd += ["--episode_manifest", manifest]
        if data_root:
            cmd += ["--episode_manifest_root", data_root]
    return cmd


def run_ours(data_root: str, our_save: str, *, method: str, iter_num: int, fine_tune_epoch: int,
             manifest: str | None = None, eval_batch: int = 2, mini_root: str | None = None) -> dict:
    """Subprocess-run mft_tpu.cli.finetune; parse per-episode accs + CI."""
    env = dict(
        os.environ,
        MFT_SAVE_DIR_PATH=our_save,
        MFT_CROPDISEASE_PATH=data_root,
        JAX_PLATFORMS="cpu",
        # the env var above is advisory only — the ambient axon plugin can
        # override it and route the child through the (flaky, contended)
        # TPU tunnel; this forces CPU at the jax-config level in the child
        MFT_JAX_PLATFORM="cpu",
        JAX_COMPILATION_CACHE_DIR=os.path.join(_REPO, ".jax_cache"),
        JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="-1",
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
    )
    if mini_root:
        env["MFT_MINIIMAGENET_PATH"] = mini_root
    env.setdefault("PYTHONPATH", _REPO)
    # per-episode RNG keys depend on the batch layout (evaluate() splits per
    # batch), so replay runs pin ONE cpu device regardless of the caller's
    # virtual-device count (the test suite forces 8) — generation and CI
    # replay then see identical key streams
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    ).strip()
    cmd = ours_cmd(method, iter_num, fine_tune_epoch, manifest=manifest, data_root=data_root,
                   eval_batch=eval_batch)
    r = subprocess.run(cmd, cwd=_REPO, env=env, text=True, capture_output=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:])
        raise RuntimeError(f"mft_tpu.cli.finetune failed for method={method}")
    return parse_ours(r.stdout, iter_num)


def parse_ours(stdout: str, iter_num: int) -> dict:
    accs = []
    mean = ci = None
    for line in stdout.splitlines():
        line = line.strip()
        m = re.match(r"^\d+ Test Acc = ([\d.]+)% \+- ([\d.]+)%$", line)
        if m:
            mean, ci = float(m.group(1)), float(m.group(2))
            continue
        try:
            accs.append(float(line))
        except ValueError:
            pass
    assert mean is not None, f"no CI line in driver output:\n{stdout[-2000:]}"
    accs = accs[-iter_num:] if len(accs) > iter_num else accs
    assert len(accs) == iter_num, (len(accs), iter_num)
    return {"acc_all": accs, "acc_mean": mean, "ci95": ci}


def compare(tag: str, ref: dict, ours: dict) -> dict:
    import numpy as np

    r = np.asarray(ref["acc_all"], np.float64)
    o = np.asarray(ours["acc_all"], np.float64)
    d = {
        "mean_ref": float(r.mean()),
        "mean_ours": float(o.mean()),
        "mean_delta": float(abs(r.mean() - o.mean())),
    }
    if len(r) == len(o):
        d["per_episode_abs_delta"] = np.abs(r - o).tolist()
        d["max_episode_delta"] = float(np.abs(r - o).max())
    print(f"[{tag}] ref {d['mean_ref']:.2f}% vs ours {d['mean_ours']:.2f}% "
          f"(|Δmean|={d['mean_delta']:.2f} pp"
          + (f", max |Δepisode|={d['max_episode_delta']:.2f} pp" if "max_episode_delta" in d else "")
          + ")")
    return d


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--work_dir", default="/tmp/mft_ref_e2e")
    ap.add_argument("--iter_num", type=int, default=8)
    ap.add_argument("--runs", nargs="+",
                    default=["gnnnet:0", "gnnnet:1", "all:1", "dampnet_full_class:0",
                             "dampnet_full_class:1"],
                    help="method:fine_tune_epoch per run.  fine_tune_epoch=0 is the "
                         "precision tier: with no inner loop the scores are deterministic "
                         "functions of the (bitwise-identical) replayed pixels, so the two "
                         "drivers must agree up to backend numerics; the trained tiers "
                         "additionally tolerate inner-loop RNG (shuffle order, throwaway "
                         "classifier init), the one free variable between the frameworks.  "
                         "dampnet_full_class tiers run through the reference's finetune_50.py "
                         "(the driver whose dampnet dispatch works upstream) with a staged "
                         "miniImageNet tree for the source-prototype sweep, whose recorded "
                         "shuffle order is replayed on our side (same per-batch BN stats)")
    ap.add_argument("--ckpt_seed", type=int, default=3)
    ap.add_argument("--out", default=FIXTURE)
    ap.add_argument("--skip_ours", action="store_true",
                    help="only (re)generate the reference half of the fixture")
    a = ap.parse_args(argv)

    os.makedirs(a.work_dir, exist_ok=True)
    data_root = os.path.join(a.work_dir, "CropDisease")
    print(f"[stage] {data_root} ({STAGE})")
    data_hash = stage_dataset(data_root, **STAGE)

    need_mini = any(r.split(":")[0].startswith("dampnet") for r in a.runs)
    mini_root = mini_hash = None
    if need_mini:
        mini_root = os.path.join(a.work_dir, "miniImageNet")
        print(f"[stage] {mini_root} ({MINI_STAGE})")
        mini_hash = stage_dataset(mini_root, **MINI_STAGE)

    our_save = os.path.join(a.work_dir, "ours_logs")
    ref_save = os.path.join(a.work_dir, "ref_logs")
    ckpt_hash = make_checkpoints(our_save, ref_save, a.ckpt_seed)
    print(f"[ckpt] data_hash={data_hash[:12]} ckpt_hash={ckpt_hash[:12]}")

    import torch

    fixture = {
        "stage": STAGE,
        "data_hash": data_hash,
        "ckpt_seed": a.ckpt_seed,
        "ckpt_hash": ckpt_hash,
        "iter_num": a.iter_num,
        "torch_version": torch.__version__,
        "runs": {},
    }
    if need_mini:
        fixture["mini_stage"] = MINI_STAGE
        fixture["mini_hash"] = mini_hash
    for spec_str in a.runs:
        method, fte = spec_str.split(":")
        fte = int(fte)
        key = f"{method}_fte{fte}"
        damp = method.startswith("dampnet")
        driver = "finetune_50" if damp else "finetune"
        out_json = os.path.join(a.work_dir, f"ref_{key}.json")
        ref = run_reference(data_root, ref_save, out_json, method=method, iter_num=a.iter_num,
                            fine_tune_epoch=fte, driver=driver,
                            mini_root=mini_root if damp else None)
        run = {"method": method, "driver": driver, "fine_tune_epoch": fte, "reference": ref}
        if not a.skip_ours:
            manifest = os.path.join(a.work_dir, f"manifest_{key}.json")
            with open(manifest, "w") as f:
                json.dump({"episodes": ref["episodes"],
                           **({"sweep_order": ref["sweep_order"]} if damp else {})}, f)
            run["ours_replay"] = run_ours(
                data_root, our_save, method=method, iter_num=a.iter_num,
                fine_tune_epoch=fte, manifest=manifest, mini_root=mini_root if damp else None,
            )
            run["replay_compare"] = compare(f"{key}/replay", ref, run["ours_replay"])
            run["ours_free"] = run_ours(
                data_root, our_save, method=method, iter_num=a.iter_num,
                fine_tune_epoch=fte, mini_root=mini_root if damp else None,
            )
            run["free_compare"] = compare(f"{key}/free", ref, run["ours_free"])
        fixture["runs"][key] = run

    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(fixture, f, indent=1)
    print(f"[done] wrote {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
