"""Whole-driver TRAINING parity: run the reference's OWN train.py and match it.

Completes the whole-driver tier (tools/run_reference_e2e.py covers the
eval drivers finetune.py / finetune_50.py): this tool subprocess-runs
/root/reference/train.py itself — argparse -> SetDataManager episodic
loader -> assigned-checkpoint resume -> train_loop2 / train_loop_finetune
epochs -> MAML_update at stop -> torch.save (train.py:26-63,112-207) —
and compares it against ``mft_tpu.cli.train`` on identical staged data:

1. stage a deterministic 64-class miniImageNet ImageFolder tree
   (SetDataset hardcodes range(64), miniImageNet_few_shot.py:52); 8 images
   per class makes the reference's own dynamic n_query recompute
   (meta_template.py:81) yield n_query=3, shrinking episodes to 40 images,
2. build one random-init gnnnet checkpoint in BOTH formats from one seed
   (``0.ckpt`` + exported ``0.tar``); both drivers resume from it with a
   FRESH Adam — identical optimizer semantics (train.py:27-28),
3. run the reference driver (tools/ref_train_bootstrap.py, zero source
   patches) without --train_aug, recording per-episode losses and the
   exact episode composition,
4. replay those episodes through ``mft_tpu.cli.train --episode_manifest``
   at strict-parity flags and recover its per-episode losses from the
   JSONL log,
5. compare the loss sequences AND the saved checkpoints' parameter trees
   (reference ``.tar`` -> pytree via utils/torch_import), and write
   ``tests/fixtures/reference_train_e2e.json``;
   ``tests/test_reference_train_e2e.py`` replays our side against it.

With --train_aug off both transform chains are deterministic and
pixel-exact (Resize 257 + CenterCrop 224, pinned by the pixel goldens), no
dropout is active (gnn.py:60 drop=False), and both optimizers start fresh
— so on the plain and baseline tiers every divergence is cross-backend
float32 numerics, no RNG anywhere.  The fine_tune tier has exactly one
free variable: set_forward_finetune's inner-minibatch order is an unseeded
np.random.permutation (gnnnet.py:154; train.py:69-70 skips the seed at
start_epoch>0 — true of the reference's own shipped stage-2 commands), so
its bounds are stated from observed deltas like the eval fte1 tiers.

Run (one-time; the reference side is torch-slow on this 1-core host):

    python tools/run_reference_train_e2e.py
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
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from run_reference_e2e import stage_dataset  # noqa: E402  (same staging law)

FIXTURE = os.path.join(_REPO, "tests", "fixtures", "reference_train_e2e.json")
CKPT_REL = "checkpoints/miniImageNet/ResNet10_gnnnet_5way_5shot"
CKPT_REL_BASELINE = "checkpoints/miniImageNet/ResNet10_baseline"
CKPT_REL_50 = "checkpoints/miniImageNet/ResNet10_gnnnet_5way_50shot"
NUM_CLASSES = 200  # reference default (io_utils.py --num_classes); labels 0..63 here


def ckpt_rel(ref: dict) -> str:
    if ref["method"] == "baseline":
        return CKPT_REL_BASELINE
    return CKPT_REL_50 if ref.get("driver") == "train_50" else CKPT_REL

# 64 classes non-negotiable (range(64) hardcode); per_class=8 -> n_query=3
# through the reference's own dynamic recompute (meta_template.py:81) —
# deliberately ALSO exercising that quirk at driver level
MINI64 = dict(n_classes=64, per_class=8, size=64, tint=0.45, quality=92, seed=13, subdir="")
# the fine_tune stage asserts n_query == 16 (gnnnet.py:198), so its tree
# carries exactly n_support+16 images per class
MINI64_FT = dict(n_classes=64, per_class=21, size=64, tint=0.45, quality=92, seed=17, subdir="")
# train_50's compressed variant pins n_support=50 (train_loop50: n_query =
# batch - 50, gnnnet_copy.py:86); 65 per class -> the shipped n_query=15
MINI64_50 = dict(n_classes=64, per_class=65, size=64, tint=0.45, quality=92, seed=19, subdir="")


def make_train_checkpoint(our_save: str, ref_save: str | None, seed: int,
                          method: str = "gnnnet") -> str:
    """Random-init model at epoch 0 in both formats; fresh Adam state in
    ours (equal to what both drivers would build at resume).  Returns a
    parameter hash for fixture validity."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mft_tpu.models import backbone as bb
    from mft_tpu.train import optimizers as opt
    from mft_tpu.utils import checkpoint as ckpt

    bcfg = bb.resnet10()
    kb, kh = jax.random.split(jax.random.PRNGKey(seed))
    feature, stats = bb.init_backbone(kb, bcfg)
    if method == "baseline":
        from mft_tpu.methods.baseline import init_classifier

        params = {"feature": feature, "classifier": init_classifier(kh, bcfg.feat_dim, NUM_CLASSES)}
        rel = CKPT_REL_BASELINE
    else:
        from mft_tpu.methods import gnnnet as gn

        if method == "gnnnet50":
            gcfg = gn.GnnNetCfg(feat_dim=bcfg.feat_dim, n_way=5, n_support=50, support_compress=2)
            rel = CKPT_REL_50
        else:
            gcfg = gn.GnnNetCfg(feat_dim=bcfg.feat_dim, n_way=5, n_support=5)
            rel = CKPT_REL
        head = gn.init_head(kh, gcfg)
        params = {"feature": feature, "fc": head["fc"], "gnn": head["gnn"]}
    to_np = lambda t: jax.tree.map(np.asarray, t)  # noqa: E731
    params = to_np(params)
    stats = to_np(stats)

    h = hashlib.sha1()
    for leaf in jax.tree.leaves(params):
        h.update(np.asarray(leaf, np.float32).tobytes())

    tx = opt.torch_adam(1e-3)
    d_our = os.path.join(our_save, rel)
    ckpt.save_checkpoint(d_our, 0, {"epoch": 0, "params": params, "stats": stats,
                                    "opt_state": to_np(tx.init(params))})
    if ref_save is not None:
        from mft_tpu.cli import export_ckpt

        d_ref = os.path.join(ref_save, rel)
        os.makedirs(d_ref, exist_ok=True)
        rc = export_ckpt.main([os.path.join(d_our, "0.ckpt"), "--model", "ResNet10",
                               "--out", os.path.join(d_ref, "0.tar")])
        assert rc == 0, "export failed"
    return h.hexdigest()


def run_reference(mini_root: str, ref_save: str, out_json: str, *, fine_tune: bool,
                  episodes_per_epoch: int, start_epoch: int, stop_epoch: int,
                  method: str = "gnnnet", n_shot: int = 5, driver: str = "train") -> dict:
    cmd = [
        sys.executable, os.path.join(_HERE, "ref_train_bootstrap.py"),
        "--mini_root", mini_root, "--save_dir", ref_save, "--out", out_json,
        "--method", method, "--episodes_per_epoch", str(episodes_per_epoch),
        "--start_epoch", str(start_epoch), "--stop_epoch", str(stop_epoch),
        "--n_shot", str(n_shot), "--driver", driver,
    ] + (["--fine_tune"] if fine_tune else [])
    r = subprocess.run(cmd, cwd=_REPO, text=True, capture_output=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:])
        raise RuntimeError("reference train driver failed")
    with open(out_json) as f:
        return json.load(f)


def ours_cmd(ref: dict, manifest: str, mini_root: str) -> list:
    # reference stop_epoch is range()-exclusive; ours is inclusive (docs/GUIDE.md §3)
    is50 = ref.get("driver") == "train_50"
    cmd = [
        sys.executable, "-m", "mft_tpu.cli.train_50" if is50 else "mft_tpu.cli.train",
        "--method", ref["method"], "--dataset", "miniImageNet", "--model", "ResNet10",
        "--start_epoch", str(ref["start_epoch"]), "--stop_epoch", str(ref["stop_epoch"] - 1),
        "--episode_manifest", manifest, "--episode_manifest_root", mini_root,
        "--bn_mode", "minibatch", "--dtype", "float32", "--inner_param_dtype", "float32",
    ]
    if not is50:  # the 50-shot delegate pins the reference's hardcoded save_freq=10
        cmd += ["--save_freq", "1"]
    if ref["method"] == "baseline":
        cmd += ["--batch_size", str(ref["batch_size"]), "--num_classes", str(NUM_CLASSES)]
    else:
        cmd += ["--n_shot", str(ref["n_shot"]), "--n_query", str(ref["n_query"]),
                "--episodes_per_epoch", str(ref["episodes_per_epoch"])]
        if ref["fine_tune"]:
            cmd += ["--fine_tune"]
    return cmd


def run_ours(ref: dict, manifest: str, mini_root: str, our_save: str) -> dict:
    env = dict(
        os.environ,
        MFT_SAVE_DIR_PATH=our_save,
        MFT_MINIIMAGENET_PATH=mini_root,
        JAX_PLATFORMS="cpu",
        MFT_JAX_PLATFORM="cpu",  # config-level force (the axon plugin beats the env var)
        JAX_COMPILATION_CACHE_DIR=os.path.join(_REPO, ".jax_cache"),
        JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="-1",
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
    )
    env.setdefault("PYTHONPATH", _REPO)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    ).strip()
    r = subprocess.run(ours_cmd(ref, manifest, mini_root), cwd=_REPO, env=env,
                       text=True, capture_output=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:])
        raise RuntimeError("mft_tpu.cli.train failed")
    per_epoch = ref["batches_per_epoch"] if ref["method"] == "baseline" else ref["episodes_per_epoch"]
    return {"losses": parse_losses(os.path.join(our_save, ckpt_rel(ref), "train_log.jsonl"),
                                   ref["start_epoch"], ref["stop_epoch"] - 1, per_epoch)}


def parse_losses(jsonl_path: str, start_epoch: int, last_epoch: int, epe: int) -> list:
    """Per-episode losses from the running averages the driver logs
    (AverageMeter: avg_i = mean(loss_0..loss_i) within the epoch)."""
    by_epoch: dict = {}
    with open(jsonl_path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("kind") == "train" and rec["batch"] < epe:
                by_epoch.setdefault(rec["epoch"], {})[rec["batch"]] = rec["loss"]
    losses = []
    for e in range(start_epoch, last_epoch + 1):
        avgs = by_epoch[e]
        assert sorted(avgs) == list(range(epe)), (e, sorted(avgs))
        for i in range(epe):
            losses.append(avgs[i] * (i + 1) - (avgs[i - 1] * i if i else 0.0))
    return losses


def compare_params(ref_tar: str, our_ckpt: str, seed: int, method: str = "gnnnet") -> dict:
    """Max |Δ| between the reference's saved state and ours, per top-level
    group (params) + BN running stats."""
    import jax
    import numpy as np

    from mft_tpu.models import backbone as bb
    from mft_tpu.train import optimizers as opt
    from mft_tpu.utils import checkpoint as ckpt
    from mft_tpu.utils.torch_import import convert_state_dict, load_torch_tar

    bcfg = bb.resnet10()
    _, sd = load_torch_tar(ref_tar)
    # strict=False: the reference's fine_tune stage persists its feature2/
    # feature3 deepcopy submodules in the .tar; its own resume pops them
    # before load_state_dict (train.py:199-204) — the comparison does the
    # equivalent by converting only the live feature/fc/gnn tensors
    ref_params, ref_stats = convert_state_dict(sd, bcfg, strict=False)

    kb, kh = jax.random.split(jax.random.PRNGKey(seed))
    feature, stats = bb.init_backbone(kb, bcfg)
    if method == "baseline":
        from mft_tpu.methods.baseline import init_classifier

        params = {"feature": feature, "classifier": init_classifier(kh, bcfg.feat_dim, NUM_CLASSES)}
    else:
        from mft_tpu.methods import gnnnet as gn

        gcfg = (gn.GnnNetCfg(feat_dim=bcfg.feat_dim, n_way=5, n_support=50, support_compress=2)
                if method == "gnnnet50" else
                gn.GnnNetCfg(feat_dim=bcfg.feat_dim, n_way=5, n_support=5))
        head = gn.init_head(kh, gcfg)
        params = {"feature": feature, "fc": head["fc"], "gnn": head["gnn"]}
    tx = opt.torch_adam(1e-3)
    template = {"epoch": 0, "params": params, "stats": stats, "opt_state": tx.init(params)}
    ours = ckpt.load_checkpoint(our_ckpt, template)

    def _max_abs(a, b):
        return float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))

    def _max_rel(a, b):
        # normalized by the ref tensor's RMS, not elementwise magnitude —
        # BN running_means sit near zero, so an elementwise quotient reads
        # pure noise as huge "relative" error
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return float(np.max(np.abs(a - b)) / (np.sqrt(np.mean(a * a)) + 1e-6))

    out = {}
    for group in ("feature", "fc", "gnn") if "fc" in ref_params else ("feature", "classifier"):
        out[group] = float(max(jax.tree.leaves(jax.tree.map(_max_abs, ref_params[group], ours["params"][group]))))
    out["bn_stats"] = float(max(jax.tree.leaves(jax.tree.map(_max_abs, ref_stats, ours["stats"]))))
    out["bn_stats_rel"] = float(max(jax.tree.leaves(jax.tree.map(_max_rel, ref_stats, ours["stats"]))))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--work_dir", default="/tmp/mft_ref_train_e2e")
    ap.add_argument("--episodes_per_epoch", type=int, default=3)
    ap.add_argument("--start_epoch", type=int, default=1)
    ap.add_argument("--stop_epoch", type=int, default=3,
                    help="reference-convention exclusive bound (2 epochs by default)")
    ap.add_argument("--ckpt_seed", type=int, default=5)
    ap.add_argument("--runs", nargs="+", default=["plain", "fine_tune", "baseline", "train50"],
                    help="plain = train_loop2 (the episodic stage); fine_tune = "
                         "train_loop_finetune + MAML_update at stop (train.py:49-58); "
                         "baseline = supervised pretraining (SimpleDataManager 16-batches, "
                         "BaselineTrain.train_loop, train.py:77-109); train50 = the OTHER "
                         "training driver, train_50.py, whose gnnnet dispatch at n_shot=50 "
                         "runs gnnnet_copy's compressed graphs via train_loop50")
    ap.add_argument("--out", default=FIXTURE)
    ap.add_argument("--skip_ours", action="store_true")
    a = ap.parse_args(argv)

    os.makedirs(a.work_dir, exist_ok=True)
    mini_root = os.path.join(a.work_dir, "miniImageNet64")
    print(f"[stage] {mini_root} ({MINI64})")
    data_hash = stage_dataset(mini_root, **MINI64)
    mini_root_ft = data_hash_ft = None
    if "fine_tune" in a.runs:
        mini_root_ft = os.path.join(a.work_dir, "miniImageNet64_ft")
        print(f"[stage] {mini_root_ft} ({MINI64_FT})")
        data_hash_ft = stage_dataset(mini_root_ft, **MINI64_FT)
    mini_root_50 = data_hash_50 = None
    if "train50" in a.runs:
        mini_root_50 = os.path.join(a.work_dir, "miniImageNet64_50")
        print(f"[stage] {mini_root_50} ({MINI64_50})")
        data_hash_50 = stage_dataset(mini_root_50, **MINI64_50)

    import torch

    fixture = {
        "stage": MINI64,
        "data_hash": data_hash,
        "ckpt_seed": a.ckpt_seed,
        "episodes_per_epoch": a.episodes_per_epoch,
        "start_epoch": a.start_epoch,
        "stop_epoch": a.stop_epoch,
        "torch_version": torch.__version__,
        "runs": {},
    }
    # partial reruns (--runs subset) keep the other tiers' committed results
    if os.path.exists(a.out):
        with open(a.out) as f:
            prior = json.load(f)
        if prior.get("data_hash") == data_hash and prior.get("ckpt_seed") == a.ckpt_seed:
            fixture["runs"] = {k: v for k, v in prior.get("runs", {}).items() if k not in a.runs}
            for k in ("ckpt_hash_gnnnet", "ckpt_hash_baseline", "ckpt_hash_gnnnet50",
                      "stage_ft", "data_hash_ft", "stage_50", "data_hash_50"):
                if k in prior:
                    fixture.setdefault(k, prior[k])
    if mini_root_ft:
        fixture["stage_ft"] = MINI64_FT
        fixture["data_hash_ft"] = data_hash_ft
    if mini_root_50:
        fixture["stage_50"] = MINI64_50
        fixture["data_hash_50"] = data_hash_50
    for tier in a.runs:
        fine_tune = tier == "fine_tune"
        is50 = tier == "train50"
        method = "baseline" if tier == "baseline" else "gnnnet"
        ckpt_method = "gnnnet50" if is50 else method
        driver = "train_50" if is50 else "train"
        n_shot = 50 if is50 else 5
        rel = CKPT_REL_BASELINE if method == "baseline" else (CKPT_REL_50 if is50 else CKPT_REL)
        tier_root = mini_root_ft if fine_tune else (mini_root_50 if is50 else mini_root)
        # the fine_tune inner loop is 15 epochs x 7 minibatches of torch
        # fwd+bwd per episode, and train50 episodes carry 325 images — keep
        # those episode counts small
        tier_epe = min(2, a.episodes_per_epoch) if (fine_tune or is50) else a.episodes_per_epoch
        # fresh save dirs per tier: both drivers resume from the highest
        # checkpoint present, so stale 1./2. epochs would be picked up
        our_save = os.path.join(a.work_dir, f"ours_{tier}")
        ref_save = os.path.join(a.work_dir, f"ref_{tier}")
        import shutil

        for d in (our_save, ref_save):  # stale epoch>0 ckpts would hijack resume
            shutil.rmtree(d, ignore_errors=True)
        ckpt_hash = make_train_checkpoint(our_save, ref_save, a.ckpt_seed, ckpt_method)
        fixture[f"ckpt_hash_{ckpt_method}"] = ckpt_hash
        print(f"[ckpt] {tier}: data_hash={data_hash[:12]} ckpt_hash={ckpt_hash[:12]}")

        out_json = os.path.join(a.work_dir, f"ref_{tier}.json")
        ref = run_reference(tier_root, ref_save, out_json, fine_tune=fine_tune,
                            episodes_per_epoch=tier_epe,
                            start_epoch=a.start_epoch, stop_epoch=a.stop_epoch,
                            method=method, n_shot=n_shot, driver=driver)
        run = {"reference": ref}
        if not a.skip_ours:
            manifest = os.path.join(a.work_dir, f"manifest_{tier}.json")
            with open(manifest, "w") as f:
                json.dump({"batches": ref["batches"]} if method == "baseline"
                          else {"episodes": ref["episodes"]}, f)
            ours = run_ours(ref, manifest, tier_root, our_save)
            run["ours"] = ours
            import numpy as np

            r = np.asarray(ref["losses"])
            o = np.asarray(ours["losses"])
            run["loss_compare"] = {
                "max_abs_delta": float(np.max(np.abs(r - o))),
                "max_rel_delta": float(np.max(np.abs(r - o) / np.maximum(np.abs(r), 1e-8))),
                # pre-any-optimizer-step: the pure forward-semantics signal
                "first_abs_delta": float(abs(r[0] - o[0])),
            }
            # params: every epoch for plain/baseline (no deferred MAML
            # bookkeeping); final epoch only for fine_tune — the reference's
            # INTERMEDIATE state deliberately carries the live adapted fast
            # weights that MAML_update subtracts at stop (gnnnet.py:183-187),
            # ours is always post-reattach — and for train50 (the reference
            # hardcodes save_freq=10, train_50.py:53, so only the stop
            # checkpoint exists at this geometry)
            epochs = ([a.stop_epoch - 1] if (fine_tune or is50)
                      else list(range(a.start_epoch, a.stop_epoch)))
            run["param_compare"] = {
                str(e): compare_params(os.path.join(ref_save, rel, f"{e}.tar"),
                                       os.path.join(our_save, rel, f"{e}.ckpt"),
                                       a.ckpt_seed, ckpt_method)
                for e in epochs
            }
            print(f"[{tier}] max|Δloss|={run['loss_compare']['max_abs_delta']:.3e} "
                  f"param_compare={run['param_compare']}")
        fixture["runs"][tier] = run
        # write incrementally — a late tier failing must not discard the
        # finished tiers' torch-expensive results
        os.makedirs(os.path.dirname(a.out), exist_ok=True)
        with open(a.out, "w") as f:
            json.dump(fixture, f, indent=1)
        print(f"[tier done] {tier} -> {a.out}")

    print(f"[done] wrote {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
