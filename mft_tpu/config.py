"""Configuration and CLI flags.

Replaces the reference's two config tiers (SURVEY.md §5): the editable path
constants of configs.py:1-9 become :class:`Paths` (env-var / JSON
overridable), and the shared argparse parser of io_utils.py:10-47 becomes
:func:`parse_args` with the same flag names plus structured knobs for the
magic numbers that the reference hard-codes (inner-loop lr/batch/epochs,
episode counts, image size — io_utils.py notes in SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass


@dataclass
class Paths:
    """Dataset roots + save dir (reference configs.py:1-9)."""

    save_dir: str = "./logs"
    miniImageNet: str = "content/miniImagenet3"
    DTD: str = "/ssd/dtd/images/"
    ISIC: str = "content"
    ChestX: str = "content"
    CropDisease: str = "content/CropDiseases"
    EuroSAT: str = "content/2750"
    cifar100: str = "content/cifar100"
    caltech256: str = "content/caltech256"
    # filelist-backed datasets: directories holding base/val/novel.json
    # written by cli.make_filelists (reference filelists/ tooling)
    CUB: str = "filelists/CUB"
    cross: str = "filelists/cross"

    @classmethod
    def load(cls, json_path: str | None = None) -> "Paths":
        """Defaults <- optional JSON file (MFT_TPU_PATHS or ./mft_paths.json)
        <- MFT_<NAME>_PATH env vars."""
        p = cls()
        json_path = json_path or os.environ.get("MFT_TPU_PATHS")
        if json_path is None and os.path.exists("mft_paths.json"):
            json_path = "mft_paths.json"
        if json_path and os.path.exists(json_path):
            with open(json_path) as f:
                for k, v in json.load(f).items():
                    if hasattr(p, k):
                        setattr(p, k, v)
        for f_ in dataclasses.fields(cls):
            env = os.environ.get(f"MFT_{f_.name.upper()}_PATH")
            if env:
                setattr(p, f_.name, env)
        return p

    def as_dict(self):
        return dataclasses.asdict(self)


def checkpoint_dir(paths: Paths, dataset: str, model: str, method: str, *, train_aug: bool, n_way: int | None = None, n_shot: int | None = None) -> str:
    """Reference checkpoint layout (train.py:175-180):
    ``<save_dir>/checkpoints/<dataset>/<model>_<method>[_aug][_<W>way_<S>shot]``."""
    d = os.path.join(paths.save_dir, "checkpoints", dataset, f"{model}_{method}")
    if train_aug:
        d += "_aug"
    if method not in ("baseline", "baseline++") and n_way is not None:
        d += f"_{n_way}way_{n_shot}shot"
    return d


def parse_args(script: str, argv=None, overrides: dict | None = None):
    """Flag parity with reference io_utils.py:10-47 (+ TPU-native extras).

    ``overrides``: default values a driver swaps in for its own entry point
    (the eval drivers default to the fast bf16 path; explicit flags always
    win)."""
    # MFT_JAX_PLATFORM=cpu|tpu: force the jax platform at the CONFIG level.
    # Needed because an ambient PJRT plugin (e.g. the tunneled-TPU 'axon'
    # platform) can override the plain JAX_PLATFORMS env var, so a harness
    # that subprocess-runs a driver "on CPU" would silently run on — and
    # hang with — the tunnel.  Applied here because every driver calls
    # parse_args before touching a jax backend (device init is lazy).
    plat = os.environ.get("MFT_JAX_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    parser = argparse.ArgumentParser(description=f"mft_tpu few-shot script {script}")
    parser.add_argument("--dataset", default="miniImageNet", help="training base dataset")
    parser.add_argument("--test_dataset", default="", help="cross-domain test dataset")
    parser.add_argument("--unsupervised", default="", help="unsupervised dataset (dampnet)")
    parser.add_argument("--model", default="ResNet10", help="backbone architecture")
    parser.add_argument("--method", default="baseline", help="baseline/protonet/gnnnet/dampnet_full_class/all")
    parser.add_argument("--train_n_way", default=5, type=int)
    parser.add_argument("--test_n_way", default=5, type=int)
    parser.add_argument("--n_shot", default=5, type=int)
    parser.add_argument("--train_aug", action="store_true")
    parser.add_argument("--freeze_backbone", action="store_true")
    parser.add_argument("--save_iter", default=-1, type=int)
    # NOTE: the reference's io_utils.py also declares --both, --models_to_use
    # and --fine_tune_all_models, but nothing in its codebase reads them
    # (upstream cdfsl-benchmark vestiges).  Dead flags are deliberately not
    # reproduced (same policy as --unsup/--unsup_cluster below).
    parser.add_argument("--fine_tune_epoch", default=100, type=int)
    parser.add_argument("--gen_examples", default=10, type=int)
    # --- TPU-native extras (magic numbers surfaced as flags) ---
    parser.add_argument("--image_size", default=224, type=int)
    parser.add_argument("--base_size", default=-1, type=int,
                        help="host decode resolution; -1 (default) resolves to int(1.15*image_size) "
                             "(257 at 224), which makes the composed clean/center view PIXEL-EXACT vs "
                             "the reference's Scale([1.15s,1.15s])+CenterCrop (run-the-reference pixel "
                             "goldens, tests/test_augment.py)")
    parser.add_argument("--iter_num", default=600, type=int, help="eval episodes")
    parser.add_argument("--episode_batch", default=1, type=int, help="episodes per training step (data-parallel axis)")
    parser.add_argument("--eval_batch", default=5, type=int,
                        help="episodes fine-tuned concurrently PER CHIP at eval (5 = measured "
                             "single-chip optimum); the episode axis is sharded over every "
                             "device, so the global batch is eval_batch * n_devices")
    parser.add_argument("--bn_mode", default="episode", choices=["episode", "minibatch"])
    parser.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--inner_param_dtype", default="float32", choices=["float32", "bfloat16"],
                        help="carry dtype of the eval inner-scan parameters (bfloat16 = fast path)")
    parser.add_argument("--dampnet_eval", default="finetune", choices=["finetune", "nofinetune"],
                        help="dampnet eval composition: 'finetune' = the live reference path "
                             "(adapt last block, then domain-shift scoring, finetune_50.py:589-687); "
                             "'nofinetune' = the no-adaptation branch with probe fusion (finetune.py:331-417)")
    parser.add_argument("--sweep_images", default=-1, type=int,
                        help="images for dampnet prototype/unsup feature sweeps; -1 = full dataset "
                             "(reference parity, finetune_50.py:591-622)")
    parser.add_argument("--n_query", default=-1, type=int,
                        help="queries per class; -1 = the reference rule max(1, 16*test_n_way/"
                             "train_n_way) for training (train.py:112) and 15 for eval "
                             "(finetune.py:456).  The reference adapts n_query dynamically when a "
                             "class has fewer images than n_support+n_query (meta_template.py:81) — "
                             "set this explicitly to reproduce such runs at static shapes")
    parser.add_argument("--seed", default=10, type=int, help="reference seed discipline (train.py:69)")
    parser.add_argument("--paths_json", default=None)
    parser.add_argument("--trace_dir", default=None, help="jax.profiler trace output dir")
    parser.add_argument("--episode_manifest", default=None,
                        help="JSON file of explicit per-episode image paths (list of episodes, "
                             "each [n_way][n_support+n_query] paths): replay recorded episodes "
                             "instead of sampling — reproducible eval / cross-framework "
                             "comparison (tools/run_reference_e2e.py records one from the "
                             "reference's own loader).  Overrides --iter_num with the manifest "
                             "length; paths resolve relative to --episode_manifest_root")
    parser.add_argument("--episode_manifest_root", default=None,
                        help="base directory for relative paths in --episode_manifest")
    parser.add_argument("--episode_cache", default=None,
                        help="dir for the decoded-episode uint8 cache (keyed by dataset/spec/seed/"
                             "resolution): repeat evals skip image decode entirely.  Training keys "
                             "streams by seed+epoch, so the cache grows by one epoch's episodes per "
                             "epoch (hits only on crash-resume of the same epochs) — budget disk "
                             "accordingly or reserve the flag for eval")
    parser.add_argument("--use_pallas", action="store_true", help="fused Pallas edge kernel in the GNN head")

    if script == "train":
        parser.add_argument("--fine_tune", action="store_true", help="meta fine-tuning stage")
        parser.add_argument("--num_classes", default=200, type=int)
        parser.add_argument("--save_freq", default=50, type=int)
        parser.add_argument("--start_epoch", default=0, type=int)
        parser.add_argument("--stop_epoch", default=400, type=int,
                            help="LAST epoch index, inclusive (the reference's is an exclusive "
                                 "range() bound: its --stop_epoch 401 = this --stop_epoch 400; "
                                 "docs/GUIDE.md §3)")
        parser.add_argument("--episodes_per_epoch", default=100, type=int)
        parser.add_argument("--batch_size", default=16, type=int, help="baseline pretraining batch")
    elif script in ("save_features", "test"):
        parser.add_argument("--split", default="novel")
        if script == "test":
            parser.add_argument("--adaptation", action="store_true")
            # NOTE: the reference's io_utils.py:42-43 also declares --unsup /
            # --unsup_cluster for its (absent) test.py; the working unsup
            # capability here is finetune's --unsupervised flag, which feeds
            # dampnet's unsup recovery (set_forward_unsup semantics).  Dead
            # flags are deliberately not reproduced.
    else:
        raise ValueError("Unknown script")
    if overrides:
        parser.set_defaults(**overrides)
    args = parser.parse_args(argv)
    if args.base_size <= 0:
        args.base_size = int(args.image_size * 1.15)
    return args
