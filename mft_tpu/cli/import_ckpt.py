"""Reference-checkpoint importer: ``.tar`` (torch) -> ``.ckpt`` (pytree).

Migration path for users with models trained by the reference: each input
is a ``torch.save({'epoch', 'state'})`` file (reference train.py:48,58);
the output is this framework's msgpack checkpoint
(``{"epoch", "params", "stats", "opt_state"}``, utils/checkpoint.py) in
the same epoch-numbered layout, so the eval drivers pick imported models
up with the exact flags they would use on a natively-trained run.  The
``opt_state`` is freshly initialized — identical semantics to the
reference's own resume, which reloads model weights but re-creates the
optimizer (train.py:196-205).

Examples::

    # one file into an explicit directory
    python -m mft_tpu.cli.import_ckpt logs/checkpoints/miniImagenet/ResNet10_gnnnet_aug_5way_5shot/400.tar \
        --model ResNet10 --out_dir /data/mft/checkpoints/miniImageNet/ResNet10_gnnnet_aug_5way_5shot

    # a whole reference checkpoint directory into the standard layout
    python -m mft_tpu.cli.import_ckpt ref_ckpts/ --model ResNet10 \
        --dataset miniImageNet --method gnnnet --train_aug --n_way 5 --n_shot 5
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

from mft_tpu import config as cfg_mod
from mft_tpu.models import backbone as bb
from mft_tpu.utils import checkpoint as ckpt
from mft_tpu.utils.torch_import import convert_state_dict, load_torch_tar


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src", nargs="+", help=".tar checkpoint file(s), or one directory of them")
    ap.add_argument("--model", default="ResNet10", choices=sorted(bb.MODEL_REGISTRY))
    ap.add_argument("--out_dir", default=None, help="destination checkpoint directory")
    ap.add_argument("--dataset", default=None,
                    help="with --method: derive the standard checkpoint dir instead of --out_dir")
    ap.add_argument("--method", default="gnnnet")
    ap.add_argument("--train_aug", action="store_true")
    ap.add_argument("--n_way", type=int, default=5)
    ap.add_argument("--n_shot", type=int, default=5)
    ap.add_argument("--paths_json", default=None)
    ap.add_argument("--loose", action="store_true",
                    help="import the mapped subset even if some tensors are unmapped "
                         "(e.g. DampNet extra module state)")
    a = ap.parse_args(argv)

    if a.out_dir:
        out_dir = a.out_dir
    elif a.dataset:
        paths = cfg_mod.Paths.load(a.paths_json)
        out_dir = cfg_mod.checkpoint_dir(
            paths, a.dataset, a.model, a.method, train_aug=a.train_aug,
            n_way=a.n_way if a.method not in ("baseline", "baseline++") else None,
            n_shot=a.n_shot,
        )
    else:
        ap.error("give either --out_dir or --dataset (to derive the standard layout)")

    srcs = a.src
    if len(srcs) == 1 and os.path.isdir(srcs[0]):
        srcs = sorted(glob.glob(os.path.join(srcs[0], "*.tar")))
        if not srcs:
            print(f"no .tar checkpoints under {a.src[0]}", file=sys.stderr)
            return 2

    bcfg = bb.MODEL_REGISTRY[a.model]()
    from mft_tpu.train import optimizers as opt  # deferred: pulls in jax

    import jax

    for src in srcs:
        epoch, sd = load_torch_tar(src)
        params, stats = convert_state_dict(sd, bcfg, strict=not a.loose)
        # fresh optimizer state, FWT noise-strength params frozen exactly as
        # in training (cli/train.py)
        tx = opt.torch_adam(1e-3)
        trainable = bb.fwt_trainable_mask(params)
        if not all(jax.tree.leaves(trainable)):
            tx = opt.freeze_masked(tx, trainable)
        tree = {"epoch": epoch, "params": params, "stats": stats, "opt_state": tx.init(params)}
        if "W_R" in params:
            # DampNet: the prototype/rolling-store banks are plain attributes
            # in the reference (never in state_dict), so rebuild damp_state
            # fresh — a reference eval re-derives it the same way.  feat_dim
            # comes from the checkpoint itself (layer3 projects back to it).
            # All three variants share identical state-dict keys, so the
            # variant CANNOT be inferred from the tensors: require the user
            # to say which one this is rather than silently defaulting to
            # the full variant (and filing under a gnnnet-named directory).
            if a.method not in ("dampnet", "dampnet_full", "dampnet_full_class"):
                ap.error(
                    f"{src} is a DampNet checkpoint (has recovery-net tensors) but "
                    f"--method is {a.method!r}; the three DampNet variants share "
                    "identical state-dict keys, so pass the correct --method "
                    "(dampnet | dampnet_full | dampnet_full_class) explicitly"
                )
            from mft_tpu.methods import dampnet as dn

            f = int(sd["layer3.bias"].shape[0])
            if a.method == "dampnet":
                dcfg = dn.prototype_cfg(f, a.n_way, a.n_shot)
            else:
                dcfg = dn.DampNetCfg(
                    feat_dim=f, n_way=a.n_way, n_support=a.n_shot,
                    stat="class" if a.method == "dampnet_full_class" else "support",
                )
            tree["damp_state"] = dn.init_dampnet(jax.random.PRNGKey(0), dcfg)[1]
        base = os.path.basename(src)
        if base == "best_model.tar":
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, "best_model.ckpt")
            import numpy as np
            from flax import serialization

            tree = jax.tree.map(np.asarray, tree)
            with open(path, "wb") as f:
                f.write(serialization.to_bytes(tree))
        else:
            path = ckpt.save_checkpoint(out_dir, epoch, tree)
        parts = sorted(k for k in params if k != "feature")
        print(f"{src} -> {path} (epoch {epoch}, feature + {'/'.join(parts) if parts else 'no head'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
