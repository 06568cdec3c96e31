"""Feature extraction driver.

Reconstructs the upstream cdfsl-benchmark ``save_features.py`` stage whose
script is absent from the reference repo but whose flags
(io_utils.py:38-40) and consumer (data/feature_loader.py) remain: embed a
dataset split with a trained backbone and persist ``{all_feats, all_labels,
count}`` for the feature-based test driver.

Run: ``python -m mft_tpu.cli.save_features --dataset miniImageNet
--method baseline --split novel``
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu import config as cfg_mod
from mft_tpu.data import registry
from mft_tpu.data.feature_store import save_features
from mft_tpu.data.pipeline import decode_image
from mft_tpu.models import backbone as bb
from mft_tpu.ops import augment as aug
from mft_tpu.utils import checkpoint as ckpt


def main(argv=None):
    a = cfg_mod.parse_args("save_features", argv)
    paths = cfg_mod.Paths.load(a.paths_json)
    bcfg = bb.MODEL_REGISTRY[a.model]()._replace(compute_dtype=a.dtype)

    d = cfg_mod.checkpoint_dir(
        paths, a.dataset, a.model, a.method, train_aug=a.train_aug,
        n_way=a.train_n_way if a.method not in ("baseline", "baseline++") else None,
        n_shot=a.n_shot,
    )
    path = ckpt.get_assigned_file(d, a.save_iter) if a.save_iter != -1 else ckpt.get_best_file(d)
    from mft_tpu.cli.finetune import _load_backbone_state

    params, stats = _load_backbone_state(path, bcfg)

    entry = registry.get(a.dataset)
    manifest = registry.build_manifest(entry, paths.as_dict(), split=a.split)

    @jax.jit
    def embed(x_u8):
        x = aug.center_batch(x_u8, a.image_size)
        feats, _ = bb.apply_backbone(params["feature"], stats, x, cfg=bcfg, train=False)
        return feats

    batch = 64
    feats_all, labels_all = [], []
    items = manifest.items
    for i in range(0, len(items), batch):
        chunk = items[i : i + batch]
        imgs = np.stack([decode_image(it, a.base_size) for it in chunk])
        pad = batch - len(chunk)
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        f = np.asarray(embed(jnp.asarray(imgs)))[: len(chunk)]
        feats_all.append(f)
        labels_all.append(manifest.labels[i : i + batch])
    out_dir = os.path.join(d.replace("checkpoints", "features"))
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{a.split}.npz")
    save_features(out, np.concatenate(feats_all), np.concatenate(labels_all))
    print(f"saved {sum(len(f) for f in feats_all)} features to {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
