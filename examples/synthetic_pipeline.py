"""End-to-end pipeline demonstration on synthetic data (no datasets needed).

Reproduces the full reference capability chain on one chip in ~5 minutes:

1. supervised baseline pretraining (train.py --method baseline),
2. episodic GnnNet meta-training (train.py --method gnnnet) — expect the
   learned-adjacency head to sit at a chance-level plateau for ~800
   episodes before converging,
3. the meta fine-tuning stage (train.py --fine_tune, FO-MAML inner loops),
4. the headline ensemble eval (finetune.py --method all) with 17 augmented
   support replicas and per-episode transfer fine-tuning, on episodes from
   HELD-OUT synthetic classes.

Measured on a TPU v5e: phase 2 reaches loss ~0.12 after 1,880 episodes and
the phase-4 ensemble scores 100.00% +- 0.00 over 32 held-out episodes
(docs/PERF.md "Full-pipeline demonstration").

Run: ``python examples/synthetic_pipeline.py [--steps 188]``
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu.core.episode import EpisodeSpec
from mft_tpu.data import manifests, registry
from mft_tpu.data.pipeline import BatchStream, EpisodeStream
from mft_tpu.methods import gnnnet as gn
from mft_tpu.methods.baseline import init_classifier
from mft_tpu.models import backbone as bb
from mft_tpu.ops import augment as aug
from mft_tpu.train import eval_engine as ee
from mft_tpu.train import optimizers as opt
from mft_tpu.train import steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=188, help="episodic meta-training steps (x8 episodes)")
    ap.add_argument("--image_size", type=int, default=64)
    a = ap.parse_args()

    IMG, BASE, E = a.image_size, 96, 8
    man = manifests.synthetic(n_classes=12, per_class=40, base_size=BASE, seed=3)
    bcfg = bb.resnet10()._replace(compute_dtype="bfloat16")
    acfg = registry.get("synthetic").train_aug._replace(image_size=IMG)
    rng = jax.random.PRNGKey(1)

    # -- 1. baseline pretraining ------------------------------------------
    print("[1/4] baseline pretraining")
    kb, kc = jax.random.split(jax.random.PRNGKey(0))
    feat_b, stats_b = jax.jit(lambda k: bb.init_backbone(k, bcfg))(kb)
    params_b = {"feature": feat_b, "classifier": init_classifier(kc, 512, 12)}
    txb = opt.torch_adam(1e-3)
    ob = txb.init(params_b)

    @jax.jit
    def bstep(p, s, o, x, y, key):
        return steps.baseline_train_step(p, s, o, aug.augment_batch(key, x, acfg), y, bcfg=bcfg, tx=txb)

    for i, (bx, by) in enumerate(BatchStream(man, 64, 600, base_size=BASE, seed=5)):
        rng, k = jax.random.split(rng)
        params_b, stats_b, ob, m = bstep(params_b, stats_b, ob, jnp.asarray(bx), jnp.asarray(by), k)
        if i % 150 == 0:
            print(f"  step {i}: loss {float(m['loss']):.3f} top1 {float(m['top1']):.2f}")

    # -- 2. episodic meta-training ----------------------------------------
    print("[2/4] episodic GnnNet meta-training")
    spec = EpisodeSpec(5, 5, 8)
    gcfg = gn.GnnNetCfg(feat_dim=512, n_way=5, n_support=5)
    head = jax.jit(lambda k: gn.init_head(k, gcfg))(jax.random.PRNGKey(2))
    params_g = {"feature": jax.tree.map(jnp.copy, params_b["feature"]), "fc": head["fc"], "gnn": head["gnn"]}
    stats_g = jax.tree.map(jnp.copy, stats_b)
    txg = opt.torch_adam(1e-3)
    og = txg.init(params_g)

    @jax.jit
    def gstep(p, s, o, eps, key):
        k1, k2 = jax.random.split(key)
        x = aug.augment_batch(k1, eps, acfg)
        return steps.episodic_train_step(p, s, o, x, k2, method="gnnnet", bcfg=bcfg, gcfg=gcfg, spec=spec, tx=txg)

    t0 = time.time()
    for epoch in range(a.steps):
        eps = np.stack([im for im, _ in EpisodeStream(man, spec, E, base_size=BASE, seed=1000 + epoch)])
        rng, k = jax.random.split(rng)
        params_g, stats_g, og, m = gstep(params_g, stats_g, og, jnp.asarray(eps), k)
        if epoch % 25 == 0:
            print(f"  step {epoch} ({epoch*E} episodes): loss {float(m['loss']):.3f} ({time.time()-t0:.0f}s)")

    # -- 3. meta fine-tuning stage ----------------------------------------
    print("[3/4] meta fine-tuning (FO-MAML)")
    mcfg = steps.MetaFinetuneCfg(epochs=15, batch_size=4)

    @jax.jit
    def mstep(p, s, o, eps, key):
        k1, k2 = jax.random.split(key)
        x = aug.augment_batch(k1, eps, acfg)
        return steps.meta_finetune_train_step(
            p, s, o, x, k2, method="gnnnet", bcfg=bcfg, gcfg=gcfg, spec=spec, mcfg=mcfg, tx=txg
        )

    for epoch in range(40):
        eps = np.stack([im for im, _ in EpisodeStream(man, spec, E, base_size=BASE, seed=5000 + epoch)])
        rng, k = jax.random.split(rng)
        params_g, stats_g, og, m = mstep(params_g, stats_g, og, jnp.asarray(eps), k)
        if epoch % 20 == 0:
            print(f"  step {epoch}: loss {float(m['loss']):.3f}")

    # -- 4. held-out ensemble eval ----------------------------------------
    print("[4/4] method=all ensemble eval on held-out classes")
    eval_spec = EpisodeSpec(5, 5, 15)
    e_acfg = registry.get("synthetic").eval_aug._replace(image_size=IMG)
    tcfg = ee.TransferCfg(fine_tune_epochs=5, linear_epochs=20)
    prog = ee.make_eval_program(
        method="all", bcfg=bcfg, gcfg=gcfg, spec=eval_spec, tcfg=tcfg, aug_cfg=e_acfg, gen_examples=17
    )
    models = {
        "baseline": (params_b["feature"], stats_b),
        "gnn": (params_g["feature"], stats_g, {"fc": params_g["fc"], "gnn": params_g["gnn"]}),
    }
    eman = manifests.synthetic(n_classes=12, per_class=40, base_size=BASE, seed=99)  # held-out tints
    accs = []
    for b in range(8):
        eps = np.stack([im for im, _ in EpisodeStream(eman, eval_spec, 4, base_size=BASE, seed=70 + b)])
        _, acc = prog(models, jnp.asarray(eps), jax.random.split(jax.random.PRNGKey(300 + b), 4))
        accs.extend(np.asarray(acc).tolist())
    mean, ci = ee.mean_ci95(np.asarray(accs))
    print("%d Test Acc = %4.2f%% +- %4.2f%%" % (len(accs), mean, ci))


if __name__ == "__main__":
    main()
