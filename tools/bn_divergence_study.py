"""Quantify the episode-vs-minibatch BN divergence of the eval engine.

The fast eval path (``bn_mode='episode'``) precomputes frozen-trunk features
once per support bank; the bit-faithful path (``bn_mode='minibatch'``) reruns
the full backbone — and hence recomputes trunk batch statistics — for every
inner minibatch exactly as reference finetune.py:286 does.  This script
measures what that approximation costs: it meta-trains a GnnNet on synthetic
data, evaluates the SAME N episodes with the SAME keys under both modes, and
reports mean-accuracy delta, per-query argmax agreement, and score
correlation.  Results are recorded in docs/PERF.md; the CPU regression bound
lives in tests/test_eval_engine.py.

Run (TPU): ``python tools/bn_divergence_study.py --eval_episodes 120``
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

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


def train_models(a):
    """Quick synthetic pretrain + meta-train (the synthetic_pipeline recipe,
    shortened).  Returns (models dict, bcfg, gcfg, eval manifest)."""
    man = manifests.synthetic(n_classes=12, per_class=40, base_size=a.base_size, seed=3, tint=a.tint)
    bcfg = bb.resnet10()._replace(compute_dtype="bfloat16")
    acfg = registry.get("synthetic").train_aug._replace(image_size=a.image_size)
    rng = jax.random.PRNGKey(1)

    kb, kc = jax.random.split(jax.random.PRNGKey(0))
    feat_b, stats_b = jax.jit(lambda k: bb.init_backbone(k, bcfg))(kb)
    params_b = {"feature": feat_b, "classifier": init_classifier(kc, 512, 12)}
    txb = opt.torch_adam(1e-3)
    ob = txb.init(params_b)

    @jax.jit
    def bstep(p, s, o, x, y, key):
        return steps.baseline_train_step(p, s, o, aug.augment_batch(key, x, acfg), y, bcfg=bcfg, tx=txb)

    t0 = time.time()
    for i, (bx, by) in enumerate(BatchStream(man, 64, a.pretrain_steps, base_size=a.base_size, seed=5)):
        rng, k = jax.random.split(rng)
        params_b, stats_b, ob, m = bstep(params_b, stats_b, ob, jnp.asarray(bx), jnp.asarray(by), k)
    print(f"pretrain done ({time.time()-t0:.0f}s, top1 {float(m['top1']):.2f})", file=sys.stderr)

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

    E = 8
    t0 = time.time()
    for epoch in range(a.train_steps):
        eps = np.stack([im for im, _ in EpisodeStream(man, spec, E, base_size=a.base_size, seed=1000 + epoch)])
        rng, k = jax.random.split(rng)
        params_g, stats_g, og, m = gstep(params_g, stats_g, og, jnp.asarray(eps), k)
        if epoch % 50 == 0:
            print(f"  meta step {epoch}: loss {float(m['loss']):.3f}", file=sys.stderr)
    print(f"meta-train done ({time.time()-t0:.0f}s)", file=sys.stderr)

    models = {
        "baseline": (params_b["feature"], stats_b),
        "gnn": (params_g["feature"], stats_g, {"fc": params_g["fc"], "gnn": params_g["gnn"]}),
    }
    eman = manifests.synthetic(n_classes=12, per_class=40, base_size=a.base_size, seed=99, tint=a.tint)
    return models, bcfg, gcfg, eman


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain_steps", type=int, default=300)
    ap.add_argument("--train_steps", type=int, default=150)
    ap.add_argument("--eval_episodes", type=int, default=120)
    ap.add_argument("--eval_batch", type=int, default=4)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--base_size", type=int, default=256)
    ap.add_argument("--tint", type=float, default=0.2, help="class separability (non-vacuous accuracy)")
    ap.add_argument("--gen_examples", type=int, default=17)
    a = ap.parse_args()

    models, bcfg, gcfg, eman = train_models(a)
    spec = EpisodeSpec(5, 5, 15)
    e_acfg = registry.get("synthetic").eval_aug._replace(image_size=a.image_size)

    progs = {}
    for mode in ("episode", "minibatch"):
        tcfg = ee.TransferCfg(fine_tune_epochs=5, linear_epochs=20, bn_mode=mode)
        progs[mode] = ee.make_eval_program(
            method="all", bcfg=bcfg, gcfg=gcfg, spec=spec, tcfg=tcfg, aug_cfg=e_acfg,
            gen_examples=a.gen_examples,
        )

    E = a.eval_batch
    n_batches = a.eval_episodes // E
    out = {m: {"acc": [], "scores": [], "t": 0.0} for m in progs}
    for b in range(n_batches):
        eps = np.stack([im for im, _ in EpisodeStream(eman, spec, E, base_size=a.base_size, seed=70 + b)])
        keys = jax.random.split(jax.random.PRNGKey(300 + b), E)
        for mode, prog in progs.items():
            t0 = time.time()
            scores, acc = prog(models, jnp.asarray(eps), keys)
            scores, acc = np.asarray(scores), np.asarray(acc)  # forces completion
            out[mode]["t"] += time.time() - t0
            out[mode]["acc"].extend(acc.tolist())
            out[mode]["scores"].append(scores)
        if b % 5 == 0:
            print(f"batch {b}/{n_batches}", file=sys.stderr)

    res = {}
    for mode in progs:
        accs = np.asarray(out[mode]["acc"])
        res[mode] = (ee.mean_ci95(accs), np.concatenate(out[mode]["scores"], axis=0))
    (m_e, ci_e), s_e = res["episode"]
    (m_m, ci_m), s_m = res["minibatch"]
    agree = float(np.mean(s_e.reshape(-1, spec.n_way).argmax(1) == s_m.reshape(-1, spec.n_way).argmax(1)))
    corr = float(np.corrcoef(s_e.ravel(), s_m.ravel())[0, 1])
    n = len(out["episode"]["acc"])
    print(f"episodes={n} gen_examples={a.gen_examples} tint={a.tint}")
    print(f"episode   mode: acc {m_e:.2f} +- {ci_e:.2f}  ({n/out['episode']['t']:.2f} eps/s)")
    print(f"minibatch mode: acc {m_m:.2f} +- {ci_m:.2f}  ({n/out['minibatch']['t']:.2f} eps/s)")
    print(f"mean-acc delta: {m_e - m_m:+.2f} pp")
    print(f"per-query argmax agreement: {100*agree:.2f}%")
    print(f"score Pearson r: {corr:.4f}")


if __name__ == "__main__":
    main()
