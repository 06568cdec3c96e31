"""Training throughput across the episode-batch axis E.

``--episode_batch`` is the TPU-native data-parallel knob the reference does
not have: E>1 averages the loss (and therefore the gradient) over E episodes
per Adam step, which is a *semantics-visible* change from the reference's
one-episode-per-step schedule (train.py:27-42) — so the default stays E=1
for parity and this sweep only documents the throughput trade, per-chip.
On a multi-chip mesh the same axis shards across devices (parallel/mesh.py),
so the per-chip knee here is the per-device batch to feed pjit with.

Run on the TPU: ``python tools/train_batch_sweep.py``
"""

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
from mft_tpu.data import registry
from mft_tpu.methods import gnnnet as gn
from mft_tpu.models import backbone as bb
from mft_tpu.ops import augment as aug
from mft_tpu.train import optimizers as opt
from mft_tpu.train import steps


def bench_stage(stage: str, e_batch: int, n_measure: int):
    spec = EpisodeSpec(5, 5, 16)  # the training geometry (train.py:112-119)
    bcfg = bb.resnet10()._replace(compute_dtype="bfloat16")
    gcfg = gn.GnnNetCfg(feat_dim=512, n_way=5, n_support=5)
    aug_cfg = registry.get("synthetic").train_aug._replace(image_size=224)
    mcfg = steps.MetaFinetuneCfg(epochs=15, batch_size=4)
    dt = aug.pipeline_dtype(bcfg.compute_dtype)
    base = 256

    kb, kh = jax.random.split(jax.random.PRNGKey(0))
    feature, stats = jax.jit(lambda k: bb.init_backbone(k, bcfg))(kb)
    head = jax.jit(lambda k: gn.init_head(k, gcfg))(kh)
    params = {"feature": feature, "fc": head["fc"], "gnn": head["gnn"]}
    tx = opt.torch_adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, base_eps, key):
        k_aug, k_step = jax.random.split(key)
        x = aug.augment_batch(k_aug, base_eps, aug_cfg, dtype=dt)
        if stage == "meta_finetune":
            return steps.meta_finetune_train_step(
                params, stats, opt_state, x, k_step,
                method="gnnnet", bcfg=bcfg, gcfg=gcfg, spec=spec, mcfg=mcfg, tx=tx,
            )
        return steps.episodic_train_step(
            params, stats, opt_state, x, k_step,
            method="gnnnet", bcfg=bcfg, gcfg=gcfg, spec=spec, tx=tx,
        )

    @jax.jit
    def synth(key):
        return jax.random.randint(
            key, (e_batch, spec.n_way, spec.n_per_class, base, base, 3), 0, 255, dtype=jnp.uint8
        )

    eps = jax.block_until_ready(synth(jax.random.PRNGKey(1)))
    key = jax.random.PRNGKey(2)
    key, k = jax.random.split(key)
    params, stats, opt_state, m = step(params, stats, opt_state, eps, k)  # compile
    _ = float(m["loss"])
    done = 0
    t0 = time.perf_counter()
    while done < n_measure:
        key, k = jax.random.split(key)
        params, stats, opt_state, m = step(params, stats, opt_state, eps, k)
        done += e_batch
    _ = float(m["loss"])  # forces completion through the tunnel
    dt_s = time.perf_counter() - t0
    return done / dt_s


def main():
    print("| stage | E | episodes/sec |")
    print("|---|---|---|")
    for stage, batches, n in [
        ("episodic", (1, 2, 4, 8, 12, 16), 96),
        ("meta_finetune", (1, 4, 8, 12), 48),
    ]:
        for e in batches:
            eps_s = bench_stage(stage, e, max(n, e * 4))
            print(f"| {stage} | {e} | {eps_s:.1f} |", flush=True)


if __name__ == "__main__":
    main()
