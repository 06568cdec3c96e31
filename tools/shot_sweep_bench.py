"""Eval throughput across the reference's shot counts (5 / 20 / 50).

The headline bench (bench.py) fixes the 5-shot geometry; this sweeps the
other two CDFSL settings — 20-shot, and 50-shot with the compressed
130-node GNN (gnnnet_copy semantics) — through the same method=all eval
program, and reports ms/episode for docs/PERF.md.

Run on the TPU: ``python tools/shot_sweep_bench.py``
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
from mft_tpu.train import eval_engine as ee


def bench_shot(n_shot: int, eval_batch: int, n_measure: int, gen_examples: int = 17):
    spec = EpisodeSpec(5, n_shot, 15)
    bcfg = bb.resnet10()._replace(compute_dtype="bfloat16")
    gcfg = gn.GnnNetCfg(feat_dim=512, n_way=5, n_support=n_shot,
                        support_compress=2 if n_shot >= 50 else 1)
    tcfg = ee.TransferCfg(fine_tune_epochs=5, linear_epochs=20, inner_param_dtype="bfloat16")
    aug_cfg = registry.get("synthetic").eval_aug._replace(image_size=224)
    base = 256

    kb, kh = jax.random.split(jax.random.PRNGKey(0))
    feature, stats = jax.jit(lambda k: bb.init_backbone(k, bcfg))(kb)
    head = jax.jit(lambda k: gn.init_head(k, gcfg))(kh)
    models = {"baseline": (feature, stats), "gnn": (feature, stats, {"fc": head["fc"], "gnn": head["gnn"]})}

    program = ee.make_eval_program(
        method="all", bcfg=bcfg, gcfg=gcfg, spec=spec, tcfg=tcfg, aug_cfg=aug_cfg, gen_examples=gen_examples
    )

    @jax.jit
    def synth(key):
        kt, kn = jax.random.split(key)
        tint = jax.random.randint(kt, (eval_batch, 5, 1, 1, 1, 3), 0, 28, dtype=jnp.uint8)
        noise = jax.random.randint(kn, (eval_batch, 5, spec.n_per_class, base, base, 3), 0, 227, dtype=jnp.uint8)
        return tint + noise

    batch = jax.block_until_ready(synth(jax.random.PRNGKey(1)))
    key = jax.random.PRNGKey(2)
    key, k = jax.random.split(key)
    _ = np.asarray(program(models, batch, jax.random.split(k, eval_batch))[1])  # compile
    done = 0
    t0 = time.perf_counter()
    accs = []
    while done < n_measure:
        key, k = jax.random.split(key)
        _, acc = program(models, batch, jax.random.split(k, eval_batch))
        accs.append(acc)
        done += eval_batch
    _ = float(np.mean([np.asarray(a) for a in accs]))  # force completion
    dt = time.perf_counter() - t0
    return done / dt, dt / done * 1e3


def main():
    print("| setting | eval_batch | episodes/sec | ms/episode |")
    print("|---|---|---|---|")
    # per-shot eval_batch optima (late-r3 odd-size sweep: 5-shot 5 > 4,
    # 20-shot 5 > 4, 50-shot 3 > 2)
    for n_shot, eb, n in [(5, 5, 40), (20, 5, 20), (50, 3, 9)]:
        eps, ms = bench_shot(n_shot, eb, n)
        tag = f"{n_shot}-shot" + (" (compressed GNN)" if n_shot >= 50 else "")
        print(f"| {tag} | {eb} | {eps:.2f} | {ms:.0f} |")


if __name__ == "__main__":
    main()
