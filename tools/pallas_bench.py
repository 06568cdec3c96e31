"""Benchmark the fused Pallas edge kernel in its claimed payoff regime.

Round 1 shipped ops/pallas/edge_mlp.py but never measured it on the path it
was built for — the 130-node 50-shot graphs (VERDICT weak #7).  This times
the full GNN head forward (``gnn_scores``) with ``use_pallas`` on vs off at
both the 5-shot (30-node) and 50-shot-compressed (130-node) geometries, f32
(the kernel's dtype) and the bf16 XLA path for context.

Run on the TPU: ``python tools/pallas_bench.py``
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu.methods import gnnnet as gn


def bench_head(n_support: int, compress: int, use_pallas: bool, dtype, n_query: int = 15, e_batch: int = 8, iters: int = 20):
    cfg = gn.GnnNetCfg(feat_dim=512, n_way=5, n_support=n_support, support_compress=compress, use_pallas=use_pallas)
    head = jax.jit(lambda k: gn.init_head(k, cfg))(jax.random.PRNGKey(0))
    if dtype == jnp.bfloat16:
        head = jax.tree.map(lambda a: a.astype(jnp.bfloat16), head)
    z = jax.random.normal(jax.random.PRNGKey(1), (e_batch, 5, n_support + n_query, 512), dtype)

    fn = jax.jit(jax.vmap(lambda zi: gn.gnn_scores(head, zi, cfg, n_query)))
    out = np.asarray(fn(z))  # compile + complete
    assert np.isfinite(out).all()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(z)
    _ = np.asarray(out)  # force completion (block_until_ready unreliable via tunnel)
    dt = (time.perf_counter() - t0) / iters
    n_nodes = 5 * (cfg.eff_support + 1)
    return dt * 1e3, n_nodes


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print("| geometry | nodes | dtype | use_pallas | ms / 8-episode batch |")
    print("|---|---|---|---|---|")
    for n_support, compress, tag in [(5, 1, "5-shot"), (50, 2, "50-shot compressed")]:
        for dtype, dname in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
            for up in (False, True):
                if up and dtype == jnp.bfloat16:
                    continue  # kernel is f32-only on this toolchain
                ms, nodes = bench_head(n_support, compress, up, dtype)
                print(f"| {tag} | {nodes} | {dname} | {up} | {ms:.2f} |")


if __name__ == "__main__":
    main()
