"""Achieved HBM bandwidth of the two inner scans vs the chip peak.

VERDICT r4 weak #1: PERF.md claims the headline eval's inner scans sit at
the HBM state-traffic floor but never states achieved GB/s vs peak, so the
claim can't be checked from the doc.  This tool measures it:

* times the two scans STANDALONE at exactly the headline geometry and
  dtypes — ``_adapt_block`` is the very function ``make_eval_program``
  calls; it is fed a synthetic feature bank of the in-program shape
  ([bank, 14, 14, 256] bf16) and vmapped over ``eval_batch`` lanes, so the
  compiled scan is the one the program runs,
* computes the per-step HBM *state* traffic floor analytically from the
  concrete adapted trees: Adam must read and write params, mu, and nu, and
  the backward must write grads that Adam reads — 8x the adapted-state
  bytes per step per lane (params/mu/nu all bf16 under the bench defaults).
  Bank-row gathers (+0.5 MB/step/lane) and forward/backward activations
  are listed separately as an estimate; they are NOT in the floor, so
  ``achieved >= floor_bytes/time`` is a lower bound on real bandwidth use.

Run on the TPU (default platform).  Prints a JSON line per scan and a
summary.  HBM peak defaults to the v5e's 819 GB/s (override --peak_gbps).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--peak_gbps", type=float, default=819.0, help="HBM peak (v5e: 819 GB/s)")
    ap.add_argument("--eval_batch", type=int, default=5)
    ap.add_argument("--iters", type=int, default=5)
    a = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(repo, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.methods import gnnnet as gn
    from mft_tpu.models import backbone as bb
    from mft_tpu.train import eval_engine as ee

    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0].device_kind})")
    spec = EpisodeSpec(n_way=5, n_support=5, n_query=15)
    gen_examples = 17
    bcfg = bb.resnet10()._replace(compute_dtype="bfloat16")
    gcfg = gn.GnnNetCfg(feat_dim=512, n_way=5, n_support=5)
    tcfg = ee.TransferCfg()  # bench/CLI fast-path defaults: bf16 carry + bf16 moments
    tcfg = tcfg._replace(inner_param_dtype="bfloat16")
    kb, kh = jax.random.split(jax.random.PRNGKey(0))
    feature, _stats = jax.jit(lambda k: bb.init_backbone(k, bcfg))(kb)
    stats = _stats
    _, block_p = bb.adapt_split(feature)

    def tree_bytes(tree, dtype_bytes=2):
        return sum(int(np.prod(l.shape)) * dtype_bytes for l in jax.tree.leaves(tree))

    # fmap geometry entering the final block: 224 -> stem /4 -> 56 -> three
    # strided blocks -> 14x14 x widths[-2]
    fdim, fch = 14, bcfg.widths[-2]
    lanes = a.eval_batch

    def synth_bank(rows, key):
        return jax.random.normal(key, (lanes, rows, fdim, fdim, fch), jnp.bfloat16)

    results = []

    def run_scan(name, *, epochs, rows, span, head):
        bank_y = ee.bank_labels(spec, rows // spec.support_size)
        steps_per_epoch = -(-span // tcfg.batch_size)
        n_steps = epochs * steps_per_epoch

        def one_lane(fmap, key):
            blk, hd = ee._adapt_block(
                feature, stats, bank_y, key,
                bcfg=bcfg, tcfg=tcfg, epochs=epochs, head=head,
                perm_span=span if span != rows else None, fmap_bank=fmap,
            )
            out = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(blk))
            if hd is not None:
                out += sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(hd))
            return out

        fn = jax.jit(jax.vmap(one_lane))
        bank = jax.block_until_ready(synth_bank(rows, jax.random.PRNGKey(7)))
        keys = jax.random.split(jax.random.PRNGKey(3), lanes)
        _ = float(np.asarray(fn(bank, keys)).sum())  # compile + complete
        # dispatch all iterations, then force ONE sync: the host->device
        # tunnel's per-sync latency (~10 ms) would otherwise masquerade as
        # scan time — 25% of the linear member's 64 ms call, <5% of the GNN's
        t0 = time.perf_counter()
        outs = [fn(bank, keys) for _ in range(a.iters)]
        _ = [float(np.asarray(o).sum()) for o in outs]
        dt = (time.perf_counter() - t0) / a.iters

        # analytic per-step state floor: params r+w, mu r+w, nu r+w, grads w+r
        state = tree_bytes(block_p) + (tree_bytes(head) if head is not None else 0)
        floor_step_lane = 8 * state
        bank_row_bytes = tcfg.batch_size * fdim * fdim * fch * 2
        floor_total = floor_step_lane * n_steps * lanes
        achieved = floor_total / dt / 1e9
        row = {
            "scan": name, "n_steps": n_steps, "lanes": lanes,
            "wall_s_per_call": round(dt, 4),
            "ms_per_step": round(dt / n_steps * 1e3, 4),
            "adapted_state_mb_per_lane": round(3 * state / 1e6, 2),
            "state_floor_bytes_per_step_per_lane": floor_step_lane,
            "bank_gather_bytes_per_step_per_lane": bank_row_bytes,
            "achieved_state_gbps": round(achieved, 1),
            "peak_gbps": a.peak_gbps,
            "pct_of_peak": round(100 * achieved / a.peak_gbps, 1),
        }
        results.append(row)
        print(json.dumps(row))

    # GNN member: 5 epochs x ceil(500/5) = 500 steps over the full 20-replica bank
    run_scan("gnn_member", epochs=tcfg.fine_tune_epochs, rows=spec.support_size * (gen_examples + 3),
             span=spec.support_size * (gen_examples + 3), head=None)
    # linear member: 20 epochs x ceil(25/5) = 100 steps, clean-support-only span
    head0 = ee.init_classifier(kh, bcfg.feat_dim, spec.n_way, zero_bias=False)
    head0 = jax.tree.map(lambda t: t.astype(jnp.bfloat16), head0)
    run_scan("linear_member", epochs=tcfg.linear_epochs, rows=spec.support_size, span=spec.support_size,
             head=head0)

    total_t = sum(r["wall_s_per_call"] for r in results)
    total_b = sum(r["state_floor_bytes_per_step_per_lane"] * r["n_steps"] * r["lanes"] for r in results)
    print(json.dumps({
        "combined_scan_wall_s": round(total_t, 4),
        "combined_achieved_state_gbps": round(total_b / total_t / 1e9, 1),
        "pct_of_peak": round(100 * total_b / total_t / 1e9 / a.peak_gbps, 1),
    }))


if __name__ == "__main__":
    main()
