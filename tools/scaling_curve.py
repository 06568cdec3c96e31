"""Virtual-device scaling curve of the sharded eval program (CPU).

Measures the 1->2->4->8 device throughput of the ``make_eval_program(mesh=...)``
shard_map path on the CPU backend (``--xla_force_host_platform_device_count``),
per VERDICT r4 missing #4: the v4-8 extrapolation in bench.py/PERF.md is
arithmetic from a zero-collective program (pinned from optimized HLO by
tests/test_parallel.py::test_eval_program_hlo_has_zero_collectives); this tool
measures the *structural* scaling cost of actually widening the mesh.

What a 1-core host can and cannot show: N virtual CPU devices time-share the
same core, so wall-clock per global batch should grow ~linearly with N if the
sharded program adds no cross-device overhead (perfect time-sharing).  The
reported ``efficiency`` is therefore

    efficiency(N) = N * T(1) / T(N)      (1.0 = sharding adds zero overhead)

which on real chips (each device its own core/HBM) becomes the usual linear-
scaling efficiency, because the only difference between the two settings is
whether the N per-device programs run serially or concurrently — the program
itself contains no cross-device communication either way.

Usage: python tools/scaling_curve.py [--devices 1,2,4,8] [--batches 3]
Prints one JSON line per mesh size, then a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES_PER_DEVICE = 2  # per-device episode lanes (CLI default semantics)


def child(n_devices: int, n_batches: int, fte: int, lin: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")  # beat the ambient JAX_PLATFORMS=axon
    import jax.numpy as jnp
    import numpy as np

    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.data import registry
    from mft_tpu.methods import gnnnet as gn
    from mft_tpu.models import backbone as bb
    from mft_tpu.parallel import mesh as pmesh
    from mft_tpu.train import eval_engine as ee

    assert len(jax.devices()) == n_devices, (len(jax.devices()), n_devices)
    spec = EpisodeSpec(3, 2, 3)
    # narrow widths: the scaling property under test (per-device program +
    # zero collectives) is width-independent, same rationale as
    # dryrun_multichip / the HLO test
    bcfg = bb.resnet10()._replace(widths=(8, 16, 32, 64))
    gcfg = gn.GnnNetCfg(feat_dim=bcfg.feat_dim, n_way=3, n_support=2)
    kb, kh = jax.random.split(jax.random.PRNGKey(0))
    feature, stats = jax.jit(lambda k: bb.init_backbone(k, bcfg))(kb)
    head = jax.jit(lambda k: gn.init_head(k, gcfg))(kh)
    acfg = registry.get("synthetic").eval_aug._replace(image_size=16)
    tcfg = ee.TransferCfg(fine_tune_epochs=fte, linear_epochs=lin)  # real inner scans
    mesh = pmesh.make_mesh()
    assert mesh.shape["data"] == n_devices
    prog = ee.make_eval_program(
        method="all", bcfg=bcfg, gcfg=gcfg, spec=spec, tcfg=tcfg, aug_cfg=acfg,
        gen_examples=1, mesh=mesh,
    )
    models = pmesh.replicate(
        mesh,
        {"baseline": (feature, stats), "gnn": (feature, stats, {"fc": head["fc"], "gnn": head["gnn"]})},
    )
    e_batch = LANES_PER_DEVICE * n_devices
    rs = np.random.RandomState(0)
    eps = (rs.rand(e_batch, 3, 5, 24, 24, 3) * 255).astype(np.uint8)
    eps = pmesh.shard_episode_batch(mesh, eps)
    keys = jax.random.split(jax.random.PRNGKey(1), e_batch)

    _ = np.asarray(prog(models, eps, keys)[1])  # compile + complete
    times = []
    for _ in range(n_batches):
        t0 = time.perf_counter()
        _ = np.asarray(prog(models, eps, keys)[1])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(json.dumps({"n_devices": n_devices, "global_batch": e_batch, "batch_s": dt, "n_batches": n_batches}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--batches", type=int, default=25)
    # the reference epoch counts (5/20) at tiny geometry: per-batch work large
    # enough that fixed per-dispatch overhead doesn't masquerade as sharding cost
    ap.add_argument("--fte", type=int, default=5)
    ap.add_argument("--lin", type=int, default=20)
    ap.add_argument("--child", type=int, default=0, help="internal: run one mesh size")
    a = ap.parse_args()
    if a.child:
        child(a.child, a.batches, a.fte, a.lin)
        return

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for n in [int(x) for x in a.devices.split(",")]:
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n} " + env.get("XLA_FLAGS", "")
        env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(repo, ".jax_cache"))
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n), "--batches", str(a.batches),
             "--fte", str(a.fte), "--lin", str(a.lin)],
            capture_output=True, text=True, env=env, cwd=repo, timeout=1800,
        )
        if out.returncode != 0:
            print(out.stdout)
            print(out.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"child n={n} failed rc={out.returncode}")
        row = json.loads(out.stdout.strip().splitlines()[-1])
        row["eps"] = row["global_batch"] / row["batch_s"]
        rows.append(row)
        print(json.dumps(row))

    print("\nn_devices  global_batch  s/batch   eps      efficiency (N*T1/TN)")
    for r in rows:
        eff = rows[0]["batch_s"] * (r["n_devices"] / rows[0]["n_devices"]) / r["batch_s"]
        r["efficiency"] = round(eff, 3)
        print(f"{r['n_devices']:9d}  {r['global_batch']:12d}  {r['batch_s']:7.2f}  {r['eps']:6.2f}   {eff:.3f}")
    print(json.dumps({"scaling_curve": rows}))


if __name__ == "__main__":
    main()
