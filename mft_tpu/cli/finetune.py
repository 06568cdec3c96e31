"""Cross-domain evaluation driver — capability parity with reference
finetune.py (the headline entry point).

For each of ``--iter_num`` (600) episodes of the test dataset: fan the
support set out into ``gen_examples`` augmented replicas (+ the triple
clean copy), transfer-fine-tune the pretrained backbone's last block, score
with the requested head, and report mean accuracy ± 1.96·std/√n
(finetune.py:424-682).

TPU-native: episodes are evaluated in batches of ``--eval_batch`` — the
augment fan-out, the scan-based fine-tune, and the head all fuse into one
jitted program vmapped over episodes and sharded over the device mesh.
That batching is the ≥20x speedup over the reference's serial
per-episode loop + 19x single-threaded re-decode.

Run: ``python -m mft_tpu.cli.finetune --method all --test_dataset
CropDisease --n_shot 5 --train_aug --save_iter 600 --fine_tune_epoch 5
--gen_examples 17``
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu import config as cfg_mod
from mft_tpu.core.episode import EpisodeSpec
from mft_tpu.data import registry
from mft_tpu.data.pipeline import EpisodeStream
from mft_tpu.methods import gnnnet as gn
from mft_tpu.models import backbone as bb
from mft_tpu.parallel import mesh as pmesh
from mft_tpu.train import eval_engine as ee
from mft_tpu.utils import checkpoint as ckpt
from mft_tpu.utils.metrics import MetricLogger


def _load_backbone_state(path: str, bcfg, template_extra=None):
    """Load a training checkpoint and return (backbone_params, stats[, extra]).

    Mirrors the reference's state surgery: eval rebuilds a bare backbone from
    the ``feature.*`` keys and drops the head / FO-MAML bookkeeping
    (finetune.py:187-198,506-512) — here the checkpoint is a structured
    pytree so this is a simple field selection.

    Loading is STRICT: a checkpoint missing the ``params``/``stats`` trees
    (or with a mismatched tree structure) raises instead of silently keeping
    template-initialized values — torch ``load_state_dict`` fails loudly on
    state-dict mismatch (reference finetune.py:61,198) and so do we.
    """
    feature, stats = bb.init_backbone(jax.random.PRNGKey(0), bcfg)
    like_params = {"feature": feature}
    if template_extra:
        like_params.update(template_extra)
    import flax.serialization as ser

    with open(path, "rb") as f:
        raw = ser.msgpack_restore(f.read())
    missing = [k for k in ("params", "stats") if not isinstance(raw, dict) or k not in raw]
    if missing:
        raise ValueError(
            f"checkpoint {path!r} is missing required tree(s) {missing}; "
            "refusing to eval with template-initialized values"
        )
    params = ser.from_state_dict(like_params, raw["params"])
    stats = ser.from_state_dict(stats, raw["stats"])
    return params, stats


def build_models(a, paths, bcfg, gcfg):
    """Resolve + load the checkpoints the method needs (finetune.py:439-550).

    The reference hardcodes pretrained_dataset='miniImageNet'
    (finetune.py:431); here it is ``--dataset``, which defaults to
    miniImageNet."""
    models = {}
    pretrained_dataset = a.dataset
    if a.method in ("all", "baseline"):
        d = cfg_mod.checkpoint_dir(paths, pretrained_dataset, a.model, "baseline", train_aug=a.train_aug)
        path = ckpt.get_assigned_file(d, 400) if a.save_iter != -1 else ckpt.get_resume_file(d)
        p, s = _load_backbone_state(path, bcfg)
        models["baseline"] = (p["feature"], s)
    if a.method.startswith("dampnet"):
        from mft_tpu.methods import dampnet as dn

        if a.method == "dampnet":  # the prototype variant (reference methods/dampnet.py)
            dcfg = dn.prototype_cfg(bcfg.feat_dim, a.test_n_way, a.n_shot)
        else:
            dcfg = dn.DampNetCfg(
                feat_dim=bcfg.feat_dim, n_way=a.test_n_way, n_support=a.n_shot,
                stat="class" if a.method == "dampnet_full_class" else "support",
            )
        d = cfg_mod.checkpoint_dir(
            paths, pretrained_dataset, a.model, a.method, train_aug=a.train_aug,
            n_way=a.train_n_way, n_shot=a.n_shot,
        )
        path = ckpt.get_assigned_file(d, a.save_iter) if a.save_iter != -1 else ckpt.get_best_file(d)
        import flax.serialization as ser

        dparams_tmpl, dstate_tmpl = dn.init_dampnet(jax.random.PRNGKey(0), dcfg)
        feature, stats = bb.init_backbone(jax.random.PRNGKey(0), bcfg)
        with open(path, "rb") as f:
            raw = ser.msgpack_restore(f.read())
        missing = [k for k in ("params", "stats", "damp_state") if not isinstance(raw, dict) or k not in raw]
        if missing:
            raise ValueError(
                f"dampnet checkpoint {path!r} is missing required tree(s) {missing}; "
                "refusing to eval with template-initialized values"
            )
        full = ser.from_state_dict({"feature": feature, **dparams_tmpl}, raw["params"])
        stats = ser.from_state_dict(stats, raw["stats"])
        dstate = ser.from_state_dict(dstate_tmpl, raw["damp_state"])
        dparams = {k: v for k, v in full.items() if k != "feature"}
        models["dampnet"] = (full["feature"], stats, dparams, dstate)
        models["_dcfg"] = dcfg
    if a.method in ("all", "gnnnet", "gnnnet_maml", "protonet"):
        method_name = "gnnnet" if a.method == "all" else a.method
        # reference quirk: the method=all dispatch appends '_aug' to the GNN
        # checkpoint dir UNCONDITIONALLY and pins epoch 600, while the
        # baseline dir is train_aug-gated and pinned to 400
        # (finetune.py:473-480,516-523)
        d = cfg_mod.checkpoint_dir(
            paths, pretrained_dataset, a.model, method_name,
            train_aug=True if a.method == "all" else a.train_aug,
            n_way=a.train_n_way, n_shot=a.n_shot,
        )
        it = 600 if a.method == "all" else a.save_iter
        path = ckpt.get_assigned_file(d, it) if it != -1 else ckpt.get_best_file(d)
        head_tmpl = gn.init_head(jax.random.PRNGKey(0), gcfg)
        p, s = _load_backbone_state(path, bcfg, template_extra={"fc": head_tmpl["fc"], "gnn": head_tmpl["gnn"]})
        head = {"fc": p["fc"], "gnn": p["gnn"]} if a.method != "protonet" else head_tmpl
        models["gnn"] = (p["feature"], s, head)
    return models


def sweep_features(a, paths, dataset_name, backbone_params, backbone_stats, bcfg, *, n_images: int = -1,
                   batch: int = 64, order: list | None = None):
    """Embed center views of ``dataset_name`` through the backbone ->
    features [N, feat].

    ``n_images=-1`` (default) sweeps the full dataset — reference parity:
    the dampnet prototype precompute iterates the entire miniImageNet base
    set (finetune_50.py:591-622).  A positive value subsamples ``n_images``
    evenly-spaced images (``--sweep_images``; a statistical deviation,
    useful on slow hosts).

    ``order``: explicit sweep composition — paths (relative to the
    dataset's configured root) swept in exactly this order.  The replay
    instrument for whole-driver parity: the backbone embeds in train mode,
    so per-batch BN statistics depend on which images share a batch of 64;
    replaying the reference's recorded shuffle order reproduces its
    prototype features (tools/run_reference_e2e.py ``sweep_order``).

    Streaming: images are decoded on a thread pool and embedded one
    ``batch`` at a time (default 64 — the reference's own sweep batch,
    finetune_50.py:592, so per-batch BN statistics match), with only one
    decoded batch and the [N, feat] feature matrix ever resident — a
    38k-image miniImageNet sweep never materializes as a multi-GB tensor."""
    import concurrent.futures as cf

    from mft_tpu.data.pipeline import decode_image
    from mft_tpu.ops import augment as aug

    if order is not None:
        root = paths.as_dict()[dataset_name]
        items = [os.path.join(root, p) for p in order]
        idx = np.arange(len(items), dtype=np.int64)
    else:
        entry_s = registry.get(dataset_name)
        manifest_s = registry.build_manifest(entry_s, paths.as_dict())
        items = manifest_s.items
        cap = len(manifest_s) if n_images is None or n_images < 0 else min(n_images, len(manifest_s))
        idx = np.linspace(0, len(manifest_s) - 1, cap).astype(np.int64)
    n_real = len(idx)

    @jax.jit
    def embed(params, stats, x_u8):
        x = aug.center_batch(x_u8, a.image_size)
        return bb.apply_backbone(params, stats, x, cfg=bcfg, train=True)[0]

    out = []
    with cf.ThreadPoolExecutor(16) as pool:
        for start in range(0, n_real, batch):
            sel = idx[start : start + batch]
            imgs = np.stack(list(pool.map(lambda i: decode_image(items[i], a.base_size), sel)))
            # the ragged last batch keeps its true size (one extra compile):
            # padding would perturb its BN batch statistics vs the
            # reference's own ragged final loader batch
            out.append(np.asarray(embed(backbone_params, backbone_stats, jnp.asarray(imgs))))
    return jnp.asarray(np.concatenate(out))


def compute_unsup_stats(a, paths, backbone_params, backbone_stats, bcfg, *, n_images: int = -1):
    """Feature mean/std of an unlabeled dataset for the dampnet ``unsup``
    recovery path (reference set_forward_unsup, dampnet_full.py:298-348:
    ``x_u_mean/x_u_std`` are supplied from an external unlabeled sweep)."""
    feats = sweep_features(a, paths, a.unsupervised, backbone_params, backbone_stats, bcfg, n_images=n_images)
    # ddof=1: torch .std default (unbiased) — matches every analogous
    # statistic in methods/dampnet.py (update_prototypes/episode_stats)
    return jnp.mean(feats, axis=0), jnp.std(feats, axis=0, ddof=1)


def plan_eval_mesh(eval_batch_per_chip: int):
    """(mesh, global episode batch) for the eval loop.

    ``--eval_batch`` is the PER-CHIP lane count (5 = measured single-chip
    optimum, docs/PERF.md); the episode axis always spans every device, so
    the global batch scales with the mesh — on a v4-8 the 600-episode eval
    runs ``8 * eval_batch`` lanes wide.  (The per-chip lane optimum and the
    data-axis width are independent quantities; composing them, e.g. via
    ``gcd``, is wrong — it would park a v4-8 eval on one chip.)  The last
    batch is padded up to the global size and the padded accuracies dropped.
    """
    n_dev = len(jax.devices())
    return pmesh.make_mesh(n_data=n_dev), eval_batch_per_chip * n_dev


def evaluate(a, models, entry, manifest, *, bcfg, gcfg, spec, logger=None):
    """Run the episode loop; returns (acc_mean, ci95, acc_all, eps_per_sec)."""
    aug_cfg = entry.eval_aug._replace(image_size=a.image_size)
    tcfg = ee.TransferCfg(
        fine_tune_epochs=a.fine_tune_epoch, bn_mode=a.bn_mode, freeze_backbone=a.freeze_backbone,
        inner_param_dtype=a.inner_param_dtype,
    )
    dcfg = models.pop("_dcfg", None)
    mesh, e_batch = plan_eval_mesh(a.eval_batch)
    program = ee.make_eval_program(
        method=a.method, bcfg=bcfg, gcfg=gcfg, spec=spec, tcfg=tcfg, aug_cfg=aug_cfg,
        gen_examples=a.gen_examples, dcfg=dcfg, dampnet_eval=getattr(a, "dampnet_eval", "finetune"),
        mesh=mesh,
    )
    # replicate model trees across the mesh (episode-parallel eval: params
    # identical on every chip, episodes sharded)
    models = pmesh.replicate(mesh, models)
    if getattr(a, "episode_manifest", None):
        from mft_tpu.data.pipeline import ReplayEpisodeStream

        stream = ReplayEpisodeStream.from_json(
            a.episode_manifest, spec, base_size=a.base_size, root=a.episode_manifest_root
        )
        a.iter_num = len(stream)
        print(f"replaying {a.iter_num} recorded episodes from {a.episode_manifest}")
    else:
        stream = EpisodeStream(manifest, spec, a.iter_num, base_size=a.base_size, seed=a.seed,
                               cache_dir=a.episode_cache)

    acc_all = []
    key = jax.random.PRNGKey(a.seed)
    it = iter(stream)
    n_batches = (a.iter_num + e_batch - 1) // e_batch
    t_compute = 0.0
    done = 0
    for b in range(n_batches):
        eps = []
        for _ in range(min(e_batch, a.iter_num - done)):
            eps.append(next(it)[0])
        n_real = len(eps)
        while len(eps) < e_batch:  # pad the last batch; padded accs dropped
            eps.append(eps[-1])
        base = pmesh.shard_episode_batch(mesh, np.stack(eps))
        key, k = jax.random.split(key)
        keys = jax.random.split(k, e_batch)
        t0 = time.perf_counter()
        _, acc = jax.block_until_ready(program(models, base, keys))
        t_compute += time.perf_counter() - t0
        batch_accs = np.asarray(acc)[:n_real]
        acc_all.extend(batch_accs.tolist())
        done += n_real
        for j, v in enumerate(batch_accs):
            print(float(v))  # per-episode accuracy (reference finetune.py:631)
            if logger:
                logger._write({"kind": "episode", "index": done - n_real + j, "acc": float(v)})
    mean, ci = ee.mean_ci95(np.asarray(acc_all))
    eps_per_sec = a.iter_num / t_compute if t_compute > 0 else 0.0
    if logger:
        logger.log_eval(a.iter_num, mean, ci, eps_per_sec=eps_per_sec)
    return mean, ci, acc_all, eps_per_sec


def main(argv=None):
    # the reference's finetune.py also parses the 'train' flag set
    # (finetune.py:426).  The eval driver defaults to the fast bf16 path —
    # measured divergence vs strict f32 is +0.03 pp / 99.97% argmax
    # agreement (docs/PERF.md) at ~40% more throughput; ``--dtype float32
    # --inner_param_dtype float32`` is the strict-parity knob (the golden
    # e2e parity artifacts are generated against it).
    a = cfg_mod.parse_args(
        "train", argv, overrides={"dtype": "bfloat16", "inner_param_dtype": "bfloat16"}
    )
    np.random.seed(a.seed)
    paths = cfg_mod.Paths.load(a.paths_json)

    # n_query=15 (finetune.py:560-579); --n_query overrides for reduced-geometry runs
    spec = EpisodeSpec(a.test_n_way, a.n_shot, a.n_query if a.n_query > 0 else 15)
    bcfg = bb.MODEL_REGISTRY[a.model]()._replace(compute_dtype=a.dtype)
    gcfg = gn.GnnNetCfg(
        feat_dim=bcfg.feat_dim, n_way=a.test_n_way, n_support=a.n_shot,
        support_compress=2 if a.n_shot >= 50 else 1, use_pallas=a.use_pallas,
    )
    entry = registry.get(a.test_dataset)
    print(f"Loading {a.test_dataset}")
    # filelist-backed datasets (CUB/cross) evaluate on their novel split
    manifest = registry.build_manifest(entry, paths.as_dict(), split="novel")
    models = build_models(a, paths, bcfg, gcfg)
    if a.method.startswith("dampnet"):
        dp, ds_, dparams, dstate = models["dampnet"]
        if not bool(np.asarray(dstate["initialized"])):
            # source-prototype precompute before eval (finetune_50.py:591-622:
            # the reference sweeps all of miniImageNet through the model when
            # the checkpoint lacks prototypes)
            from mft_tpu.methods import dampnet as dn

            sweep_order = None
            if getattr(a, "episode_manifest", None):
                # replay mode: if the manifest recorded the reference sweep's
                # shuffled access order, reproduce its exact batch-of-64
                # composition (train-mode BN -> prototype features match)
                import json

                with open(a.episode_manifest) as f:
                    raw = json.load(f)
                sweep_order = raw.get("sweep_order") if isinstance(raw, dict) else None
                if sweep_order:
                    print(f"replaying recorded sweep order ({len(sweep_order)} images)")
            feats = sweep_features(a, paths, a.dataset, dp, ds_, bcfg, n_images=a.sweep_images,
                                   order=sweep_order)
            models["dampnet"] = (dp, ds_, dparams, dn.update_prototypes(dstate, feats))
            print(f"dampnet source prototypes computed from {a.dataset}")
        if a.unsupervised:
            models["unsup_stats"] = compute_unsup_stats(a, paths, dp, ds_, bcfg, n_images=a.sweep_images)
            print(f"unsup recovery stats from {a.unsupervised}")

    from mft_tpu.utils.metrics import profile_trace

    logger = MetricLogger(jsonl_path=os.path.join(paths.save_dir, "eval_log.jsonl"))
    with profile_trace(a.trace_dir):
        mean, ci, _, eps = evaluate(a, models, entry, manifest, bcfg=bcfg, gcfg=gcfg, spec=spec,
                                    logger=logger)
    print(a.test_dataset)
    print("%d Test Acc = %4.2f%% +- %4.2f%%" % (a.iter_num, mean, ci))
    print(f"episodes/sec = {eps:.3f}")
    return mean, ci


if __name__ == "__main__":
    main(sys.argv[1:])
