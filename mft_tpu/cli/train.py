"""Training driver — capability parity with reference train.py.

Stages (reference README commands):

* ``--method baseline``: supervised backbone pretraining on the base dataset
  (train.py:79-109, methods/baselinetrain.py),
* ``--method gnnnet|protonet [--train_aug]``: episodic meta-training,
  100 episodes/epoch, Adam over all params (train.py:112-144, 27-42),
* ``--fine_tune``: the meta fine-tuning stage — FO-MAML inner loop on the
  last backbone block per episode (train.py:49-58).

TPU-native: episodes are decoded once on host, augmented on device inside
the jitted train step, and stepped in episode batches (``--episode_batch``)
sharded over the mesh's data axis.

Run: ``python -m mft_tpu.cli.train --method gnnnet --dataset miniImageNet
--n_shot 5 --train_aug --stop_epoch 400``
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu import config as cfg_mod
from mft_tpu.core.episode import EpisodeSpec
from mft_tpu.data import registry
from mft_tpu.data.pipeline import BatchStream, EpisodeStream
from mft_tpu.methods import gnnnet as gn
from mft_tpu.methods.baseline import init_classifier
from mft_tpu.models import backbone as bb
from mft_tpu.ops import augment as aug
from mft_tpu.parallel import mesh as pmesh
from mft_tpu.train import optimizers as opt
from mft_tpu.train import steps
from mft_tpu.utils import checkpoint as ckpt
from mft_tpu.utils.metrics import AverageMeter, MetricLogger


def build_model(params_key, method: str, model_name: str, n_way: int, n_support: int, num_classes: int,
                *, use_pallas: bool = False):
    """Returns ``(bcfg, gcfg, params, stats, damp_state)``; ``damp_state`` is
    None except for dampnet methods (whose prototype banks are explicit state,
    persisted in their checkpoints)."""
    bcfg = bb.MODEL_REGISTRY[model_name]()
    kb, kh = jax.random.split(params_key)
    feature, stats = jax.jit(functools.partial(bb.init_backbone, cfg=bcfg))(kb)
    damp_state = None
    if method == "baseline":
        params = {"feature": feature, "classifier": init_classifier(kh, bcfg.feat_dim, num_classes)}
        gcfg = None
    elif method.startswith("dampnet"):
        from mft_tpu.methods import dampnet as dn

        if method == "dampnet":  # the prototype variant (reference methods/dampnet.py)
            gcfg = dn.prototype_cfg(bcfg.feat_dim, n_way, n_support)
        else:
            gcfg = dn.DampNetCfg(
                feat_dim=bcfg.feat_dim, n_way=n_way, n_support=n_support,
                stat="class" if method == "dampnet_full_class" else "support",
            )
        dparams, damp_state = jax.jit(functools.partial(dn.init_dampnet, cfg=gcfg))(kh)
        params = {"feature": feature, **dparams}
    else:
        gcfg = gn.GnnNetCfg(feat_dim=bcfg.feat_dim, n_way=n_way, n_support=n_support,
                            support_compress=2 if n_support >= 50 else 1,
                            use_pallas=use_pallas)
        head = jax.jit(functools.partial(gn.init_head, cfg=gcfg))(kh)
        params = {"feature": feature, "fc": head["fc"], "gnn": head["gnn"]}
    return bcfg, gcfg, params, stats, damp_state


def main(argv=None):
    params_args = cfg_mod.parse_args("train", argv)
    paths = cfg_mod.Paths.load(params_args.paths_json)
    np.random.seed(params_args.seed)  # reference seed discipline (train.py:69-70)

    entry = registry.get(params_args.dataset)
    manifest = registry.build_manifest(entry, paths.as_dict(), split="base")
    train_aug_cfg = entry.train_aug._replace(image_size=params_args.image_size)

    # reference n_query rule (train.py:112); --n_query overrides (e.g. to
    # reproduce the dynamic shrink when a class has < n_support+16 images,
    # meta_template.py:81 — static shapes here, so the caller pins it)
    n_query = params_args.n_query if params_args.n_query > 0 else max(
        1, int(16 * params_args.test_n_way / params_args.train_n_way))
    spec = EpisodeSpec(params_args.train_n_way, params_args.n_shot, n_query)

    bcfg, gcfg, params, stats, damp_state = build_model(
        jax.random.PRNGKey(params_args.seed), params_args.method, params_args.model,
        params_args.train_n_way, params_args.n_shot, params_args.num_classes,
        use_pallas=params_args.use_pallas,
    )
    bcfg = bcfg._replace(compute_dtype=params_args.dtype)
    tx = opt.torch_adam(1e-3)  # Adam(model.parameters()) defaults (train.py:27-28)
    trainable = bb.fwt_trainable_mask(params)
    if not all(jax.tree.leaves(trainable)):
        # ResNet10_FW: the FWT noise-strength params are requires_grad=False
        # in the reference (backbone.py:324-325) and must never train
        tx = opt.freeze_masked(tx, trainable)
    opt_state = tx.init(params)

    ckpt_dir = cfg_mod.checkpoint_dir(
        paths, params_args.dataset, params_args.model, params_args.method,
        train_aug=params_args.train_aug, n_way=params_args.train_n_way, n_shot=params_args.n_shot,
    )
    logger = MetricLogger(jsonl_path=os.path.join(ckpt_dir, "train_log.jsonl"))

    start_epoch = params_args.start_epoch
    if start_epoch != 0:
        resume = ckpt.get_resume_file(ckpt_dir)
        if resume:
            template = {"epoch": 0, "params": params, "stats": stats, "opt_state": opt_state}
            if damp_state is not None:
                # dampnet checkpoints persist the prototype/rolling-store
                # state too — without this template key flax silently drops
                # it and a resumed run restarts with a zeroed store,
                # count=150, and initialized=False
                template["damp_state"] = damp_state
            state = ckpt.load_checkpoint(resume, template)
            params, stats, opt_state = state["params"], state["stats"], state["opt_state"]
            if damp_state is not None:
                damp_state = state["damp_state"]
            start_epoch = int(state["epoch"]) + 1
            print(f"resumed from {resume} at epoch {start_epoch}")

    mesh = pmesh.make_mesh()
    rng = jax.random.PRNGKey(params_args.seed)

    if params_args.method == "baseline":
        run_baseline(params_args, manifest, train_aug_cfg, bcfg, params, stats, tx, opt_state,
                     ckpt_dir, logger, start_epoch, rng)
    elif params_args.method.startswith("dampnet"):
        run_dampnet(params_args, manifest, train_aug_cfg, bcfg, gcfg, spec, params, stats, tx,
                    opt_state, ckpt_dir, logger, start_epoch, rng, damp_state)
    else:
        run_episodic(params_args, manifest, train_aug_cfg, bcfg, gcfg, spec, params, stats, tx,
                     opt_state, ckpt_dir, logger, start_epoch, rng)


def run_baseline(a, manifest, aug_cfg, bcfg, params, stats, tx, opt_state, ckpt_dir, logger, start_epoch, rng):
    n_batches = max(1, len(manifest) // a.batch_size)
    # augment at the compute dtype (bf16 halves the on-device fan-out traffic)
    dt = aug.pipeline_dtype(bcfg.compute_dtype)

    @jax.jit
    def step(params, stats, opt_state, base_x, y, key):
        x = aug.augment_batch(key, base_x, aug_cfg, dtype=dt) if a.train_aug else aug.center_batch(base_x, aug_cfg.image_size, dtype=dt)
        return steps.baseline_train_step(params, stats, opt_state, x, y, bcfg=bcfg, tx=tx)

    # --episode_manifest (baseline flavour): replay explicit recorded
    # minibatches — {"batches": [[paths]]} concatenated over epochs, sliced
    # by the per-epoch batch count (tools/run_reference_train_e2e.py)
    replay_batches = None
    if getattr(a, "episode_manifest", None):
        import json as _json

        from mft_tpu.data.pipeline import ReplayBatchStream

        with open(a.episode_manifest) as f:
            replay_batches = _json.load(f)["batches"]
        n_epochs = a.stop_epoch - start_epoch + 1
        if len(replay_batches) % n_epochs:
            raise SystemExit(f"--episode_manifest holds {len(replay_batches)} batches, not a "
                             f"multiple of {n_epochs} epochs")
        n_batches = len(replay_batches) // n_epochs
        root = a.episode_manifest_root
        label_of = {os.path.relpath(p, root) if root else p: int(l)
                    for p, l in zip(manifest.items, manifest.labels)}
        print(f"replaying {len(replay_batches)} recorded batches over {n_epochs} epochs")

    for epoch in range(start_epoch, a.stop_epoch + 1):
        if replay_batches is not None:
            lo = (epoch - start_epoch) * n_batches
            stream = ReplayBatchStream(
                replay_batches[lo : lo + n_batches], label_of,
                base_size=a.base_size, root=root,
            )
        else:
            stream = BatchStream(manifest, a.batch_size, n_batches, base_size=a.base_size, seed=a.seed + epoch)
        meter = AverageMeter()
        for i, (bx, by) in enumerate(stream):
            rng, k = jax.random.split(rng)
            params, stats, opt_state, m = step(params, stats, opt_state, jnp.asarray(bx), jnp.asarray(by), k)
            meter.update(float(m["loss"]))
            logger.log_train(epoch, i, n_batches, meter.avg, top1=float(m["top1"]))
        if epoch % a.save_freq == 0 or epoch == a.stop_epoch:
            ckpt.save_checkpoint(ckpt_dir, epoch, {"epoch": epoch, "params": params, "stats": stats, "opt_state": opt_state})


def run_episodic(a, manifest, aug_cfg, bcfg, gcfg, spec, params, stats, tx, opt_state, ckpt_dir, logger, start_epoch, rng):
    e_batch = a.episode_batch
    dt = aug.pipeline_dtype(bcfg.compute_dtype)
    method = "protonet" if a.method == "protonet" else "gnnnet"
    mcfg = steps.MetaFinetuneCfg(epochs=steps.inner_epochs(method, gcfg), batch_size=4, bn_mode=a.bn_mode)

    @jax.jit
    def step(params, stats, opt_state, base_eps, key):
        k_aug, k_step = jax.random.split(key)
        if a.train_aug:
            x = aug.augment_batch(k_aug, base_eps, aug_cfg, dtype=dt)
        else:
            x = aug.center_batch(base_eps, aug_cfg.image_size, dtype=dt)
        if a.fine_tune:
            return steps.meta_finetune_train_step(
                params, stats, opt_state, x, k_step, method=method, bcfg=bcfg, gcfg=gcfg, spec=spec, mcfg=mcfg, tx=tx
            )
        return steps.episodic_train_step(
            params, stats, opt_state, x, k_step, method=method, bcfg=bcfg, gcfg=gcfg, spec=spec, tx=tx
        )

    # --episode_manifest: replay explicit recorded episodes instead of
    # sampling (cross-framework training comparison — the manifest is the
    # concatenation over epochs, sliced by --episodes_per_epoch; see
    # tools/run_reference_train_e2e.py, which records one from the
    # reference's own train.py loader)
    replay_episodes = None
    if getattr(a, "episode_manifest", None):
        import json as _json

        with open(a.episode_manifest) as f:
            raw = _json.load(f)
        replay_episodes = raw["episodes"] if isinstance(raw, dict) else raw
        n_epochs = a.stop_epoch - start_epoch + 1
        if len(replay_episodes) != n_epochs * a.episodes_per_epoch:
            raise SystemExit(
                f"--episode_manifest holds {len(replay_episodes)} episodes; expected "
                f"{n_epochs} epochs x {a.episodes_per_epoch} (--episodes_per_epoch)"
            )
        print(f"replaying {len(replay_episodes)} recorded episodes over {n_epochs} epochs")

    n_steps = max(1, a.episodes_per_epoch // e_batch)
    for epoch in range(start_epoch, a.stop_epoch + 1):
        if replay_episodes is not None:
            from mft_tpu.data.pipeline import ReplayEpisodeStream

            lo = (epoch - start_epoch) * a.episodes_per_epoch
            stream = ReplayEpisodeStream(
                replay_episodes[lo : lo + a.episodes_per_epoch], spec,
                base_size=a.base_size, root=a.episode_manifest_root,
            )
        else:
            stream = EpisodeStream(manifest, spec, a.episodes_per_epoch, base_size=a.base_size, seed=a.seed + epoch,
                                   cache_dir=a.episode_cache)
        meter = AverageMeter()
        it = iter(stream)
        t_data = t_step = 0.0
        for i in range(n_steps):
            t0 = time.perf_counter()
            eps = np.stack([next(it)[0] for _ in range(e_batch)])
            t1 = time.perf_counter()
            rng, k = jax.random.split(rng)
            params, stats, opt_state, m = step(params, stats, opt_state, jnp.asarray(eps), k)
            meter.update(float(m["loss"]))  # forces step completion
            t2 = time.perf_counter()
            t_data += t1 - t0
            t_step += t2 - t1
            logger.log_train(epoch, i, n_steps, meter.avg)
        # input-vs-compute wall split: a data_s >> step_s epoch means the run
        # is host-input-bound, not TPU-bound (raise decode workers / base res)
        logger.log_train(epoch, n_steps, n_steps, meter.avg, data_s=round(t_data, 3), step_s=round(t_step, 3))
        if epoch % a.save_freq == 0 or epoch == a.stop_epoch:
            ckpt.save_checkpoint(ckpt_dir, epoch, {"epoch": epoch, "params": params, "stats": stats, "opt_state": opt_state})


def run_dampnet(a, manifest, aug_cfg, bcfg, dcfg, spec, params, stats, tx, opt_state, ckpt_dir, logger, start_epoch, rng, dstate):
    """DampNet training (train_loop_full, dampnet_full_class.py:425-469):
    per-episode feature banking over a 5-epoch window; source prototypes
    refreshed from the bank once epoch >= 206; the corruption/recovery
    call-parity schedule drives the per-step mode."""
    from mft_tpu.methods import dampnet as dn

    e_batch = a.episode_batch
    dt = aug.pipeline_dtype(bcfg.compute_dtype)
    proto_start = 206  # dampnet_full_class.py:430
    window = []  # rolling 5-epoch support-feature bank (:52,456-462)
    step_index = 0

    @functools.partial(jax.jit, static_argnames=("mode",))
    def step(params, stats, opt_state, dstate, base_eps, key, *, mode):
        k_aug, k_step = jax.random.split(key)
        x = aug.augment_batch(k_aug, base_eps, aug_cfg, dtype=dt) if a.train_aug else aug.center_batch(base_eps, aug_cfg.image_size, dtype=dt)
        return steps.dampnet_train_step(params, stats, opt_state, dstate, x, k_step,
                                        mode=mode, bcfg=bcfg, dcfg=dcfg, spec=spec, tx=tx)

    proto_variant = dcfg.variant == "prototype"
    store_step = jax.jit(dn.update_prototype_store) if proto_variant else None

    n_steps = max(1, a.episodes_per_epoch // e_batch)
    for epoch in range(start_epoch, a.stop_epoch + 1):
        stream = EpisodeStream(manifest, spec, a.episodes_per_epoch, base_size=a.base_size, seed=a.seed + epoch,
                               cache_dir=a.episode_cache)
        meter = AverageMeter()
        it = iter(stream)
        epoch_bank = []
        for i in range(n_steps):
            eps = np.stack([next(it)[0] for _ in range(e_batch)])
            rng, k = jax.random.split(rng)
            if proto_variant:
                # plain first call, then corrupt/recover alternating per
                # STEP (dampnet.py:54,95-138; parity generalized to E>1)
                mode = dn.prototype_training_mode(int(dstate["count"]), e_batch)
            else:
                mode = dn.training_mode(step_index, bool(dstate["initialized"]))
            params, stats, opt_state, m = step(params, stats, opt_state, dstate, jnp.asarray(eps), k, mode=mode)
            if proto_variant:
                # rotate this batch's clean support banks into the rolling
                # prototype store (dampnet.py:133-136)
                dstate = store_step(dstate, m["support_bank"])
            else:
                # 5-epoch feature window for the full family's prototype
                # refresh; the prototype variant never consumes it (its eval
                # prototypes come from the eval driver's get_all_feat sweep),
                # so skip the device->host copy there
                epoch_bank.append(np.asarray(m["support_bank"]).reshape(-1, dcfg.feat_dim))
            step_index += e_batch
            meter.update(float(m["loss"]))
            logger.log_train(epoch, i, n_steps, meter.avg, mode=mode)
        if not proto_variant:
            window.append(np.concatenate(epoch_bank))
            window[:] = window[-5:]
            if epoch >= proto_start:
                dstate = dn.update_prototypes(dstate, jnp.asarray(np.concatenate(window)))
        if epoch % a.save_freq == 0 or epoch == a.stop_epoch:
            ckpt.save_checkpoint(ckpt_dir, epoch, {"epoch": epoch, "params": params, "stats": stats,
                                                   "opt_state": opt_state, "damp_state": dstate})


if __name__ == "__main__":
    main(sys.argv[1:])
