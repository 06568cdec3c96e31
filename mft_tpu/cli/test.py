"""Feature-based episodic test driver.

Reconstructs the upstream cdfsl-benchmark ``test.py`` stage (absent from the
reference repo; its flags remain at io_utils.py:41-47 and its data path at
data/feature_loader.py): sample episodes from pre-extracted features and
score them with the frozen-feature linear probe of
meta_template.set_forward_adaptation (100 epochs x batch 4 of the reference
SGD, meta_template.py:153-186), reporting mean +- 1.96*std/sqrt(n).

TPU-native: the probe is the shared ``lax.scan`` inner engine, vmapped over
an episode batch.

Run: ``python -m mft_tpu.cli.test --dataset miniImageNet --method baseline
--split novel --adaptation``
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu import config as cfg_mod
from mft_tpu.core.episode import EpisodeSpec, support_labels
from mft_tpu.data.feature_store import load_features, sample_feature_episode
from mft_tpu.methods.baseline import ce_loss, classifier_logits, init_classifier
from mft_tpu.methods.protonet import proto_scores
from mft_tpu.train.eval_engine import episode_accuracy, mean_ci95
from mft_tpu.train.inner_loop import InnerLoopCfg, inner_fit
from mft_tpu.train.optimizers import reference_probe_sgd


def make_probe_program(spec: EpisodeSpec, feat_dim: int, adaptation: bool):
    """(episodes [E, n_way, s+q, feat], keys [E]) -> acc [E]."""

    def one(feats, key):
        z_support = feats[:, : spec.n_support].reshape(spec.support_size, feat_dim)
        z_query = feats[:, spec.n_support :].reshape(spec.query_size, feat_dim)
        if not adaptation:
            scores = proto_scores(feats[:, : spec.n_support], feats[:, spec.n_support :], spec)
            return episode_accuracy(scores, spec)
        y = support_labels(spec)
        k_head, k_fit = jax.random.split(key)
        head = init_classifier(k_head, feat_dim, spec.n_way, zero_bias=False)

        def loss_fn(p, idx, w):
            return ce_loss(classifier_logits(p, z_support[idx]), y[idx], w)

        icfg = InnerLoopCfg(epochs=100, batch_size=4, bank_size=spec.support_size)
        head = inner_fit(loss_fn, head, reference_probe_sgd(0.01), k_fit, icfg)
        return episode_accuracy(classifier_logits(head, z_query), spec)

    return jax.jit(jax.vmap(one))


def main(argv=None):
    a = cfg_mod.parse_args("test", argv)
    paths = cfg_mod.Paths.load(a.paths_json)
    d = cfg_mod.checkpoint_dir(
        paths, a.dataset, a.model, a.method, train_aug=a.train_aug,
        n_way=a.train_n_way if a.method not in ("baseline", "baseline++") else None,
        n_shot=a.n_shot,
    )
    feat_path = os.path.join(d.replace("checkpoints", "features"), f"{a.split}.npz")
    cl_data = load_features(feat_path)
    feat_dim = next(iter(cl_data.values())).shape[1]

    spec = EpisodeSpec(a.test_n_way, a.n_shot, 15)
    program = make_probe_program(spec, feat_dim, adaptation=a.adaptation)

    rs = np.random.Generator(np.random.Philox(key=a.seed))
    E = a.eval_batch
    accs = []
    n_batches = (a.iter_num + E - 1) // E
    key = jax.random.PRNGKey(a.seed)
    for b in range(n_batches):
        eps = np.stack([sample_feature_episode(cl_data, spec.n_way, spec.n_support, spec.n_query, rs)[0] for _ in range(E)])
        key, k = jax.random.split(key)
        acc = program(jnp.asarray(eps), jax.random.split(k, E))
        accs.extend(np.asarray(acc).tolist())
    accs = np.asarray(accs[: a.iter_num])
    mean, ci = mean_ci95(accs)
    print("%d Test Acc = %4.2f%% +- %4.2f%%" % (len(accs), mean, ci))


if __name__ == "__main__":
    main(sys.argv[1:])
