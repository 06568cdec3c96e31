"""Golden fixture: the reference's MULTI-EPISODE train-loop trajectories.

The single-step f64 backward goldens (tools/gen_golden_reference.py) pin
each step function; nothing pinned the LOOP WIRING (VERDICT r4 next #4):
Adam state carried across episodes, BN running-stat persistence between
episodes, the per-batch ``n_query = x.size(1) - n_support`` recompute
(meta_template.py:63-65), and the FO-MAML cross-episode bookkeeping —
``MAML_update()`` at the start of every later episode undoing the previous
inner-loop delta while keeping the outer Adam delta (gnnnet.py:90-103,122,
183-187), plus the epoch-end ``MAML_update()`` at stop (train.py:54-55).

This script RUNS the reference's own loops on the tiny 4-stage backbone:

* ``epi``: ``train_loop2`` (meta_template.py:76-92) over 3 episodes with
  VARYING n_query (3, 2, 3) under one ``torch.optim.Adam(model.parameters())``
  (train.py:27-28) — per-episode losses + final params/BN stats,
* ``mft``: ``train_loop_finetune`` (meta_template.py:93-109) over 3
  episodes (n_query=16 — gnnnet.py:198 asserts it) with the recorded
  np.random inner permutations, followed by the stop-epoch
  ``MAML_update()`` — per-episode losses + final params/BN stats.

Everything runs in FLOAT64 (same rationale as the single-step goldens).
Output: tests/fixtures/golden_trainloop.npz, replayed by
tests/test_trainloop_golden.py through the same step functions cli.train
drives, carrying opt_state/stats across episodes.

Run manually (torch CPU; fixtures are committed):

    python tools/gen_trainloop_golden.py
"""

import copy
import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/methods")

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

from gen_golden_reference import randomize_bn, tiny_resnet_factory  # noqa: E402

torch.Tensor.cuda = lambda self, *a, **k: self
nn.Module.cuda = lambda self, *a, **k: self

OUT = {}

N_WAY, N_SUPPORT = 2, 2
EPI_QUERIES = (3, 2, 3)  # varying n_query: pins the per-batch recompute
MFT_QUERIES = (16, 16, 16)  # gnnnet.py:198: the finetune path asserts 16
IMG_SEED = 905
PERM_SEED = 907
MODEL_SEED = 61


def put_state(prefix: str, module: nn.Module, *, skip=("feature2.", "feature3.")):
    for k, v in module.state_dict().items():
        if k.startswith(skip) or "num_batches_tracked" in k:
            continue
        OUT[f"{prefix}.{k}"] = v.detach().numpy().copy()


def episodes(queries):
    rs = np.random.RandomState(IMG_SEED)
    return [rs.rand(N_WAY, N_SUPPORT + q, 3, 224, 224) for q in queries]


class FakeLoader:
    """The loop only does ``for i, (x, _) in enumerate(loader)`` and
    ``len(loader)`` (meta_template.py:61,74)."""

    def __init__(self, xs):
        self.xs = [torch.from_numpy(x) for x in xs]

    def __iter__(self):
        return iter((x, None) for x in self.xs)

    def __len__(self):
        return len(self.xs)


def build_model():
    import backbone as ref_bb
    import gnnnet as ref_gnnnet

    torch.manual_seed(MODEL_SEED)
    tiny = tiny_resnet_factory(ref_bb)
    m = ref_gnnnet.GnnNet(tiny, n_way=N_WAY, n_support=N_SUPPORT)
    randomize_bn(m, torch.Generator().manual_seed(MODEL_SEED + 1))
    return m


def record_losses(m, attr):
    losses = []
    orig = getattr(m, attr)

    def wrapped(x):
        loss = orig(x)
        losses.append(float(loss.item()))
        return loss

    setattr(m, attr, wrapped)
    return losses


def gen_episodic(master):
    """train_loop2 x 3 episodes: Adam/BN-stat carry + n_query recompute."""
    m = copy.deepcopy(master).double()
    m.support_label = m.support_label.double()
    m.train()
    losses = record_losses(m, "set_forward_loss")
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        optim = torch.optim.Adam(m.parameters())  # train.py:27-28 defaults
        m.train_loop2(0, FakeLoader(episodes(EPI_QUERIES)), optim)
    finally:
        torch.set_default_dtype(prev)
    OUT["epi.losses"] = np.asarray(losses, np.float64)
    put_state("epi.final", m)


def gen_meta_finetune(master):
    """train_loop_finetune x 3 episodes + stop-epoch MAML_update: the
    cross-episode FO-MAML bookkeeping (undo inner delta, keep outer delta),
    BN stats carried through inner loops + load_state_dict + outer passes."""
    m = copy.deepcopy(master).double()
    m.support_label = m.support_label.double()
    m.train()
    losses = record_losses(m, "set_forward_loss_finetune")
    np.random.seed(PERM_SEED)  # inner minibatch perms (gnnnet.py:154)
    torch.manual_seed(PERM_SEED)  # throwaway classifier inits (loss-inert)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        optim = torch.optim.Adam(m.parameters())
        m.train_loop_finetune(0, FakeLoader(episodes(MFT_QUERIES)), optim)
        m.MAML_update()  # train.py:54-55: undo the last inner delta at stop
    finally:
        torch.set_default_dtype(prev)
    OUT["mft.losses"] = np.asarray(losses, np.float64)
    put_state("mft.final", m)
    # the permutation draws, re-derived: 15 inner epochs per episode, each a
    # permutation of support_size=4 from the global np.random stream
    np.random.seed(PERM_SEED)
    OUT["mft.perms"] = np.stack(
        [np.random.permutation(N_WAY * N_SUPPORT) for _ in range(15 * len(MFT_QUERIES))]
    )


def main():
    master = build_model()
    put_state("init", master)
    gen_episodic(master)
    gen_meta_finetune(master)
    out = os.path.normpath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures",
                     "golden_trainloop.npz")
    )
    np.savez_compressed(out, **OUT)
    print(f"wrote {out} ({len(OUT)} arrays)")
    print("epi.losses", OUT["epi.losses"])
    print("mft.losses", OUT["mft.losses"])


if __name__ == "__main__":
    main()
