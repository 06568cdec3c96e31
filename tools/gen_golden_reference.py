"""Generate golden fixtures by RUNNING the actual torch reference.

Round-1 parity evidence was NumPy oracles re-derived by *reading*
/root/reference — an independent re-reading, not an independent artifact
(VERDICT.md, Missing #2).  This script executes the reference's own modules
(backbone.SimpleBlock, methods/gnn.{Wcompute,Gconv,GNN_nl}, torch.optim.Adam,
torch.optim.SGD with the probe hyperparameters of meta_template.py:166) on
tiny fixed-seed tensors and saves every input, parameter, and output to
``tests/fixtures/golden_reference.npz``.  ``tests/test_golden_reference.py``
transplants the saved weights into the mft_tpu layouts and compares.

Run manually (torch CPU is slow in this environment; fixtures are committed):

    python tools/gen_golden_reference.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/methods")

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

torch.manual_seed(0)
OUT = {}


def put(prefix: str, module: nn.Module):
    for k, v in module.state_dict().items():
        OUT[f"{prefix}.{k}"] = v.detach().numpy().copy()


def randomize_bn(module: nn.Module, gen: torch.Generator):
    """Non-default BN affine + running stats so the comparison exercises them."""
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5, generator=gen)
                m.bias.uniform_(-0.3, 0.3, generator=gen)
                if m.running_mean is not None:
                    m.running_mean.uniform_(-0.5, 0.5, generator=gen)
                    m.running_var.uniform_(0.5, 1.5, generator=gen)


def gen_simple_block():
    """backbone.SimpleBlock (reference backbone.py:216-261), half_res=True,
    with the 1x1-conv shortcut branch (indim != outdim)."""
    import backbone as ref_bb

    gen = torch.Generator().manual_seed(1)
    block = ref_bb.SimpleBlock(indim=4, outdim=8, half_res=True)
    randomize_bn(block, gen)
    x = torch.randn(3, 4, 8, 8, generator=gen)
    OUT["simple_block.x"] = x.numpy()
    put("simple_block", block)

    block.eval()
    with torch.no_grad():
        OUT["simple_block.y_eval"] = block(x).numpy()
    block.train()
    with torch.no_grad():
        OUT["simple_block.y_train"] = block(x).numpy()
    # train() forward updated the running stats (momentum 0.1, unbiased var):
    # capture them to verify the running-stat update rule too.
    for k, v in block.state_dict().items():
        if "running" in k:
            OUT[f"simple_block.updated.{k}"] = v.numpy().copy()


def gen_gnn_pieces():
    """methods/gnn.py Wcompute (:58-132), Gconv (:30-56), GNN_nl (:134-166)."""
    import gnn as ref_gnn

    gen = torch.Generator().manual_seed(2)

    # ---- Wcompute: F=6 node features, nf=4 -> ratios [8,8,4,4] ----------
    w = ref_gnn.Wcompute(input_features=6, nf=4, operator="J2", activation="softmax", ratio=[2, 2, 1, 1])
    randomize_bn(w, gen)
    w.train()
    x = torch.randn(2, 5, 6, generator=gen)
    w_id = torch.eye(5).unsqueeze(0).repeat(2, 1, 1).unsqueeze(3)
    OUT["wcompute.x"] = x.numpy()
    put("wcompute", w)
    with torch.no_grad():
        OUT["wcompute.W"] = w(x, w_id).numpy()  # [2, 5, 5, 2]

    # ---- Gconv with BN (train mode) --------------------------------------
    g = ref_gnn.Gconv(nf_input=6, nf_output=3, J=2, bn_bool=True)
    randomize_bn(g, gen)
    g.train()
    w_ops = torch.softmax(torch.randn(2, 5, 5, 2, generator=gen), dim=2)
    OUT["gconv.w_ops"] = w_ops.numpy()
    OUT["gconv.x"] = x.numpy()
    put("gconv", g)
    with torch.no_grad():
        OUT["gconv.y"] = g([w_ops, x])[1].numpy()  # [2, 5, 3]

    # ---- full GNN_nl: 2 dense layers + final (train mode) ----------------
    m = ref_gnn.GNN_nl(input_features=7, nf=4, train_N_way=3)
    randomize_bn(m, gen)
    m.train()
    nodes = torch.randn(2, 6, 7, generator=gen)
    OUT["gnn_nl.x"] = nodes.numpy()
    put("gnn_nl", m)
    with torch.no_grad():
        OUT["gnn_nl.y"] = m(nodes).numpy()  # [2, 6, 3]


def gen_gnnnet_set_forward():
    """The FULL GnnNet episodic forward from features
    (methods/gnnnet.py:47-68 ``set_forward(x, is_feature=True)``): fc
    projector + per-query graph build + support-label one-hot plumbing +
    GNN_nl + query-slot extraction/ordering — the complete head in one
    artifact."""
    import gnnnet as ref_gnnnet

    # neutralize .cuda() calls (meta_template/gnnnet assume a GPU)
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    class StubBackbone(nn.Module):
        final_feat_dim = 16

        def forward(self, x):  # unused on the is_feature path
            raise AssertionError("is_feature=True must not call the backbone")

    gen = torch.Generator().manual_seed(4)
    m = ref_gnnnet.GnnNet(StubBackbone, n_way=3, n_support=2)
    randomize_bn(m, gen)
    m.train()
    m.n_query = 15  # the eval drivers set this before scoring (finetune.py:312)
    feats = torch.randn(3, 2 + 15, 16, generator=gen)
    OUT["gnnnet.feats"] = feats.numpy()
    put("gnnnet", m)
    with torch.no_grad():
        OUT["gnnnet.scores"] = m.set_forward(feats, is_feature=True).numpy()  # [45, 3]


def gen_gnnnet50_set_forward():
    """The 50-shot compressed GnnNet forward (methods/gnnnet_copy.py:51-78
    ``set_forward(x, is_feature=True)``): support embeddings pair-averaged
    AFTER the fc projection, halving the graph node count."""
    import gnnnet_copy as ref_copy

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    class StubBackbone(nn.Module):
        final_feat_dim = 16

        def forward(self, x):
            raise AssertionError("is_feature=True must not call the backbone")

    gen = torch.Generator().manual_seed(6)
    m = ref_copy.GnnNet(StubBackbone, n_way=3, n_support=4)  # halved to 2 graph slots
    randomize_bn(m, gen)
    m.train()
    m.n_query = 15
    feats = torch.randn(3, 4 + 15, 16, generator=gen)
    OUT["gnnnet50.feats"] = feats.numpy()
    put("gnnnet50", m)
    with torch.no_grad():
        OUT["gnnnet50.scores"] = m.set_forward(feats, is_feature=True).numpy()  # [45, 3]


def gen_dampnet_domain_shift():
    """The full DampNet eval path from features
    (dampnet_full_class.py:262-352 ``set_forward(x, is_feature=True,
    domain_shift=True)``): class-statistic computation, the two NTN
    comparison modules, the mult/add recovery MLPs, recovered-feature
    projection, graph build and GNN scoring."""
    import dampnet_full_class as ref_damp

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    class StubBackbone(nn.Module):
        final_feat_dim = 16

        def forward(self, x):
            raise AssertionError("is_feature=True must not call the backbone")

    gen = torch.Generator().manual_seed(5)
    m = ref_damp.DampNet(StubBackbone, n_way=3, n_support=2)
    randomize_bn(m, gen)
    m.train()
    m.n_query = 15
    m.final_meta_prototype = torch.randn(16, generator=gen)
    m.final_meta_prototype_std = torch.randn(16, generator=gen).abs() + 0.5
    m.final_meta_prototypes_initialized = True
    feats = torch.randn(3, 2 + 15, 16, generator=gen)
    OUT["dampnet.feats"] = feats.numpy()
    OUT["dampnet.proto_mean"] = m.final_meta_prototype.numpy()
    OUT["dampnet.proto_std"] = m.final_meta_prototype_std.numpy()
    put("dampnet", m)
    with torch.no_grad():
        OUT["dampnet.scores"] = m.set_forward(feats, is_feature=True, domain_shift=True).numpy()


def gen_optimizers():
    """torch.optim.Adam(lr=0.01, weight_decay=0.001) — the eval fine-tune
    head optimizer (finetune.py:109,240) — and torch.optim.SGD(lr=0.01,
    momentum=0.9, dampening=0.9, weight_decay=0.001) — the linear-probe
    optimizer (meta_template.py:166).  3 steps with fixed gradients."""
    gen = torch.Generator().manual_seed(3)
    p0 = torch.randn(8, generator=gen)
    grads = torch.randn(3, 8, generator=gen)
    OUT["opt.p0"] = p0.numpy()
    OUT["opt.grads"] = grads.numpy()

    for name, make in [
        ("adam", lambda p: torch.optim.Adam([p], lr=0.01, weight_decay=0.001)),
        ("adam_nowd", lambda p: torch.optim.Adam([p], lr=0.01)),
        ("sgd_probe", lambda p: torch.optim.SGD([p], lr=0.01, momentum=0.9, dampening=0.9, weight_decay=0.001)),
    ]:
        p = p0.clone().requires_grad_(True)
        o = make(p)
        traj = []
        for i in range(3):
            o.zero_grad()
            p.grad = grads[i].clone()
            o.step()
            traj.append(p.detach().numpy().copy())
        OUT[f"opt.{name}"] = np.stack(traj)


def main():
    gen_simple_block()
    gen_gnn_pieces()
    gen_gnnnet_set_forward()
    gen_gnnnet50_set_forward()
    gen_dampnet_domain_shift()
    gen_optimizers()
    import os

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures", "golden_reference.npz")
    out = os.path.normpath(out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **OUT)
    print(f"wrote {out} ({len(OUT)} arrays)")
    for k in sorted(OUT):
        print(" ", k, OUT[k].shape)


if __name__ == "__main__":
    main()
