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


def gen_train_step_backward(model_gnn):
    """Episodic TRAIN-step backward parity: the reference's own
    ``set_forward_loss(x).backward()`` (methods/gnnnet.py:219-224 +
    meta_template train_loop2, train.py:37-42) on the tiny meta-trained
    GnnNet — records the loss and EVERY parameter gradient.  Nothing else in
    the fixture set exercises the backward pass end to end (BN-batch-stat
    backward through the trunk, the fc projector's no-running-stats BN1d,
    the GNN's masked softmax adjacency).

    Run in FLOAT64 (exact widening of the f32 weights): single-precision
    accumulation-order roundoff through the deep BN chain is ~1e-4 on the
    gradients, which would force tolerances too loose to discriminate; the
    jax side compares under x64 so both sides sit at the f64 noise floor."""
    import copy

    m = copy.deepcopy(model_gnn).double()  # keep the source model pristine
    m.support_label = m.support_label.double()
    m.train()
    m.n_query = 16  # the training schedule's query count (train.py:112)
    rs = np.random.RandomState(321)
    x = torch.from_numpy(rs.rand(E2E_N_WAY, E2E_N_SUPPORT + 16, 3, 224, 224))
    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)  # torch.eye in Wcompute etc.
    try:
        m.zero_grad(set_to_none=True)
        loss = m.set_forward_loss(x)
        loss.backward()
    finally:
        torch.set_default_dtype(prev_dtype)
    OUT["trainstep.loss"] = np.asarray(loss.detach().numpy(), dtype=np.float64)
    for name, p in m.named_parameters():
        if p.grad is not None:
            OUT[f"trainstep.grad.{name}"] = p.grad.detach().numpy().copy()


def gen_meta_finetune_backward(model_gnn):
    """The META FINE-TUNING stage, executed by the reference itself:
    ``set_forward_loss_finetune(x)`` (methods/gnnnet.py:106-231) — the inner
    15-epoch Adam(0.01) loop on the last block (support embedded per
    minibatch with train-mode BN), the adapted-weight load, the SEPARATE
    support/query embedding passes (:193-197), the GNN forward, and the
    first-order outer backward.  Records the loss, the recorded
    np.random minibatch permutations (:154), and every outer parameter
    gradient (evaluated at the adapted point, as the reference does).

    Run in FLOAT64 (see gen_train_step_backward): the inner Adam loop's
    1/(sqrt(nu)+eps) nonlinearity amplifies f32 roundoff into ~1e-3 outer
    gradient drift; f64 on both sides keeps the tolerance discriminating."""
    import copy

    m = copy.deepcopy(model_gnn).double()
    m.support_label = m.support_label.double()
    m.train()
    m.first = True  # single-episode golden: MAML_update is a no-op (:99)
    m.n_query = 16  # gnnnet.py:198 asserts n_support + 16
    rs = np.random.RandomState(654)
    x = torch.from_numpy(rs.rand(E2E_N_WAY, E2E_N_SUPPORT + 16, 3, 224, 224))
    torch.manual_seed(99)  # throwaway-classifier init (zero-grad, unused)
    np.random.seed(MFT_PERM_SEED)
    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        m.zero_grad(set_to_none=True)
        loss = m.set_forward_loss_finetune(x)
        loss.backward()
    finally:
        torch.set_default_dtype(prev_dtype)
    OUT["mft.loss"] = np.asarray(loss.detach().numpy(), dtype=np.float64)
    for name, p in m.named_parameters():
        if p.grad is not None and not name.startswith(("feature2.", "feature3.")):
            OUT[f"mft.grad.{name}"] = p.grad.detach().numpy().copy()
    # the BN running-statistic TRAJECTORY: inner minibatch updates persisted
    # by load_state_dict (gnnnet.py:183-187), then the two outer passes
    for k, v in m.feature.state_dict().items():
        if "running" in k:
            OUT[f"mft.post_stats.{k}"] = v.detach().numpy().copy()
    support_size = E2E_N_WAY * E2E_N_SUPPORT
    np.random.seed(MFT_PERM_SEED)
    OUT["mft.perms"] = np.stack([np.random.permutation(support_size) for _ in range(15)])


MFT_PERM_SEED = 77
FTDAMP_PERM_SEED = 33
PNFT_PERM_SEED = 88


def gen_protonet_finetune_backward(tiny):
    """The ProtoNet meta fine-tuning stage, executed by the reference itself:
    ``set_forward_loss_finetune(x).backward()``
    (/root/reference/methods/protonet.py:66-176) — the 5-epoch inner
    Adam(0.01) loop on the last block with features-as-logits CE (:129), a
    ragged final minibatch (support 6, batch 4 -> 4+2), the separate
    post-adaptation support/query embedding passes (:154-156), prototype
    euclidean scoring, and the first-order outer backward.  FLOAT64 (see
    gen_train_step_backward)."""
    from methods.protonet import ProtoNet

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    gen = torch.Generator().manual_seed(23)
    torch.manual_seed(61)
    m = ProtoNet(tiny, n_way=3, n_support=2)
    randomize_bn(m, gen)
    put("pnft", m)
    m = m.double()
    m.train()
    m.first = True
    m.n_query = 5
    rs = np.random.RandomState(777)
    x = torch.from_numpy(rs.rand(3, 7, 3, 224, 224))
    torch.manual_seed(98)  # throwaway-classifier init (zero-grad, unused)
    np.random.seed(PNFT_PERM_SEED)
    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        m.zero_grad(set_to_none=True)
        loss = m.set_forward_loss_finetune(x)
        loss.backward()
    finally:
        torch.set_default_dtype(prev_dtype)
    OUT["pnft.loss"] = np.asarray(loss.detach().numpy(), dtype=np.float64)
    for name, p in m.named_parameters():
        if p.grad is not None and not name.startswith(("feature2.", "feature3.")):
            OUT[f"pnft.grad.{name}"] = p.grad.detach().numpy().copy()
    # running-stat trajectory incl. the RAGGED inner minibatches (4+2)
    for k, v in m.feature.state_dict().items():
        if "running" in k:
            OUT[f"pnft.post_stats.{k}"] = v.detach().numpy().copy()
    np.random.seed(PNFT_PERM_SEED)
    OUT["pnft.perms"] = np.stack([np.random.permutation(6) for _ in range(5)])


PROBE_PERM_SEED = 44
PROBE_CLF_SEED = 121


def gen_probe_adaptation():
    """The frozen-feature linear probe, executed by the reference itself:
    ``BaselineFinetune.set_forward_adaptation``
    (/root/reference/methods/baselinefinetune.py:17-58, identical to
    meta_template.py:153-186) — 100 epochs x batch 4 (ragged: support 6 ->
    4+2) of SGD(0.01, momentum=0.9, dampening=0.9, wd=0.001) training an
    nn.Linear on frozen support features, then scoring the query features.
    This is the --method baseline eval stage (save_features + test).
    FLOAT64 (see gen_train_step_backward)."""
    from methods.baselinefinetune import BaselineFinetune

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    class StubBackbone(nn.Module):
        final_feat_dim = 16

        def forward(self, x):
            raise AssertionError("the probe scores pre-extracted features")

    m = BaselineFinetune(StubBackbone, n_way=3, n_support=2)
    m.n_query = 5
    gen = torch.Generator().manual_seed(17)
    feats = torch.randn(3, 7, 16, generator=gen, dtype=torch.float64)
    OUT["probe.feats"] = feats.numpy()

    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        torch.manual_seed(PROBE_CLF_SEED)  # the nn.Linear probe init (:27)
        np.random.seed(PROBE_PERM_SEED)
        scores = m.set_forward(feats)
        OUT["probe.scores"] = scores.detach().numpy()
        # recover the probe init: re-seed and replay the construction
        torch.manual_seed(PROBE_CLF_SEED)
        clf = nn.Linear(16, 3)
        OUT["probe.clf.weight"] = clf.weight.detach().numpy()
        OUT["probe.clf.bias"] = clf.bias.detach().numpy()
    finally:
        torch.set_default_dtype(prev_dtype)
    np.random.seed(PROBE_PERM_SEED)
    OUT["probe.perms"] = np.stack([np.random.permutation(6) for _ in range(100)])


G50_IMG_SEED, G50FT_IMG_SEED = 888, 889
G50_BN_SEED = 9
G50FT_PERM_SEED = 47
G50FT_CLF_SEED = 122


def gen_gnnnet50_train_backward(tiny):
    """The 50-shot compressed episodic TRAIN step's backward pass, executed
    by the reference itself: ``gnnnet_copy.GnnNet.set_forward_loss(x)``
    (/root/reference/methods/gnnnet_copy.py:51-78,259-264 + train_loop50,
    train_50.py:41-45) — full backbone embed, fc projection, POST-projection
    pair-averaging of the support embeddings (z2.view(n_way,2,s,f).mean(1),
    :67-70), halved graph build, GNN forward, CE backward.  Records the loss
    and every parameter gradient.  FLOAT64 (see gen_train_step_backward).
    Returns the f32 master model for the meta-finetune-50 generator."""
    import gnnnet_copy as ref_copy

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    gen = torch.Generator().manual_seed(G50_BN_SEED)
    master = ref_copy.GnnNet(tiny, n_way=E2E_N_WAY, n_support=4)  # eff_support 2
    randomize_bn(master, gen)
    put("g50", master)

    import copy

    m = copy.deepcopy(master).double()
    m.support_label = m.support_label.double()
    m.train()
    m.n_query = 16  # train_loop50 sets n_query = x.size(1) - 50 (:86)
    rs = np.random.RandomState(G50_IMG_SEED)
    x = torch.from_numpy(rs.rand(E2E_N_WAY, 4 + 16, 3, 224, 224))
    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        m.zero_grad(set_to_none=True)
        loss = m.set_forward_loss(x)
        loss.backward()
    finally:
        torch.set_default_dtype(prev_dtype)
    OUT["g50.loss"] = np.asarray(loss.detach().numpy(), dtype=np.float64)
    for name, p in m.named_parameters():
        if p.grad is not None:
            OUT[f"g50.grad.{name}"] = p.grad.detach().numpy().copy()
    return master


def gen_gnnnet50_finetune_backward(master):
    """The 50-shot META FINE-TUNING stage, executed by the reference itself:
    ``gnnnet_copy.GnnNet.set_forward_loss_finetune(x)``
    (/root/reference/methods/gnnnet_copy.py:135-266 + train_loop_finetune50)
    — the inner **5-epoch** (:177, vs 15 in the 5-shot gnnnet.py:145)
    Adam(0.01) x batch-4 loop over the FULL uncompressed support bank with
    train-mode BN, adapted-weight load, separate support/query embedding
    passes, post-fc pair-averaging, GNN forward, first-order outer backward.
    Records loss, minibatch permutations, post-inner running stats, and
    every outer parameter gradient.  FLOAT64."""
    import copy

    m = copy.deepcopy(master).double()
    m.support_label = m.support_label.double()
    m.train()
    m.first = True  # single-episode golden: MAML_update is a no-op
    m.n_query = 16  # gnnnet_copy.py:233 asserts true_n_support + 16
    rs = np.random.RandomState(G50FT_IMG_SEED)
    x = torch.from_numpy(rs.rand(E2E_N_WAY, 4 + 16, 3, 224, 224))
    torch.manual_seed(G50FT_CLF_SEED)  # throwaway-classifier init (zero-grad, unused)
    np.random.seed(G50FT_PERM_SEED)
    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        m.zero_grad(set_to_none=True)
        loss = m.set_forward_loss_finetune(x)
        loss.backward()
    finally:
        torch.set_default_dtype(prev_dtype)
    OUT["g50ft.loss"] = np.asarray(loss.detach().numpy(), dtype=np.float64)
    for name, p in m.named_parameters():
        if p.grad is not None and not name.startswith(("feature2.", "feature3.")):
            OUT[f"g50ft.grad.{name}"] = p.grad.detach().numpy().copy()
    for k, v in m.feature.state_dict().items():
        if "running" in k:
            OUT[f"g50ft.post_stats.{k}"] = v.detach().numpy().copy()
    support_size = E2E_N_WAY * 4
    np.random.seed(G50FT_PERM_SEED)
    OUT["g50ft.perms"] = np.stack([np.random.permutation(support_size) for _ in range(5)])


def gen_dampnet_train_backward(tiny):
    """The DampNet episodic TRAIN step's backward pass, executed by the
    reference itself: train_loop_full's per-batch body
    (/root/reference/methods/dampnet_full_class.py:425-447) — ``x =
    feature(flat)`` then ``set_forward_loss(x)`` through the
    pre-initialization 'plain' branch (:124-144: fc projection over raw
    backbone features, per-query graph build, forward_gnn, CE) — and
    ``loss.backward()``.  Gradients flow through the backbone, fc and GNN;
    the recovery modules (W_R/V_R/layers*) correctly receive none.
    FLOAT64 (see gen_train_step_backward)."""
    import dampnet_full_class as ref_damp

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    gen = torch.Generator().manual_seed(29)
    torch.manual_seed(71)
    m = ref_damp.DampNet(tiny, n_way=3, n_support=2)
    randomize_bn(m, gen)
    put("dtrain", m)
    m = m.double()
    m.support_label = m.support_label.double()
    m.train()
    m.n_query = 5
    m.final_meta_prototypes_initialized = False  # the 'plain' branch (:124)
    rs = np.random.RandomState(987)
    x = torch.from_numpy(rs.rand(3 * 7, 3, 224, 224))  # flat, as :440 embeds
    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        m.zero_grad(set_to_none=True)
        feats = m.feature(x)
        loss = m.set_forward_loss(feats)
        loss.backward()
    finally:
        torch.set_default_dtype(prev_dtype)
    OUT["dtrain.loss"] = np.asarray(loss.detach().numpy(), dtype=np.float64)
    for name, p in m.named_parameters():
        if p.grad is not None:
            OUT[f"dtrain.grad.{name}"] = p.grad.detach().numpy().copy()


def gen_baseline_train_backward(tiny):
    """The baseline supervised pretraining step's backward pass, executed by
    the reference itself: ``BaselineTrain.forward_loss(x, y).backward()``
    (/root/reference/methods/baselinetrain.py:26-56 + train_loop :43-52) —
    backbone embed (train-mode BN), Linear classifier (zero-initialized
    bias, :17), CE.  FLOAT64 (see gen_train_step_backward)."""
    from methods.baselinetrain import BaselineTrain

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    gen = torch.Generator().manual_seed(31)
    torch.manual_seed(73)
    m = BaselineTrain(tiny, num_class=7)
    randomize_bn(m, gen)
    put("btrain", m)
    m = m.double()
    m.train()
    rs = np.random.RandomState(135)
    x = torch.from_numpy(rs.rand(6, 3, 224, 224))
    y = torch.from_numpy(rs.randint(0, 7, size=6))
    OUT["btrain.y"] = y.numpy()
    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        m.zero_grad(set_to_none=True)
        loss = m.forward_loss(x, y)
        loss.backward()
    finally:
        torch.set_default_dtype(prev_dtype)
    OUT["btrain.loss"] = np.asarray(loss.detach().numpy(), dtype=np.float64)
    for name, p in m.named_parameters():
        if p.grad is not None:
            OUT[f"btrain.grad.{name}"] = p.grad.detach().numpy().copy()


def gen_dampnet_finetune_e2e(model_damp, tiny):
    """The LIVE dampnet eval composition, executed by the reference itself:
    ``finetune(..., ds=True)`` (/root/reference/finetune.py:182-328, the ds
    branch at :313-314 — the dispatch the 50-shot driver ships,
    finetune_50.py:622,687) — transfer-fine-tune the last block on the
    augmented bank, then score the ADAPTED episode features with
    ``set_forward(is_feature=True, domain_shift=True)``.  Records the
    softmaxed episode scores + the np.random minibatch permutations."""
    import finetune as ref_ft

    gen = torch.Generator().manual_seed(11)
    torch.manual_seed(55)
    model_b = tiny()
    randomize_bn(model_b, gen)
    put("ftdamp_base", model_b)
    state_b = {f"feature.{k}": v for k, v in model_b.state_dict().items()}

    n_way, n_support = 3, 2  # must match the dampnet head (gen_dampnet_domain_shift)
    rs = np.random.RandomState(456)
    shape = (n_way, n_support + 15, 3, 224, 224)
    x_clean = rs.rand(*shape).astype(np.float32)
    x_aug = x_clean.copy()
    x_aug[:, :n_support] = rs.rand(n_way, n_support, 3, 224, 224).astype(np.float32)
    y = np.repeat(np.arange(n_way), n_support + 15)
    liz_x = [torch.from_numpy(x_clean), torch.from_numpy(x_clean.copy()), torch.from_numpy(x_aug)]

    torch.manual_seed(43)  # throwaway-classifier init (zero-grad on the GNN path)
    np.random.seed(FTDAMP_PERM_SEED)
    score = ref_ft.finetune(
        liz_x, torch.from_numpy(y), model_damp, state_b, save_it=600,
        n_query=15, n_way=n_way, n_support=n_support, ds=True,
    )
    OUT["ftdamp.scores"] = score.detach().numpy()

    np.random.seed(FTDAMP_PERM_SEED)
    bank = n_way * n_support * (len(liz_x) + 1)
    OUT["ftdamp.perms"] = np.stack([np.random.permutation(bank) for _ in range(E2E_FT_EPOCHS)])


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
    return m


DUNSUP_SEED = 55
DADAPT_FEAT_SEED = 56
DADAPT_PERM_SEED = 66
DADAPT_CLF_SEED = 123


def gen_dampnet_unsup(model_damp):
    """The ``--unsupervised`` recovery path, executed by the reference
    itself: ``set_forward_unsup(x, x_u_mean, x_u_std, is_feature=True)``
    (/root/reference/methods/dampnet_full_class.py:355-402) — the recovery
    NTN conditioned on EXTERNAL unlabeled-set statistics instead of the
    episode's own support stats, then fc projection + graph scoring."""
    import copy

    m = copy.deepcopy(model_damp)
    m.train()
    m.n_query = 15
    gen = torch.Generator().manual_seed(DUNSUP_SEED)
    x_u_mean = torch.randn(16, generator=gen)
    x_u_std = torch.randn(16, generator=gen).abs() + 0.5
    feats = torch.randn(3, 2 + 15, 16, generator=gen)
    OUT["dunsup.feats"] = feats.numpy()
    OUT["dunsup.x_u_mean"] = x_u_mean.numpy()
    OUT["dunsup.x_u_std"] = x_u_std.numpy()
    with torch.no_grad():
        OUT["dunsup.scores"] = m.set_forward_unsup(feats, x_u_mean, x_u_std, is_feature=True).numpy()


def gen_dampnet_adaptation_full(model_damp):
    """The dampnet linear-probe eval member, executed by the reference
    itself: ``set_forward_adaptation_full(x, is_feature=True)``
    (/root/reference/methods/dampnet_full_class.py:471-548) — recovery from
    the episode's class statistics, fc projection to gnn_dim=128, then a
    100-epoch x batch-4 (ragged 4+2) reference-SGD probe on the projected
    support, scoring the projected query.  FLOAT64 (the 2,500-step SGD
    recursion needs both sides at the f64 noise floor)."""
    import copy

    m = copy.deepcopy(model_damp).double()
    m.support_label = m.support_label.double()
    m.final_meta_prototype = m.final_meta_prototype.double()
    m.final_meta_prototype_std = m.final_meta_prototype_std.double()
    m.train()
    m.n_query = 15
    gen = torch.Generator().manual_seed(DADAPT_FEAT_SEED)
    feats = torch.randn(3, 2 + 15, 16, generator=gen, dtype=torch.float64)
    OUT["dadapt.feats"] = feats.numpy()
    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        torch.manual_seed(DADAPT_CLF_SEED)  # the nn.Linear probe init (:523)
        np.random.seed(DADAPT_PERM_SEED)
        scores = m.set_forward_adaptation_full(feats, is_feature=True)
        OUT["dadapt.scores"] = scores.detach().numpy()
        # recover the probe init: re-seed and replay the construction
        torch.manual_seed(DADAPT_CLF_SEED)
        clf = nn.Linear(m.gnn_dim, 3)
        OUT["dadapt.clf.weight"] = clf.weight.detach().numpy()
        OUT["dadapt.clf.bias"] = clf.bias.detach().numpy()
    finally:
        torch.set_default_dtype(prev_dtype)
    np.random.seed(DADAPT_PERM_SEED)
    OUT["dadapt.perms"] = np.stack([np.random.permutation(6) for _ in range(100)])


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


def gen_simple_block2():
    """backbone.SimpleBlock2 (reference backbone.py:90-130) — the
    ResNet10_FW building block — in EVAL mode, where the
    FeatureWiseTransformation2d_fw layers reduce to plain running-stat BN
    (the train-mode noise draws torch RNG and cannot be replayed cross-RNG;
    our sampled-noise math is oracle/shape-tested separately)."""
    import backbone as ref_bb

    gen = torch.Generator().manual_seed(10)
    block = ref_bb.SimpleBlock2(indim=4, outdim=8, half_res=True)
    randomize_bn(block, gen)
    x = torch.randn(3, 4, 8, 8, generator=gen)
    OUT["simple_block2.x"] = x.numpy()
    put("simple_block2", block)
    block.eval()
    with torch.no_grad():
        OUT["simple_block2.y_eval"] = block(x).numpy()


def gen_fwt_train_mode():
    """FeatureWiseTransformation2d_fw in TRAIN mode (reference
    backbone.py:333-350): batch-stats BN (+ running-stat update), then
    ``out = (1 + eps_g*softplus(gamma, beta=100))*out + eps_b*softplus(beta)``
    with per-channel standard-normal draws.  The draws are captured by
    intercepting ``torch.randn`` so the jax test replays the EXACT same
    noise (the RNG mapping itself is a documented deviation; the math given
    the draws is what this pins).  FLOAT64."""
    import backbone as ref_bb

    gen = torch.Generator().manual_seed(11)
    layer = ref_bb.FeatureWiseTransformation2d_fw(6).double()
    with torch.no_grad():
        layer.weight.uniform_(0.5, 1.5, generator=gen)
        layer.bias.uniform_(-0.3, 0.3, generator=gen)
        layer.running_mean.uniform_(-0.5, 0.5, generator=gen)
        layer.running_var.uniform_(0.5, 1.5, generator=gen)
        layer.gamma.uniform_(0.1, 0.6, generator=gen)
        layer.beta.uniform_(0.2, 0.8, generator=gen)
    x = torch.randn(4, 6, 5, 5, generator=gen, dtype=torch.float64)
    put("fwt", layer)
    OUT["fwt.x"] = x.numpy()

    draws = []
    real_randn = torch.randn

    def recording_randn(*shape, dtype=None, device=None):
        g2 = torch.Generator().manual_seed(500 + len(draws))
        t = real_randn(*shape, generator=g2, dtype=dtype)
        draws.append(t.detach().numpy().copy().reshape(-1))
        return t

    layer.train()
    torch.randn = recording_randn
    try:
        with torch.no_grad():
            y = layer(x)
    finally:
        torch.randn = real_randn
    assert len(draws) == 2, draws
    OUT["fwt.y_train"] = y.numpy()
    OUT["fwt.eps_gamma"], OUT["fwt.eps_beta"] = draws
    for k, v in layer.state_dict().items():
        if "running" in k:
            OUT[f"fwt.updated.{k}"] = v.detach().numpy().copy()


def gen_dampnet_prototype():
    """The PROTOTYPE DampNet variant (reference methods/dampnet.py — the
    ``--method dampnet`` model): the plain 'first' branch with the
    mean-center/L2-norm projection (:121-137), the even-count 'recover'
    branch driven by the rolling-store prototypes (:210-249), and the
    domain-shift eval branch (:250-291).  The odd-count corruption branch
    is covered by gen_dampnet_prototype_corrupt (recorded-draw replay)."""
    import dampnet as ref_dn

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    class IdentityBackbone(nn.Module):
        final_feat_dim = 16

        def forward(self, x):  # "images" are feature rows already
            return x

    gen = torch.Generator().manual_seed(9)
    torch.manual_seed(53)
    m = ref_dn.DampNet(IdentityBackbone, n_way=3, n_support=2)
    randomize_bn(m, gen)
    m.train()
    m.n_query = 15
    put("dproto", m)

    feats = torch.randn(3, 2 + 15, 16, generator=gen)
    store_mean = torch.randn(20, 16, generator=gen)
    store_std = torch.randn(20, 6, 16, generator=gen)
    OUT["dproto.feats"] = feats.numpy()
    OUT["dproto.store_mean"] = store_mean.numpy()
    OUT["dproto.store_std"] = store_std.numpy()

    # plain 'first' branch (call_count 150, first=True)
    m.first = True
    m.call_count = 150
    m.meta_store_mean = store_mean.clone()
    m.meta_store_std = store_std.clone()
    with torch.no_grad():
        OUT["dproto.scores_plain"] = m.set_forward(feats.view(3, 17, 16), is_feature=False).numpy()

    # even-count 'recover' branch: recovery vs rolling-store prototypes
    m.first = False
    m.call_count = 152
    m.meta_store_mean = store_mean.clone()
    m.meta_store_std = store_std.clone()
    with torch.no_grad():
        OUT["dproto.scores_recover"] = m.set_forward(feats.view(3, 17, 16), is_feature=False).numpy()

    # domain-shift eval branch (fixed final prototypes + znorm)
    m.final_meta_prototype = torch.randn(16, generator=gen)
    m.final_meta_prototype_std = torch.randn(16, generator=gen).abs() + 0.5
    m.final_meta_prototypes_initialized = True
    OUT["dproto.proto_mean"] = m.final_meta_prototype.numpy()
    OUT["dproto.proto_std"] = m.final_meta_prototype_std.numpy()
    with torch.no_grad():
        OUT["dproto.scores_ds"] = m.set_forward(feats, is_feature=True, domain_shift=True).numpy()
    return m


class _NpRandomRecorder:
    """Record the np.random draws a reference corruption branch makes
    (dampnet.py:149-160 / dampnet_full_class.py:149-168) so the drawn
    corruption matrix + bias can be reconstructed and replayed through the
    JAX side (whose Philox RNG cannot reproduce MT19937 streams)."""

    NAMES = ("random_sample", "shuffle", "choice", "standard_t")

    def __enter__(self):
        self.rec = {n: [] for n in self.NAMES}
        self._orig = {n: getattr(np.random, n) for n in self.NAMES}
        for n in self.NAMES:
            setattr(np.random, n, self._wrap(n))
        return self.rec

    def _wrap(self, name):
        orig, rec = self._orig[name], self.rec[name]

        def f(*a, **k):
            out = orig(*a, **k)
            # shuffle mutates in place and returns None: record the result
            rec.append(np.array(a[0] if name == "shuffle" else out))
            return out

        return f

    def __exit__(self, *exc):
        for n, fn in self._orig.items():
            setattr(np.random, n, fn)


def _reconstruct_corruption(rec, f: int, m_fac: float):
    """Corruption matrix + (unscaled) bias from recorded draws — the same
    composition as reference dampnet.py:149-164 (numpy fancy += applies
    duplicate indices once, which numpy reproduces here natively)."""
    one_zeros, ad_sub = rec["shuffle"]
    random_idx, random_idx2, rand_idx_col = (a.astype(int) for a in rec["choice"])
    t_sample = m_fac * rec["standard_t"][0].reshape(f, f)
    t_bias = -np.squeeze(t_sample[:, rand_idx_col]) + rec["standard_t"][1] + ad_sub
    corruption = np.diag(one_zeros)
    corruption[random_idx, random_idx2] += t_sample[random_idx, random_idx2]
    bias = np.zeros(f)
    bias[random_idx2] += t_bias[random_idx2]
    return corruption, bias


class _CaptureCorruptionMatmul:
    """Capture the square matrix passed to the corruption branch's single
    python-level ``torch.matmul`` (generator self-check for the recorded-draw
    reconstruction)."""

    def __init__(self, f: int):
        self.f, self.captured = f, []

    def __enter__(self):
        self._orig = torch.matmul

        def mm(a, b, *args, **kw):
            if isinstance(b, torch.Tensor) and b.dim() == 2 and b.shape[0] == b.shape[1] == self.f:
                self.captured.append(b.detach().clone())
            return self._orig(a, b, *args, **kw)

        torch.matmul = mm
        return self

    def __exit__(self, *exc):
        torch.matmul = self._orig


def gen_dampnet_prototype_corrupt(m):
    """The prototype variant's odd-count CORRUPTION branch, executed by the
    reference itself (dampnet.py:138-209): fixed constants perc=0.6/
    perc_zeros=0.3/m_fac=1.5, the drawn diagonal + t-distributed corruption
    (bias added UNscaled, :166), corrupt-support stats vs the rolling-store
    prototypes through both NTNs, mult/add recovery, znorm projection, GNN
    scoring — with NO head freezing (unlike the full family).  The drawn
    corruption is recorded and replayed through ``dampnet_scores(mode=
    'corrupt', corrupt_x=...)``."""
    f = 16
    feats = torch.from_numpy(OUT["dproto.feats"])
    m.first = False
    m.call_count = 151  # odd -> the corruption branch
    m.meta_store_mean = torch.from_numpy(OUT["dproto.store_mean"]).clone()
    m.meta_store_std = torch.from_numpy(OUT["dproto.store_std"]).clone()
    np.random.seed(4242)
    with _NpRandomRecorder() as rec, _CaptureCorruptionMatmul(f) as cap, torch.no_grad():
        scores = m.set_forward(feats.view(3, 17, f), is_feature=False)
    corruption, bias = _reconstruct_corruption(rec, f, m_fac=1.5)
    assert len(cap.captured) == 1
    np.testing.assert_allclose(corruption, cap.captured[0].numpy(), rtol=1e-6)
    assert rec["random_sample"] == []  # the prototype constants are pinned
    # dampnet.py:165-166: corrupt_x = x @ C + bias (unscaled)
    OUT["dproto.corrupt_x"] = (feats.view(-1, f).numpy().astype(np.float64) @ corruption + bias).astype(np.float32)
    OUT["dproto.scores_corrupt"] = scores.numpy()


def gen_dampnet_corrupt_backward():
    """The dampnet_full_class CORRUPTION training step's backward pass,
    executed by the reference itself (dampnet_full_class.py:145-218):
    sampled perc/perc_zeros/m_fac, the drawn corruption (bias scaled by
    m_fac, :174), corrupt-support stats vs the FIXED final prototypes,
    recovery, fc+GNN scoring with ``fc[0].weight/bias.requires_grad=False``
    and ``gnn.eval()`` (:199-201 — a numeric no-op for the stat-free BNs:
    the GNN and the fc BN affine still receive gradients), CE, backward.
    FLOAT64 on both sides; the reference's ``.float()`` casts are redirected
    to the default dtype so the f64 run keeps full precision (they are
    no-ops in the reference's own f32 execution)."""
    import dampnet_full_class as ref_damp

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    class IdentityBackbone(nn.Module):
        final_feat_dim = 16

        def forward(self, x):
            return x

    f = 16
    gen = torch.Generator().manual_seed(41)
    torch.manual_seed(79)
    m = ref_damp.DampNet(IdentityBackbone, n_way=3, n_support=2)
    randomize_bn(m, gen)
    put("dcorrupt", m)
    m = m.double()
    m.support_label = m.support_label.double()
    m.train()
    m.n_query = 5
    m.call_count = 151  # odd -> the corruption branch
    m.final_meta_prototype = torch.randn(f, generator=gen).double()
    m.final_meta_prototype_std = (torch.randn(f, generator=gen).abs() + 0.5).double()
    m.final_meta_prototypes_initialized = True
    OUT["dcorrupt.proto_mean"] = m.final_meta_prototype.numpy()
    OUT["dcorrupt.proto_std"] = m.final_meta_prototype_std.numpy()
    feats = torch.randn(3, 7, f, generator=gen).double()
    OUT["dcorrupt.feats"] = feats.numpy()

    prev_dtype = torch.get_default_dtype()
    prev_float = torch.Tensor.float
    torch.set_default_dtype(torch.float64)
    torch.Tensor.float = lambda self: self.to(torch.get_default_dtype())
    np.random.seed(777)
    try:
        with _NpRandomRecorder() as rec, _CaptureCorruptionMatmul(f) as cap:
            m.zero_grad(set_to_none=True)
            loss = m.set_forward_loss(feats.view(3 * 7, f))
            loss.backward()
    finally:
        torch.set_default_dtype(prev_dtype)
        torch.Tensor.float = prev_float

    # reconstruct the drawn corruption (sampled constants, :147-154)
    r_perc, r_perc_zeros, r_mfac = (float(v) for v in rec["random_sample"])
    m_fac = (5 - 1.5) * r_mfac + 1.5
    corruption, bias = _reconstruct_corruption(rec, f, m_fac=m_fac)
    assert len(cap.captured) == 1
    np.testing.assert_allclose(corruption, cap.captured[0].numpy(), rtol=1e-10)
    # dampnet_full_class.py:173-174: corrupt_x = x @ C + m_fac * bias
    OUT["dcorrupt.corrupt_x"] = feats.view(-1, f).numpy() @ corruption + m_fac * bias
    OUT["dcorrupt.loss"] = np.asarray(loss.detach().numpy(), dtype=np.float64)
    frozen = {"fc.0.weight", "fc.0.bias"}
    for name, p in m.named_parameters():
        if p.grad is not None:
            assert name not in frozen, f"{name} should be frozen on corrupt steps"
            OUT[f"dcorrupt.grad.{name}"] = p.grad.detach().numpy().copy()


def gen_bottleneck_block():
    """backbone.BottleneckBlock (reference backbone.py:264-311), half_res=True
    with the 1x1-conv shortcut, train-mode forward."""
    import backbone as ref_bb

    gen = torch.Generator().manual_seed(7)
    block = ref_bb.BottleneckBlock(indim=4, outdim=8, half_res=True)
    randomize_bn(block, gen)
    with torch.no_grad():
        block.C2.bias.uniform_(-0.2, 0.2, generator=gen)
    x = torch.randn(3, 4, 8, 8, generator=gen)
    OUT["bottleneck.x"] = x.numpy()
    put("bottleneck", block)
    block.train()
    with torch.no_grad():
        OUT["bottleneck.y_train"] = block(x).numpy()


def tiny_resnet_factory(ref_bb):
    """A 4-stage SimpleBlock ResNet with tiny widths, built from the
    reference's OWN classes (backbone.py:401-439).  Widths chosen so the
    final block has a shortcut (14 != 16) and hence exactly 9 trainable
    tensors — the reference's names[:-9] adaptation boundary lands on the
    structural last block (finetune.py:117,248)."""

    def tiny(flatten=True):
        return ref_bb.ResNet(ref_bb.SimpleBlock, [1, 1, 1, 1], [8, 12, 14, 16], flatten)

    return tiny


E2E_N_WAY, E2E_N_SUPPORT, E2E_N_QUERY = 2, 2, 15  # 15 queries: gnnnet.py:52 asserts n_support+15
E2E_IMG_SEED = 123
E2E_CLF_SEED_GNN, E2E_CLF_SEED_LIN = 41, 42
E2E_PERM_SEED_GNN, E2E_PERM_SEED_LIN = 31, 32
E2E_FT_EPOCHS = 1


def e2e_episode_tensors():
    """Deterministic episode + one augmented support replica (regenerated
    identically by the test, so the 20 MB of images never hit the fixture).
    Returns (liz_x, y) in the loader's elem format: liz_x[0] == liz_x[1]
    (the clean duplicate the loader asserts at finetune.py:606)."""
    rs = np.random.RandomState(E2E_IMG_SEED)
    shape = (E2E_N_WAY, E2E_N_SUPPORT + E2E_N_QUERY, 3, 224, 224)
    x_clean = rs.rand(*shape).astype(np.float32)
    x_aug = x_clean.copy()
    x_aug[:, :E2E_N_SUPPORT] = rs.rand(E2E_N_WAY, E2E_N_SUPPORT, 3, 224, 224).astype(np.float32)
    y = np.repeat(np.arange(E2E_N_WAY), E2E_N_SUPPORT + E2E_N_QUERY)
    return [x_clean, x_clean.copy(), x_aug], y


def gen_finetune_e2e():
    """THE composed hot path, executed by the reference itself: run
    ``finetune.finetune`` (the GNN member, /root/reference/finetune.py:182-328)
    and ``finetune.finetune_linear`` (the baseline member, :45-174) at tiny
    geometry and record the episode scores.  This covers bank assembly with
    the triple-counted clean support (:225-233), the inner Adam loop with
    train-mode BN over minibatches of 5 (:261-299), and head scoring on the
    adapted backbone (:303-317) — end to end, against the reference's own
    execution (VERDICT r2 Missing #1)."""
    import types

    import backbone as ref_bb

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    # torchvision isn't installed in this image; finetune.py only needs it
    # transitively through the loader modules, which this run never exercises
    # (tensors are fed directly) — stub just enough for the imports.
    if "torchvision" not in sys.modules:

        class _Dummy:  # permissive stand-in for any transform/dataset class
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                return a[0] if a else None

        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv_d = types.ModuleType("torchvision.datasets")
        tv_t.__getattr__ = lambda name: _Dummy  # transforms.X() at class-def time
        tv_d.__getattr__ = lambda name: _Dummy
        tv.transforms = tv_t
        tv.datasets = tv_d
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_t
        sys.modules["torchvision.datasets"] = tv_d

    import finetune as ref_ft
    import gnnnet as ref_gnnnet

    tiny = tiny_resnet_factory(ref_bb)
    ref_ft.model_dict["TinyNet"] = tiny
    ref_ft.params = types.SimpleNamespace(model="TinyNet", fine_tune_epoch=E2E_FT_EPOCHS)

    gen = torch.Generator().manual_seed(8)
    liz_x, y = e2e_episode_tensors()
    liz_x = [torch.from_numpy(x) for x in liz_x]

    # --- GNN member: meta-trained GnnNet over the tiny backbone ----------
    torch.manual_seed(51)
    model_gnn = ref_gnnnet.GnnNet(tiny, n_way=E2E_N_WAY, n_support=E2E_N_SUPPORT)
    randomize_bn(model_gnn, gen)
    put("fte2e_gnn", model_gnn)
    state_gnn = model_gnn.state_dict()  # feature.* keys feed the rebuild (:187-198)

    torch.manual_seed(E2E_CLF_SEED_GNN)  # makes the throwaway-classifier init recoverable
    np.random.seed(E2E_PERM_SEED_GNN)  # makes the minibatch perms recoverable (:272)
    score_gnn = ref_ft.finetune(
        liz_x, torch.from_numpy(y), model_gnn, state_gnn, save_it=600,
        n_query=15, n_way=E2E_N_WAY, n_support=E2E_N_SUPPORT,
    )
    OUT["fte2e.scores_gnn"] = score_gnn.detach().numpy()

    # recover + record the exact permutations the reference drew
    np.random.seed(E2E_PERM_SEED_GNN)
    bank = E2E_N_WAY * E2E_N_SUPPORT * (len(liz_x) + 1)
    OUT["fte2e.perms_gnn"] = np.stack([np.random.permutation(bank) for _ in range(E2E_FT_EPOCHS)])

    # --- baseline member: independently-initialized tiny backbone --------
    torch.manual_seed(52)
    model_b = tiny()
    randomize_bn(model_b, gen)
    put("fte2e_base", model_b)
    state_b = {f"feature.{k}": v for k, v in model_b.state_dict().items()}

    torch.manual_seed(E2E_CLF_SEED_LIN)
    np.random.seed(E2E_PERM_SEED_LIN)
    score_lin = ref_ft.finetune_linear(
        liz_x, torch.from_numpy(y), state_in=state_b, save_it=400, linear=True,
        n_query=15, n_way=E2E_N_WAY, n_support=E2E_N_SUPPORT,
    )
    OUT["fte2e.scores_linear"] = score_lin.detach().numpy()

    np.random.seed(E2E_PERM_SEED_LIN)
    sup = E2E_N_WAY * E2E_N_SUPPORT
    OUT["fte2e.perms_linear"] = np.stack([np.random.permutation(sup) for _ in range(20)])  # 20 epochs (:139)

    # recover the classifier inits: re-seed and replay the construction
    # order inside finetune() (tiny backbone first, classifier second)
    for seed, tag in [(E2E_CLF_SEED_GNN, "clf_gnn"), (E2E_CLF_SEED_LIN, "clf_linear")]:
        torch.manual_seed(seed)
        _ = tiny()
        clf = ref_ft.Classifier(16, E2E_N_WAY)
        OUT[f"fte2e.{tag}.weight"] = clf.fc.weight.detach().numpy()
        OUT[f"fte2e.{tag}.bias"] = clf.fc.bias.detach().numpy()

    # ensemble = softmax-sum (finetune.py:648-650)
    OUT["fte2e.scores_all"] = (score_lin + score_gnn).detach().numpy()
    return model_gnn, tiny


E2E50_N_WAY, E2E50_N_SUPPORT = 2, 4  # the compressed head halves to 2
E2E50_IMG_SEED, E2E50_CLF_SEED, E2E50_PERM_SEED = 654, 61, 62


def e2e50_episode_tensors():
    """Deterministic 50-shot-style episode (regenerated identically by the
    test): liz_x = [clean, clean duplicate, one augmented replica]."""
    rs = np.random.RandomState(E2E50_IMG_SEED)
    shape = (E2E50_N_WAY, E2E50_N_SUPPORT + 15, 3, 224, 224)
    x_clean = rs.rand(*shape).astype(np.float32)
    x_aug = x_clean.copy()
    x_aug[:, :E2E50_N_SUPPORT] = rs.rand(E2E50_N_WAY, E2E50_N_SUPPORT, 3, 224, 224).astype(np.float32)
    y = np.repeat(np.arange(E2E50_N_WAY), E2E50_N_SUPPORT + 15)
    return [x_clean, x_clean.copy(), x_aug], y


def gen_finetune50_e2e(tiny):
    """The 50-shot driver's composed GNN-member eval path, executed by the
    reference itself: ``finetune_50.finetune()``
    (/root/reference/finetune_50.py:185-310 — the same head-agnostic
    adaptation body as finetune.py, incl. the triple-counted clean support
    and the features-as-logits inner CE) scoring the ADAPTED episode
    features through the COMPRESSED gnnnet_copy head (post-fc pair-averaged
    support embeddings, gnnnet_copy.py:51-78).  Completes the composed-path
    golden matrix: every shipped driver's headline member end to end."""
    import types

    import finetune_50 as ref_ft50
    import gnnnet_copy as ref_gnn50

    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    ref_ft50.model_dict["TinyNet"] = tiny
    ref_ft50.params = types.SimpleNamespace(model="TinyNet", fine_tune_epoch=1)

    gen = torch.Generator().manual_seed(17)
    liz_x_np, y = e2e50_episode_tensors()
    liz_x = [torch.from_numpy(x) for x in liz_x_np]

    torch.manual_seed(57)
    model50 = ref_gnn50.GnnNet(tiny, n_way=E2E50_N_WAY, n_support=E2E50_N_SUPPORT)
    assert model50.n_support == E2E50_N_SUPPORT // 2  # round(n/2), gnnnet_copy.py:34
    randomize_bn(model50, gen)
    put("ft50e2e_gnn", model50)
    state50 = model50.state_dict()

    torch.manual_seed(E2E50_CLF_SEED)  # throwaway classifier (scores unused)
    np.random.seed(E2E50_PERM_SEED)  # makes the minibatch perms recoverable
    score = ref_ft50.finetune(
        liz_x, torch.from_numpy(y), model50, state50, save_it=600,
        n_query=15, n_way=E2E50_N_WAY, n_support=E2E50_N_SUPPORT,
    )
    OUT["ft50e2e.scores_gnn"] = score.detach().numpy()

    np.random.seed(E2E50_PERM_SEED)
    bank = E2E50_N_WAY * E2E50_N_SUPPORT * (len(liz_x) + 1)  # 32
    OUT["ft50e2e.perms"] = np.stack([np.random.permutation(bank)])  # 1 epoch


def main():
    gen_simple_block()
    gen_gnn_pieces()
    gen_gnnnet_set_forward()
    gen_gnnnet50_set_forward()
    model_damp = gen_dampnet_domain_shift()
    gen_dampnet_unsup(model_damp)
    gen_dampnet_adaptation_full(model_damp)
    gen_optimizers()
    gen_bottleneck_block()
    model_gnn, tiny = gen_finetune_e2e()
    gen_finetune50_e2e(tiny)
    gen_train_step_backward(model_gnn)
    gen_meta_finetune_backward(model_gnn)
    gen_protonet_finetune_backward(tiny)
    gen_probe_adaptation()
    master50 = gen_gnnnet50_train_backward(tiny)
    gen_gnnnet50_finetune_backward(master50)
    gen_dampnet_train_backward(tiny)
    gen_baseline_train_backward(tiny)
    gen_dampnet_finetune_e2e(model_damp, tiny)
    model_dproto = gen_dampnet_prototype()
    gen_dampnet_prototype_corrupt(model_dproto)
    gen_dampnet_corrupt_backward()
    gen_simple_block2()
    gen_fwt_train_mode()
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
