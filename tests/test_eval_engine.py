"""Per-episode transfer fine-tune eval engine on tiny shapes."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mft_tpu.core.episode import EpisodeSpec
from mft_tpu.methods import gnnnet as gn
from mft_tpu.models import backbone as bb
from mft_tpu.ops.augment import AugmentCfg
from mft_tpu.train import eval_engine as ee

SPEC = EpisodeSpec(n_way=3, n_support=2, n_query=3)
BCFG = bb.resnet10()
GCFG = gn.GnnNetCfg(feat_dim=512, n_way=3, n_support=2)
TCFG = ee.TransferCfg(fine_tune_epochs=2, linear_epochs=2)
IMG = 32
ACFG = AugmentCfg(image_size=IMG)
R = 3  # replicas: clean x3 (gen_examples=0 analogue)
MKW = dict(aug_cfg=ACFG, gen_examples=0)


@functools.lru_cache(maxsize=None)
def _setup():
    k = jax.random.PRNGKey(0)
    kb, kh = jax.random.split(k)
    params, stats = jax.jit(lambda k: bb.init_backbone(k, BCFG))(kb)
    head = jax.jit(lambda k: gn.init_head(k, GCFG))(kh)
    rs = np.random.RandomState(0)
    # classes separable by channel mean so fine-tuning has signal
    episode = rs.rand(SPEC.n_way, SPEC.n_per_class, IMG, IMG, 3).astype(np.float32) * 0.1
    for c in range(SPEC.n_way):
        episode[c, :, :, :, c] += 1.0
    episode = np.clip(episode, 0.0, 1.0)
    support = episode[:, : SPEC.n_support]
    replicas = np.stack([support] * R)  # materialized clean bank (minibatch path)
    return params, stats, head, jnp.asarray(episode), jnp.asarray(support), jnp.asarray(replicas)


def _bank(bn_mode, support, replicas):
    """Fast (episode) mode takes the raw support; the faithful minibatch
    mode takes materialized replicas."""
    return support if bn_mode == "episode" else replicas


@pytest.mark.parametrize("bn_mode", ["episode", "minibatch"])
def test_gnn_member_scores_shape_and_softmax(bn_mode):
    params, stats, head, episode, support, replicas = _setup()
    tcfg = TCFG._replace(bn_mode=bn_mode)
    bank = _bank(bn_mode, support, replicas)
    fn = jax.jit(
        lambda p, s, h, e, r, ka, k: ee.gnn_member_scores(
            p, s, h, e, r, ka, k, bcfg=BCFG, gcfg=GCFG, spec=SPEC, tcfg=tcfg, **MKW
        )
    )
    scores = fn(params, stats, head, episode, bank, jax.random.PRNGKey(0), jax.random.PRNGKey(1))
    assert scores.shape == (SPEC.query_size, SPEC.n_way)
    np.testing.assert_allclose(np.asarray(scores).sum(1), 1.0, atol=1e-5)


@pytest.mark.parametrize("bn_mode", ["episode", "minibatch"])
def test_linear_member_learns_separable_classes(bn_mode):
    params, stats, head, episode, support, replicas = _setup()
    tcfg = TCFG._replace(linear_epochs=20, bn_mode=bn_mode)
    bank = _bank(bn_mode, support, replicas)
    fn = jax.jit(
        lambda p, s, e, r, ka, k: ee.linear_member_scores(
            p, s, e, r, ka, k, bcfg=BCFG, spec=SPEC, tcfg=tcfg, **MKW
        )
    )
    scores = fn(params, stats, episode, bank, jax.random.PRNGKey(0), jax.random.PRNGKey(2))
    acc = ee.episode_accuracy(scores, SPEC)
    assert scores.shape == (SPEC.query_size, SPEC.n_way)
    # color-separable classes: the probe should beat chance (33%) comfortably
    assert float(acc) > 50.0


def test_ensemble_sums_two_softmaxes():
    params, stats, head, episode, support, replicas = _setup()
    fn = jax.jit(
        lambda p, s, h, e, r, ka, k: ee.ensemble_episode_scores(
            p, s, p, s, h, e, r, ka, k, bcfg=BCFG, gcfg=GCFG, spec=SPEC, tcfg=TCFG, **MKW
        )
    )
    scores = fn(params, stats, head, episode, support, jax.random.PRNGKey(0), jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(scores).sum(1), 2.0, atol=1e-5)


def test_ensemble_fuse_lane_matches_seq():
    """ensemble_fuse='lane' (both members' inner scans share iterations,
    inner_fit_pair) is numerically identical to the sequential path: same
    key flow, same schedules, same update math — only the scan structure
    differs (and lax.scan splitting at a step boundary is exact).  Uses
    unequal member epochs so both the fused prefix AND the GNN tail scan
    are exercised."""
    params, stats, head, episode, support, replicas = _setup()
    tcfg_seq = TCFG._replace(fine_tune_epochs=3, linear_epochs=2)
    tcfg_lane = tcfg_seq._replace(ensemble_fuse="lane")

    def run(tcfg):
        fn = jax.jit(
            lambda p, s, h, e, r, ka, k, t=tcfg: ee.ensemble_episode_scores(
                p, s, p, s, h, e, r, ka, k, bcfg=BCFG, gcfg=GCFG, spec=SPEC, tcfg=t, **MKW
            )
        )
        return np.asarray(
            fn(params, stats, head, episode, support, jax.random.PRNGKey(0), jax.random.PRNGKey(3))
        )

    np.testing.assert_allclose(run(tcfg_lane), run(tcfg_seq), atol=2e-6)


def test_fanout_group_pass_matches():
    """fanout_group_pass > 1 (replica groups batched into one trunk pass
    with per-group BN statistics) equals the group-at-a-time fan-out: same
    augment draws, same per-group whole-bank BN semantics, one kernel.
    gen_examples=3 -> G=4 groups; group_pass=2 exercises the multi-pass
    lax.map reshape, 4 the single-pass path.  The feature bank is compared
    tightly (the only tolerance is conv batch-size accumulation order,
    ~1e-5); downstream scores are compared by argmax + a loose bound (500
    chaotic Adam steps amplify that 1e-5)."""
    params, stats, head, episode, support, replicas = _setup()
    trunk_p, _ = bb.adapt_split(params)
    trunk_s, _ = bb.adapt_split(stats)

    def fmap(gp):
        fn = jax.jit(
            lambda s: ee._bank_fmap(
                trunk_p, trunk_s, s, jax.random.PRNGKey(5),
                bcfg=BCFG, aug_cfg=ACFG, gen_examples=3, bn_train=True, group_pass=gp,
            )
        )
        return np.asarray(fn(support))

    base_fmap = fmap(1)
    for gp in (2, 4):
        np.testing.assert_allclose(fmap(gp), base_fmap, atol=1e-4)

    def scores(tcfg):
        fn = jax.jit(
            lambda p, s, h, e, r, ka, k, t=tcfg: ee.gnn_member_scores(
                p, s, h, e, r, ka, k, bcfg=BCFG, gcfg=GCFG, spec=SPEC, tcfg=t,
                aug_cfg=ACFG, gen_examples=3,
            )
        )
        return np.asarray(
            fn(params, stats, head, episode, support, jax.random.PRNGKey(0), jax.random.PRNGKey(1))
        )

    base = scores(TCFG)
    got = scores(TCFG._replace(fanout_group_pass=4))
    assert (got.argmax(1) == base.argmax(1)).mean() >= 0.9
    np.testing.assert_allclose(got, base, atol=0.05)


def test_fanout_group_pass_large_groups_fall_back():
    """Support groups past the 128-image BN sub-chunk threshold must take
    the group-at-a-time path: the grouped pass computes whole-group BN
    statistics, which only equals the default path when the default path
    doesn't sub-chunk (50-shot groups are 250 images).  Pinned by requiring
    bit-identity — only true when group_pass>1 actually falls back."""
    params, stats, _, _, _, _ = _setup()
    trunk_p, _ = bb.adapt_split(params)
    trunk_s, _ = bb.adapt_split(stats)
    rs = np.random.RandomState(1)
    support = jnp.asarray(rs.rand(5, 26, IMG, IMG, 3).astype(np.float32))  # n=130 > 128

    def fmap(gp):
        fn = jax.jit(
            lambda s: ee._bank_fmap(
                trunk_p, trunk_s, s, jax.random.PRNGKey(5),
                bcfg=BCFG, aug_cfg=ACFG, gen_examples=3, bn_train=True, group_pass=gp,
            )
        )
        return np.asarray(fn(support))

    np.testing.assert_array_equal(fmap(2), fmap(1))


def test_grouped_batch_norm_matches_per_group():
    """ops/norm.py batch_norm(groups=G) == G separate batch-stats calls."""
    from mft_tpu.ops.norm import batch_norm

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(12, 6, 6, 4).astype(np.float32))
    p = {"scale": jnp.asarray(rs.rand(4).astype(np.float32) + 0.5),
         "bias": jnp.asarray(rs.randn(4).astype(np.float32) * 0.2)}
    grouped, _ = jax.jit(lambda x: batch_norm(x, p, None, use_batch_stats=True, groups=3))(x)
    per = [jax.jit(lambda xg: batch_norm(xg, p, None, use_batch_stats=True)[0])(x[i * 4 : (i + 1) * 4]) for i in range(3)]
    np.testing.assert_allclose(np.asarray(grouped), np.concatenate([np.asarray(v) for v in per]), atol=1e-6)


def test_episode_scores_deterministic_and_vmappable():
    params, stats, head, episode, support, replicas = _setup()
    fn = jax.jit(
        lambda p, s, h, e, r, ka, k: ee.gnn_member_scores(
            p, s, h, e, r, ka, k, bcfg=BCFG, gcfg=GCFG, spec=SPEC, tcfg=TCFG, **MKW
        )
    )
    ka = jax.random.PRNGKey(6)
    a = fn(params, stats, head, episode, support, ka, jax.random.PRNGKey(7))
    b = fn(params, stats, head, episode, support, ka, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # vmap across an episode batch — the >=20x lever
    eps = jnp.stack([episode, episode])
    sups = jnp.stack([support, support])
    keys = jnp.stack([jax.random.PRNGKey(8), jax.random.PRNGKey(8)])  # same key -> same scores
    vfn = jax.jit(
        jax.vmap(
            lambda e, r, k: ee.gnn_member_scores(
                params, stats, head, e, r, k, k, bcfg=BCFG, gcfg=GCFG, spec=SPEC, tcfg=TCFG, **MKW
            )
        )
    )
    out = vfn(eps, sups, keys)
    assert out.shape == (2, SPEC.query_size, SPEC.n_way)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-5)


def test_inner_param_dtype_bf16_agrees_with_f32():
    """bf16-carried inner-loop parameters (the HBM-traffic lever) must agree
    with the f32 carry on prediction argmax for separable classes."""
    params, stats, head, episode, support, replicas = _setup()
    outs = {}
    for pd in ("float32", "bfloat16"):
        tcfg = TCFG._replace(linear_epochs=20, inner_param_dtype=pd)
        fn = jax.jit(
            lambda p, s, e, r, ka, k: ee.linear_member_scores(
                p, s, e, r, ka, k, bcfg=BCFG, spec=SPEC, tcfg=tcfg, **MKW
            )
        )
        outs[pd] = np.asarray(fn(params, stats, episode, support, jax.random.PRNGKey(0), jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(outs["float32"].argmax(1), outs["bfloat16"].argmax(1))
    np.testing.assert_allclose(outs["float32"], outs["bfloat16"], atol=0.15)


def test_adam_lowmem_fp8_state_tracks_bf16_briefly():
    """torch_adam_lowmem's narrow-state generality: fp8-e4m3 moments (with
    the nu pre-scale) track the bf16 state over a few steps.  NOTE: fp8
    state was measured and rejected for the 500-step eval scans — accuracy
    collapses at that length (docs/PERF.md); this only pins the optimizer
    math."""
    import optax

    from mft_tpu.train import optimizers as opt

    p0 = jnp.asarray(np.linspace(-0.5, 0.5, 16), jnp.float32)
    grads = jnp.asarray(np.random.RandomState(0).randn(5, 16) * 0.1, jnp.float32)
    outs = {}
    for sd in (jnp.bfloat16, jnp.float8_e4m3fn):
        tx = opt.torch_adam_lowmem(0.01, state_dtype=sd)
        p, s = p0, tx.init(p0)
        for i in range(5):
            up, s = tx.update(grads[i], s, p)
            p = optax.apply_updates(p, up)
        outs[sd] = np.asarray(p)
    # fp8's ~6% state error shows up as ~1e-2 param drift within 5 steps of
    # lr=0.01 — exactly why it fails at 500 steps; this only bounds the drift
    np.testing.assert_allclose(outs[jnp.bfloat16], outs[jnp.float8_e4m3fn], atol=2e-2)


def test_inner_gather_epoch_equals_step():
    """The epoch-wise bank permutation (gather hoisted out of the scan) is
    numerically IDENTICAL to the per-step gather under the same key — same
    permutations, same rows, same order."""
    params, stats, head, episode, support, replicas = _setup()
    outs = {}
    for mode in ("step", "epoch"):
        tcfg = TCFG._replace(linear_epochs=5, fine_tune_epochs=3, inner_gather=mode)
        fn = jax.jit(
            lambda p, s, h, e, r, ka, k: ee.ensemble_episode_scores(
                p, s, p, s, h, e, r, ka, k, bcfg=BCFG, gcfg=GCFG, spec=SPEC, tcfg=tcfg, **MKW
            )
        )
        outs[mode] = np.asarray(
            fn(params, stats, head, episode, support, jax.random.PRNGKey(0), jax.random.PRNGKey(3))
        )
    np.testing.assert_allclose(outs["step"], outs["epoch"], rtol=1e-6, atol=1e-6)


def test_freeze_backbone_paths():
    """--freeze_backbone: no adaptation in the GNN member (scores are
    key-independent), head-only training + eval-mode BN in the linear member
    (reference finetune.py:123-135,263-266)."""
    params, stats, head, episode, support, replicas = _setup()
    tcfg = TCFG._replace(freeze_backbone=True)
    g = jax.jit(
        lambda k: ee.gnn_member_scores(
            params, stats, head, episode, support, k, k, bcfg=BCFG, gcfg=GCFG, spec=SPEC, tcfg=tcfg, **MKW
        )
    )
    a = g(jax.random.PRNGKey(1))
    b = g(jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    lin = jax.jit(
        lambda k: ee.linear_member_scores(
            params, stats, episode, support, k, k, bcfg=BCFG, spec=SPEC, tcfg=tcfg, **MKW
        )
    )
    s = lin(jax.random.PRNGKey(3))
    assert s.shape == (SPEC.query_size, SPEC.n_way)
    np.testing.assert_allclose(np.asarray(s).sum(1), 1.0, atol=1e-5)


def test_bn_mode_agreement_bound():
    """Regression bound on the episode-vs-minibatch BN divergence: on
    color-separable episodes the two modes must agree in mean accuracy and
    predictions (the full-scale study lives in tools/bn_divergence_study.py;
    numbers in docs/PERF.md)."""
    params, stats, head, episode, support, replicas = _setup()
    rs = np.random.RandomState(7)
    eps = []
    for i in range(6):
        e = rs.rand(SPEC.n_way, SPEC.n_per_class, IMG, IMG, 3).astype(np.float32) * 0.2
        for c in range(SPEC.n_way):
            e[c, :, :, :, c] += 0.8
        eps.append(np.clip(e, 0.0, 1.0))
    eps = jnp.asarray(np.stack(eps))
    keys = jax.random.split(jax.random.PRNGKey(11), eps.shape[0])

    out = {}
    for mode in ("episode", "minibatch"):
        tcfg = TCFG._replace(linear_epochs=20, bn_mode=mode)
        prog = ee.make_eval_program(
            method="baseline", bcfg=BCFG, gcfg=None, spec=SPEC, tcfg=tcfg, aug_cfg=ACFG, gen_examples=2
        )
        scores, acc = prog({"baseline": (params, stats)}, eps, keys)
        out[mode] = (np.asarray(scores), np.asarray(acc))
    acc_e, acc_m = out["episode"][1].mean(), out["minibatch"][1].mean()
    assert acc_e > 60.0 and acc_m > 60.0
    # bounds within ~5x of measured reality (+0.03 pp mean delta / 99.97%
    # argmax agreement at full scale, docs/PERF.md; this small fixture
    # measures 0.0 pp / 100%), so a fast-path numerics regression actually
    # fails CI (VERDICT r3 weak #6) — the old 15 pp / 75% bound allowed a
    # bug two orders of magnitude worse than reality to pass
    assert abs(acc_e - acc_m) <= 3.0
    agree = np.mean(
        out["episode"][0].reshape(-1, SPEC.n_way).argmax(1)
        == out["minibatch"][0].reshape(-1, SPEC.n_way).argmax(1)
    )
    assert agree >= 0.95


def test_inner_carry_flat_equals_tree():
    """The contiguous flat carry (one ravelled buffer per optimizer group)
    is elementwise the same program as the structured pytree carry."""
    params, stats, head, episode, support, replicas = _setup()
    outs = {}
    for carry in ("tree", "flat"):
        tcfg = TCFG._replace(inner_carry=carry)
        fn = jax.jit(
            lambda p, s, h, e, r, ka, k, t=tcfg: ee.ensemble_episode_scores(
                p, s, p, s, h, e, r, ka, k, bcfg=BCFG, gcfg=GCFG, spec=SPEC, tcfg=t, **MKW
            )
        )
        outs[carry] = np.asarray(fn(params, stats, head, episode, support, jax.random.PRNGKey(0), jax.random.PRNGKey(1)))
    np.testing.assert_allclose(outs["flat"], outs["tree"], rtol=2e-5, atol=2e-5)


def test_dampnet_member_live_vs_nofinetune():
    """The live dampnet member (finetune_50.py:589-687 composition) adapts
    the backbone before domain-shift scoring; the nofinetune branch does not.
    With zero fine-tune epochs the two compositions collapse to the same
    program (modulo the probe fusion, which only nofinetune applies)."""
    from mft_tpu.methods import dampnet as dn

    params, stats, head, episode, support, replicas = _setup()
    dcfg = dn.DampNetCfg(feat_dim=512, n_way=SPEC.n_way, n_support=SPEC.n_support)
    dparams, dstate = jax.jit(lambda k: dn.init_dampnet(k, dcfg))(jax.random.PRNGKey(3))
    dstate = dn.update_prototypes(dstate, jax.random.normal(jax.random.PRNGKey(4), (32, 512)))

    def run(tcfg, eval_mode, fusion=True):
        fn = jax.jit(
            lambda p, s, e, r, ka, k: ee.dampnet_member_scores(
                p, s, dparams, dstate, e, r, ka, k, bcfg=BCFG, dcfg=dcfg, spec=SPEC,
                tcfg=tcfg, eval_mode=eval_mode, with_linear_fusion=fusion, **MKW,
            )
        )
        return np.asarray(fn(params, stats, episode, support, jax.random.PRNGKey(0), jax.random.PRNGKey(1)))

    live = run(TCFG, "finetune")
    assert live.shape == (SPEC.query_size, SPEC.n_way)
    np.testing.assert_allclose(live.sum(1), 1.0, atol=1e-5)  # no fusion on the live path

    nofit = run(TCFG, "nofinetune", fusion=False)
    # adaptation moved the features -> different scores
    assert not np.allclose(live, nofit, atol=1e-5)

    # epochs=0 collapses the live member onto the fusion-free nofinetune one
    live0 = run(TCFG._replace(fine_tune_epochs=0), "finetune")
    np.testing.assert_allclose(live0, nofit, rtol=1e-5, atol=1e-5)

    # nofinetune keeps the reference's probe fusion: sums to 1 + 1/2
    fused = run(TCFG, "nofinetune", fusion=True)
    np.testing.assert_allclose(fused.sum(1), 1.5, atol=1e-4)


def test_accuracy_and_ci_helpers():
    scores = jnp.asarray(np.eye(3).repeat(3, axis=0))  # perfect predictions
    assert float(ee.episode_accuracy(scores, SPEC)) == 100.0
    mean, ci = ee.mean_ci95(np.asarray([50.0, 60.0, 70.0]))
    assert abs(mean - 60.0) < 1e-6 and ci > 0
