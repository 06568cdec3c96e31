"""Whole-driver TRAINING parity vs the committed run of the reference's OWN
train.py (fixture: tools/run_reference_train_e2e.py — the reference driver
was executed end to end, argparse -> SetDataManager loader -> assigned-
checkpoint resume -> train_loop2 / train_loop_finetune -> MAML_update ->
torch.save, on a staged 64-class tree resuming from a checkpoint this
framework exported; its per-episode losses and exact episode composition
are committed).  Here the SAME staged data and checkpoint are rebuilt from
their seeds and ``mft_tpu.cli.train --episode_manifest`` replays the
reference's exact episodes as a subprocess, comparing the per-episode loss
sequences.

On the plain and baseline tiers training replay has NO free variables:
--train_aug is off (deterministic pixel-exact clean chain), gnn dropout is
construction-disabled upstream (gnn.py:60 ``drop=False``), and both
drivers resume with a fresh Adam — so the tolerance is pure cross-backend
float32 numerics amplified over the episode sequence (Adam's first step is
lr*sign(g): roundoff near zero-gradient coordinates flips them by 2*lr, so
divergence grows in lr units, not machine epsilon; the FIRST episode's
loss matches to ~1e-7 before any optimizer step).  The fine_tune tier has
one free variable — set_forward_finetune's unseeded inner
np.random.permutation (gnnnet.py:154) — and gets the looser, observed
bound, like the eval fte1 tiers.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import run_reference_train_e2e as rte  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "reference_train_e2e.json")

#: (observed-delta multiplier, absolute floor) per tier, applied to the
#: fixture's recorded generation-time ``loss_compare.max_abs_delta``.  The
#: deterministic tiers get a wide multiplier on a tiny observed delta (pure
#: f32 chaos, ~1e-2); the fine_tune tier's observed delta already includes
#: its inner-RNG freedom, so a small multiplier over a loose floor.
#: (CI reruns our deterministic side, so the CI delta ≈ the generation
#: delta up to backend/BLAS drift — 3x margin is ample)
TOL_POLICY = {"plain": (3.0, 2e-3), "baseline": (3.0, 2e-3), "fine_tune": (3.0, 0.5),
              "train50": (3.0, 2e-3)}
#: pre-any-optimizer-step first episode: pure forward semantics, immune to
#: Adam chaos — must match essentially exactly on every tier but fine_tune
#: (whose first loss already sits behind an RNG-dependent inner adaptation)
FIRST_EPISODE_TOL = 5e-4


@pytest.fixture(scope="module")
def fixture():
    if not os.path.exists(FIXTURE):
        pytest.skip("run tools/run_reference_train_e2e.py to generate the train-e2e fixture")
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def staged(fixture, tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_train_e2e")
    mini_root = str(root / "miniImageNet64")
    data_hash = rte.stage_dataset(mini_root, **fixture["stage"])
    if data_hash != fixture["data_hash"]:
        pytest.skip("PIL JPEG encoder produced different bytes than at fixture generation; "
                    "regenerate with tools/run_reference_train_e2e.py")
    mini_root_ft = None
    if "stage_ft" in fixture:
        mini_root_ft = str(root / "miniImageNet64_ft")
        if rte.stage_dataset(mini_root_ft, **fixture["stage_ft"]) != fixture["data_hash_ft"]:
            pytest.skip("staged fine-tune tree bytes differ from fixture generation; "
                        "regenerate with tools/run_reference_train_e2e.py")
    mini_root_50 = None
    if "stage_50" in fixture:
        mini_root_50 = str(root / "miniImageNet64_50")
        if rte.stage_dataset(mini_root_50, **fixture["stage_50"]) != fixture["data_hash_50"]:
            pytest.skip("staged 50-shot tree bytes differ from fixture generation; "
                        "regenerate with tools/run_reference_train_e2e.py")
    return {"plain": mini_root, "baseline": mini_root, "fine_tune": mini_root_ft,
            "train50": mini_root_50}, str(root)


def _replay(fixture, staged, tier):
    roots, root = staged
    run = fixture["runs"][tier]
    ref = run["reference"]
    method = "gnnnet50" if tier == "train50" else ref["method"]
    tier_root = roots[tier]
    our_save = os.path.join(root, f"ours_{tier}")
    ckpt_hash = rte.make_train_checkpoint(our_save, None, fixture["ckpt_seed"], method)
    if ckpt_hash != fixture[f"ckpt_hash_{method}"]:
        pytest.skip("jax PRNG produced different init weights than at fixture generation; "
                    "regenerate with tools/run_reference_train_e2e.py")
    manifest = os.path.join(root, f"manifest_{tier}.json")
    with open(manifest, "w") as f:
        json.dump({"batches": ref["batches"]} if ref["method"] == "baseline"
                  else {"episodes": ref["episodes"]}, f)
    ours = rte.run_ours(ref, manifest, tier_root, our_save)

    r = np.asarray(ref["losses"])
    o = np.asarray(ours["losses"])
    assert len(r) == len(o)
    # bound from the generation-time observation, with margin for backend /
    # BLAS drift across hosts
    mult, floor = TOL_POLICY[tier]
    tol = max(run["loss_compare"]["max_abs_delta"] * mult, floor)
    assert np.abs(r - o).max() <= tol, (
        f"{tier}: per-episode training loss diverged — max |Δ|="
        f"{np.abs(r - o).max():.3e} > {tol:.3e}\nref:  {r}\nours: {o}"
    )
    if tier != "fine_tune":
        assert abs(r[0] - o[0]) <= FIRST_EPISODE_TOL, (
            f"{tier}: FIRST-episode loss (pre-optimizer, pure forward semantics) diverged: "
            f"ref {r[0]:.6f} vs ours {o[0]:.6f}"
        )
    return r, o


@pytest.mark.slow
def test_reference_train_plain_tier(fixture, staged):
    """train_loop2 (the episodic stage): whole-driver loss-sequence match."""
    _replay(fixture, staged, "plain")


@pytest.mark.slow
def test_reference_train_finetune_tier(fixture, staged):
    """train_loop_finetune + stop-epoch MAML_update: whole-driver match."""
    _replay(fixture, staged, "fine_tune")


@pytest.mark.slow
def test_reference_train_baseline_tier(fixture, staged):
    """BaselineTrain supervised pretraining (SimpleDataManager shuffled
    16-batches): whole-driver per-batch loss match."""
    if "baseline" not in fixture["runs"]:
        pytest.skip("fixture predates the baseline tier; rerun tools/run_reference_train_e2e.py")
    _replay(fixture, staged, "baseline")


@pytest.mark.slow
def test_reference_train_50_tier(fixture, staged):
    """train_50.py whole-driver: the compressed-graph gnnnet_copy variant
    via train_loop50 (n_query = batch - 50), replayed through
    cli.train_50."""
    if "train50" not in fixture["runs"]:
        pytest.skip("fixture predates the train50 tier; rerun tools/run_reference_train_e2e.py")
    _replay(fixture, staged, "train50")


def test_fixture_records_param_parity(fixture):
    """The committed fixture's generation-time checkpoint comparison: the
    reference's saved .tar state and our saved .ckpt agree within the Adam
    sign-chaos envelope (plain: every epoch; fine_tune: the post-MAML_update
    final epoch).  Adam's first-step update is lr*sign(g), so f32 roundoff
    near zero-gradient coordinates flips coordinates by up to 2*lr per step
    — the bound is a few lr units, not machine epsilon."""
    # max|Δ| bounds per key: params ≈ a few 1e-3 Adam steps of drift; BN
    # running stats compare relatively (variances span orders of magnitude).
    # fine_tune is looser: its outer gradients are taken at inner-RNG-
    # dependent adapted points, and the reference's final BN buffers carry
    # the last episode's adapted stats (MAML_update touches parameters only)
    # bn_stats_rel = max|Δ| / RMS(ref tensor).  The envelope scales with
    # optimizer step count: plain takes 6 Adam steps, baseline 64 (so ~10x
    # the sign-chaos accumulation).  fine_tune's BN buffers are NOT
    # asserted: the reference's saved buffers after --fine_tune are the
    # last episode's ADAPTED stats — an EMA over that episode's 4-image
    # inner minibatches in np.random order (gnnnet.py:154,186), i.e. a
    # noisy function of the free RNG; the mechanism itself is pinned at f64
    # with replayed permutations by test_trainloop_golden.py
    per_tier = {
        "plain": {"feature": 2e-2, "fc": 2e-2, "gnn": 2e-2,
                  "bn_stats": None, "bn_stats_rel": 0.5},
        "baseline": {"feature": 6e-2, "classifier": 6e-2,
                     "bn_stats": None, "bn_stats_rel": 3.0},
        "fine_tune": {"feature": 2e-1, "fc": 2e-1, "gnn": 2e-1,
                      "bn_stats": None, "bn_stats_rel": None},
        "train50": {"feature": 2e-2, "fc": 2e-2, "gnn": 2e-2,
                    "bn_stats": None, "bn_stats_rel": 0.5},
    }
    for tier, run in fixture["runs"].items():
        bounds = per_tier[tier]
        for epoch, groups in run["param_compare"].items():
            for group, delta in groups.items():
                bound = bounds.get(group)
                if bound is None:
                    continue
                assert delta <= bound, (
                    f"{tier} epoch {epoch}: {group} max|Δ|={delta:.3e} > {bound} — the two "
                    f"whole drivers' saved checkpoints diverged at generation time"
                )
