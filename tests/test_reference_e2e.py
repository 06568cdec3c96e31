"""Whole-driver parity vs the committed run of the reference's OWN
finetune.py (fixture: tools/run_reference_e2e.py — the reference driver was
executed end to end, argparse -> .tar loading -> SetDataset2 loader ->
episode loop -> CI, on a staged tree with checkpoints this framework
exported; its per-episode accuracies and exact episode composition are
committed).  Here the SAME staged data and checkpoints are rebuilt from
their seeds and ``mft_tpu.cli.finetune`` replays the reference's exact
episodes as a subprocess (whole-driver), comparing per-episode accuracies.

Tiers (fixture runs):
* ``gnnnet_fte0`` — no inner loop: the scores are deterministic functions
  of the replayed pixels (pixel-exact clean chain), so the drivers must
  agree EXACTLY up to backend numerics.  At generation time every
  per-episode accuracy matched to 0.00 pp.
* ``all_fte1`` / ``gnnnet_fte1`` — with inner-loop training the one free
  variable between the frameworks is inner RNG (minibatch shuffle order,
  throwaway classifier init); per-episode deltas are bounded accordingly.
* ``dampnet_full_class_fte0`` / ``_fte1`` — the same two tiers through the
  reference's OTHER shipped eval driver, finetune_50.py (the one whose
  dampnet dispatch works upstream), with the miniImageNet source-prototype
  sweep replayed in the reference's recorded shuffle order so even the
  sweep's train-mode per-batch BN statistics match.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import run_reference_e2e as r2e  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "reference_e2e.json")

#: (mean |Δ| pp, max per-episode |Δ| pp) per tier, set from the observed
#: generation-time deltas with margin:
#: * gnnnet_fte0 observed 0.00/0.00 (deterministic) — bound = 2 query flips,
#: * all_fte1 observed 0.33/1.33 (one query) — the linear member's signal
#:   dominates, inner RNG flips at most a few near-tie queries,
#: * gnnnet_fte1 observed 5.17/21.33 — the random-head chaos tier, where
#:   shuffle-order differences swing the degenerate GNN predictions.
TOLERANCE = {
    "gnnnet_fte0": (1.0, 2.7),
    "all_fte1": (5.0, 8.0),
    "gnnnet_fte1": (15.0, 40.0),
    # dampnet tiers (reference driver: finetune_50.py).  fte0 is
    # deterministic up to backend numerics: the sweep replays the reference's
    # recorded shuffle order, so even the train-mode BN batch statistics of
    # the prototype features match; bound = a couple of near-tie query flips.
    "dampnet_full_class_fte0": (1.0, 2.7),
    "dampnet_full_class_fte1": (15.0, 40.0),
}


@pytest.fixture(scope="module")
def fixture():
    if not os.path.exists(FIXTURE):
        pytest.skip("run tools/run_reference_e2e.py to generate the reference-e2e fixture")
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def staged(fixture, tmp_path_factory):
    """Restage the dataset + checkpoints from their seeds; verify both hash
    to the fixture's values (else the comparison basis changed — skip with
    the reason rather than fail on environment drift)."""
    root = tmp_path_factory.mktemp("ref_e2e")
    data_root = str(root / "CropDisease")
    data_hash = r2e.stage_dataset(data_root, **fixture["stage"])
    if data_hash != fixture["data_hash"]:
        pytest.skip("PIL JPEG encoder produced different bytes than at fixture generation; "
                    "regenerate with tools/run_reference_e2e.py")
    mini_root = None
    if "mini_stage" in fixture:
        mini_root = str(root / "miniImageNet")
        mini_hash = r2e.stage_dataset(mini_root, **fixture["mini_stage"])
        if mini_hash != fixture["mini_hash"]:
            pytest.skip("staged miniImageNet bytes differ from fixture generation; "
                        "regenerate with tools/run_reference_e2e.py")
    our_save = str(root / "ours_logs")
    ckpt_hash = r2e.make_checkpoints(our_save, None, fixture["ckpt_seed"])
    if ckpt_hash != fixture["ckpt_hash"]:
        pytest.skip("jax PRNG produced different init weights than at fixture generation; "
                    "regenerate with tools/run_reference_e2e.py")
    return data_root, our_save, str(root), mini_root


def _replay(fixture, staged, key):
    data_root, our_save, root, mini_root = staged
    run = fixture["runs"][key]
    ref = run["reference"]
    damp = run["method"].startswith("dampnet")
    manifest = os.path.join(root, f"manifest_{key}.json")
    with open(manifest, "w") as f:
        json.dump({"episodes": ref["episodes"],
                   **({"sweep_order": ref["sweep_order"]} if damp else {})}, f)
    ours = r2e.run_ours(
        data_root, our_save, method=run["method"], iter_num=fixture["iter_num"],
        fine_tune_epoch=run["fine_tune_epoch"], manifest=manifest,
        mini_root=mini_root if damp else None,
    )
    r = np.asarray(ref["acc_all"])
    o = np.asarray(ours["acc_all"])
    mean_tol, ep_tol = TOLERANCE[key]
    assert abs(r.mean() - o.mean()) <= mean_tol, (
        f"{key}: mean accuracy diverged — reference driver {r.mean():.2f}% vs "
        f"cli.finetune {o.mean():.2f}% (tolerance {mean_tol} pp)"
    )
    assert np.abs(r - o).max() <= ep_tol, (
        f"{key}: per-episode divergence {np.abs(r - o).max():.2f} pp > {ep_tol} pp\n"
        f"ref:  {r}\nours: {o}"
    )
    return r, o


@pytest.mark.slow
def test_reference_e2e_exact_tier(fixture, staged):
    """fte0: identical pixels, no inner loop — the two whole drivers must
    produce (near-)identical per-episode accuracies."""
    if "gnnnet_fte0" not in fixture["runs"]:
        pytest.skip("fixture predates the fte0 tier; rerun tools/run_reference_e2e.py")
    _replay(fixture, staged, "gnnnet_fte0")


@pytest.mark.slow
def test_reference_e2e_headline_tier(fixture, staged):
    """all_fte1: the headline --method all ensemble shape, whole-driver,
    bounded by the inner-RNG tolerance."""
    if "all_fte1" not in fixture["runs"]:
        pytest.skip("fixture predates the all_fte1 tier; rerun tools/run_reference_e2e.py")
    _replay(fixture, staged, "all_fte1")


@pytest.mark.slow
def test_reference_e2e_dampnet_exact_tier(fixture, staged):
    """dampnet_full_class fte0 through the reference's finetune_50.py: no
    inner loop, the source-prototype sweep replayed in the reference's
    recorded shuffle order — the whole dampnet driver path (checkpoint ->
    sweep -> NTN recovery -> domain-shift scoring) must agree up to backend
    numerics."""
    if "dampnet_full_class_fte0" not in fixture["runs"]:
        pytest.skip("fixture predates the dampnet tiers; rerun tools/run_reference_e2e.py")
    _replay(fixture, staged, "dampnet_full_class_fte0")


@pytest.mark.slow
def test_reference_e2e_dampnet_adapted_tier(fixture, staged):
    """dampnet_full_class fte1: the live adapted-backbone composition
    (finetune_50.py:622,687) whole-driver, bounded by inner-RNG tolerance."""
    if "dampnet_full_class_fte1" not in fixture["runs"]:
        pytest.skip("fixture predates the dampnet tiers; rerun tools/run_reference_e2e.py")
    _replay(fixture, staged, "dampnet_full_class_fte1")


@pytest.mark.slow
def test_reference_e2e_gnn_trained_tier(fixture, staged):
    """gnnnet_fte1 (chaotic random-head tier): full run gated behind
    MFT_E2E_FULL=1 — it adds wall-clock but little discrimination beyond
    the two tiers above."""
    if os.environ.get("MFT_E2E_FULL", "") in ("", "0"):
        pytest.skip("set MFT_E2E_FULL=1 to run the third replay tier")
    _replay(fixture, staged, "gnnnet_fte1")
