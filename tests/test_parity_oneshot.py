"""tools/parity_oneshot.py: the day-one real-data parity harness.

The full run is exercised by ``--smoke`` manually (it drives the same CLI
mains the e2e suite covers); here we pin the cheap contracts: the stage
check reports missing datasets with actionable pointers and exits 2, and
reports staged datasets and exits 0.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import parity_oneshot  # noqa: E402


def test_status_missing_datasets_exits_2(tmp_path, monkeypatch, capsys):
    # point every dataset at an empty dir: all missing
    for name in ("MINIIMAGENET", "CROPDISEASE", "EUROSAT", "ISIC", "CHESTX"):
        monkeypatch.setenv(f"MFT_{name}_PATH", str(tmp_path / name.lower()))
    rc = parity_oneshot.main(["--status"])
    out = capsys.readouterr().out
    assert rc == 2
    assert "[MISSING] miniImageNet" in out
    assert "MFT_CROPDISEASE_PATH" in out
    assert "expected layout" in out


def test_status_synthetic_staged_exits_0(capsys, monkeypatch):
    # main() setdefaults MFT_SAVE_DIR_PATH etc. for the smoke run; pin them
    # via monkeypatch so the mutation is rolled back after the test instead
    # of leaking into the rest of the session
    monkeypatch.setenv("MFT_SAVE_DIR_PATH", "/tmp/mft_parity_smoke/logs")
    rc = parity_oneshot.main(["--status", "--smoke"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "[staged] synthetic" in out


def test_published_targets_cite_reference():
    # the comparison targets are the reference README's published numbers
    assert parity_oneshot.PUBLISHED[("CropDisease", 5)] == (98.78, 0.19)
    assert parity_oneshot.PUBLISHED_AVERAGE == 73.78
