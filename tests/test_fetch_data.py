"""Dataset acquisition driver (cli/fetch_data.py) — everything but the
socket: archive staging, traversal-safe unpack, filelist chaining, verify,
and the no-egress error contract.  Parity target: the reference's
filelists/*/download_*.sh + configure_miniImagenet.sh wget/tar pipelines."""

import io
import os
import tarfile
import zipfile

import numpy as np
import pytest
from PIL import Image

from mft_tpu.cli import fetch_data


def _img_bytes():
    buf = io.BytesIO()
    Image.fromarray((np.zeros((4, 4, 3))).astype(np.uint8)).save(buf, format="JPEG")
    return buf.getvalue()


def _make_cub_tgz(path, n_classes=8, per_class=2):
    data = _img_bytes()
    with tarfile.open(path, "w:gz") as t:
        for c in range(n_classes):
            for i in range(per_class):
                info = tarfile.TarInfo(f"CUB_200_2011/images/{c:03d}.cls/{i}.jpg")
                info.size = len(data)
                t.addfile(info, io.BytesIO(data))


def test_cub_archive_to_filelists(tmp_path):
    """download_CUB.sh:1-3 equivalent: tgz -> unpack -> index-split filelists."""
    tgz = tmp_path / "CUB_200_2011.tgz"
    _make_cub_tgz(str(tgz))
    dest = tmp_path / "stage"
    rc = fetch_data.main(["--dataset", "CUB", "--run", "--verify",
                          "--archive", f"CUB={tgz}", "--dest", str(dest)])
    assert rc == 0
    for split in ("base", "val", "novel"):
        assert (dest / "filelists" / "CUB" / f"{split}.json").exists()


def test_eurosat_zip_and_verify(tmp_path):
    zp = tmp_path / "EuroSAT.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("2750/Forest/Forest_1.jpg", _img_bytes())
    dest = tmp_path / "stage"
    rc = fetch_data.main(["--dataset", "EuroSAT", "--run", "--verify",
                          "--archive", f"EuroSAT={zp}", "--dest", str(dest)])
    assert rc == 0
    assert (dest / "content" / "2750" / "Forest" / "Forest_1.jpg").exists()


def test_verify_reports_missing(tmp_path, capsys):
    rc = fetch_data.main(["--dataset", "EuroSAT", "--verify", "--dest", str(tmp_path)])
    assert rc == 1
    assert "MISSING" in capsys.readouterr().out


def test_tar_traversal_refused(tmp_path):
    tgz = tmp_path / "evil.tgz"
    data = b"x"
    with tarfile.open(tgz, "w:gz") as t:
        info = tarfile.TarInfo("../evil.txt")
        info.size = 1
        t.addfile(info, io.BytesIO(data))
    with pytest.raises(RuntimeError, match="escapes"):
        fetch_data.unpack(str(tgz), str(tmp_path / "out"))
    assert not (tmp_path / "evil.txt").exists()


def test_tar_link_member_refused(tmp_path):
    tgz = tmp_path / "link.tgz"
    with tarfile.open(tgz, "w:gz") as t:
        info = tarfile.TarInfo("sym")
        info.type = tarfile.SYMTYPE
        info.linkname = "/etc/passwd"
        t.addfile(info)
    with pytest.raises(RuntimeError, match="link member"):
        fetch_data.unpack(str(tgz), str(tmp_path / "out"))


def test_download_failure_is_actionable(tmp_path, monkeypatch):
    import urllib.error
    import urllib.request

    def boom(url, timeout=None):
        raise urllib.error.URLError("no route to host")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    with pytest.raises(RuntimeError, match="--archive"):
        fetch_data.download("http://example.com/x.zip", str(tmp_path / "x.zip"))
    assert not (tmp_path / "x.zip.part").exists()


def test_kaggle_missing_cli_is_actionable(monkeypatch):
    import shutil

    monkeypatch.setattr(shutil, "which", lambda _: None)
    with pytest.raises(RuntimeError, match="kaggle datasets download"):
        fetch_data.kaggle_download("plant-disease/data", "/tmp/nowhere")


def test_plan_all_covers_every_recipe(capsys):
    rc = fetch_data.main(["--plan"])
    out = capsys.readouterr().out
    assert rc == 0
    for name in fetch_data.RECIPES:
        assert f"{name}:" in out
    # every dataset the registry consumes has an acquisition recipe
    for ds in ("miniImagenet", "CUB", "cross", "EuroSAT", "ISIC", "CropDisease", "ChestX"):
        assert ds in out


def test_emit_paths_roundtrip(tmp_path, monkeypatch):
    """--emit_paths output loads through config.Paths (MFT_TPU_PATHS)."""
    out = tmp_path / "mft_paths.json"
    rc = fetch_data.main(["--dataset", "EuroSAT", "--plan", "--dest", str(tmp_path),
                          "--emit_paths", str(out)])
    assert rc == 0 and out.exists()
    monkeypatch.setenv("MFT_TPU_PATHS", str(out))
    for k in ("MFT_EUROSAT_PATH", "MFT_CROPDISEASE_PATH", "MFT_MINIIMAGENET_PATH"):
        monkeypatch.delenv(k, raising=False)
    from mft_tpu.config import Paths

    p = Paths.load()
    assert p.EuroSAT == str(tmp_path / "content" / "2750")
    assert p.CropDisease == str(tmp_path / "content" / "CropDiseases")


def test_mini_csv_chain(tmp_path):
    """configure_miniImagenet.sh:1-6 equivalent with pre-staged CSVs."""
    dest = tmp_path / "stage"
    img_root = dest / "content" / "miniImagenet3"
    for c, n in [("n01", 2), ("n02", 2), ("n03", 2)]:
        d = img_root / c
        os.makedirs(d)
        for i in range(n):
            with open(d / f"{i}.jpg", "wb") as f:
                f.write(_img_bytes())
    csvd = dest / "ravi"
    os.makedirs(csvd)
    for split, classes in [("train", ["n01"]), ("val", ["n02"]), ("test", ["n03"])]:
        with open(csvd / f"{split}.csv", "w") as f:
            f.write("filename,label\n")
            for c in classes:
                f.write(f"0.jpg,{c}\n1.jpg,{c}\n")
    rc = fetch_data.main(["--dataset", "miniImagenet_csv", "--run", "--verify", "--dest", str(dest)])
    assert rc == 0
