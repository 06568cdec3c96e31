"""Prove the host input pipeline sustains the device compute rate.

Round-1 never drove the JPEG-on-disk path at speed (VERDICT weak #6): the
compute path does ~13 episodes/sec, i.e. ~1,300 decoded images/sec at the
eval geometry (5-way x 20 images/episode).  This tool writes ~2k synthetic
JPEGs, builds an ImageFolder manifest over them, and measures:

1. raw EpisodeStream decode throughput (threaded PIL decode to uint8 256^2),
2. optionally (--finetune) the full cli.finetune eval driven from those
   JPEGs end to end on the current backend.

Run: ``python tools/input_pipeline_bench.py --episodes 100 [--finetune]``
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_jpeg_tree(root: str, n_classes: int = 40, per_class: int = 50, size: int = 256, seed: int = 0):
    from PIL import Image

    rs = np.random.RandomState(seed)
    tints = rs.rand(n_classes, 1, 1, 3)
    for c in range(n_classes):
        d = os.path.join(root, f"cls{c:03d}")
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            img = np.clip(0.35 * tints[c] + 0.65 * rs.rand(size, size, 3), 0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(os.path.join(d, f"{i:04d}.jpg"), quality=85)
    return n_classes * per_class


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=100)
    ap.add_argument("--base_size", type=int, default=256)
    ap.add_argument("--workers", type=int, default=None,
                    help="decode threads (default: auto = min(16, 2*nproc))")
    ap.add_argument("--keep", default=None, help="keep the JPEG tree at this path")
    ap.add_argument("--finetune", action="store_true", help="also drive cli.finetune end to end")
    ap.add_argument("--cache", action="store_true",
                    help="measure the decoded-episode cache: cold pass (decode+persist) then warm pass")
    ap.add_argument("--backend", default=None, choices=["native", "pil", "both"],
                    help="decode backend (sets MFT_NATIVE_DECODE; 'both' measures the two back to back)")
    a = ap.parse_args()
    if a.backend:
        os.environ["MFT_NATIVE_DECODE"] = {"native": "1", "pil": "0"}.get(a.backend, "auto")

    root = a.keep or tempfile.mkdtemp(prefix="mft_jpegs_")
    t0 = time.time()
    n = write_jpeg_tree(root)
    print(f"wrote {n} JPEGs to {root} in {time.time()-t0:.1f}s", file=sys.stderr)

    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.data.manifests import image_folder
    from mft_tpu.data.pipeline import EpisodeStream, default_workers

    if a.workers is None:
        a.workers = default_workers()

    man = image_folder(root)
    spec = EpisodeSpec(5, 5, 15)  # eval geometry: 100 images/episode

    from mft_tpu.data import native_decode

    backends = ["1", "0"] if a.backend == "both" else [os.environ.get("MFT_NATIVE_DECODE", "auto")]
    for mode in backends:
        os.environ["MFT_NATIVE_DECODE"] = mode
        try:
            name = native_decode.backend()
        except RuntimeError as e:
            # 'both' on a host without the native library/canary: report it
            # and still produce the PIL measurement
            print(f"decode backend unavailable (MFT_NATIVE_DECODE={mode}): {e}", file=sys.stderr)
            continue
        stream = EpisodeStream(man, spec, a.episodes, base_size=a.base_size, workers=a.workers)
        # warm the page cache + pool
        next(iter(EpisodeStream(man, spec, 2, base_size=a.base_size, workers=a.workers)))
        t0 = time.perf_counter()
        count = 0
        for images, _ in stream:
            assert images.shape == (5, 20, a.base_size, a.base_size, 3)
            count += 1
        dt = time.perf_counter() - t0
        print(
            f"decode throughput [{name}]: {count/dt:.2f} episodes/sec "
            f"({count*100/dt:.0f} images/sec, {a.workers} threads)"
        )

    if a.cache:
        cache_dir = tempfile.mkdtemp(prefix="mft_epcache_")
        for label in ("cold (decode + persist)", "warm (cache hit, no PIL)"):
            s = EpisodeStream(man, spec, a.episodes, base_size=a.base_size, workers=a.workers,
                              cache_dir=cache_dir)
            t0 = time.perf_counter()
            n_done = sum(1 for _ in s)
            dt = time.perf_counter() - t0
            print(f"episode cache {label}: {n_done/dt:.2f} episodes/sec")
        shutil.rmtree(cache_dir, ignore_errors=True)

    if a.finetune:
        # end-to-end: meta-train 1 tiny checkpoint on the JPEGs, then run the
        # eval driver against them (registry 'caltech256' entry is a plain
        # ImageFolder builder - point it at the tree)
        os.environ["MFT_CALTECH256_PATH"] = root
        os.environ.setdefault("MFT_SAVE_DIR_PATH", tempfile.mkdtemp(prefix="mft_ipb_logs_"))
        from mft_tpu.cli import finetune as ft
        from mft_tpu.cli import train as tr

        common = ["--dataset", "caltech256", "--model", "ResNet10", "--method", "gnnnet", "--n_shot", "5"]
        tr.main(common + ["--stop_epoch", "0", "--save_freq", "1", "--episodes_per_epoch", "8"])
        t0 = time.perf_counter()
        ft.main(common + ["--test_dataset", "caltech256", "--save_iter", "0",
                          "--iter_num", str(a.episodes), "--eval_batch", "8",
                          "--gen_examples", "17", "--fine_tune_epoch", "5", "--dtype", "bfloat16"])
        dt = time.perf_counter() - t0
        print(f"cli.finetune end-to-end from JPEGs: {a.episodes/dt:.2f} episodes/sec wall")

    if not a.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
