"""Generate run-the-reference PIXEL goldens for the image pipeline.

Every compute path has a torch-generated artifact except the one real data
hits first: decode -> Scale([1.15s,1.15s]) -> CenterCrop -> ToTensor ->
Normalize (the clean/no-aug view, /root/reference/data/datamgr.py:28-43 and
every per-dataset TransformLoader, e.g. datasets/CropDisease_few_shot.py:
228-243) and the ImageJitter enhancement chain
(data/additional_transforms.py:15-28).  This script produces
``tests/fixtures/pixel_golden.npz``:

* ``ImageJitter`` is imported from the reference itself and executed with
  recorded ``torch.rand`` draws (replayed by the tests).
* torchvision is not installed in this image, so its PIL-backend ops are
  reproduced here by their exact PIL calls — each one is a thin wrapper the
  reference-era source defines as:
    - ``Scale/Resize([h, w])``  -> ``img.resize((w, h), Image.BILINEAR)``
      (torchvision F.resize, sequence size = aspect-squashing resize),
    - ``CenterCrop(s)``         -> crop at ``int(round((H-s)/2))`` /
      ``int(round((W-s)/2))``,
    - ``RandomSizedCrop`` at a FIXED draw (i, j, h, w)
                                -> ``img.crop((j, i, j+w, i+h)).resize((s, s),
                                   Image.BILINEAR)`` (F.resized_crop),
    - ``RandomHorizontalFlip``  -> ``img.transpose(Image.FLIP_LEFT_RIGHT)``,
    - ``ToTensor``              -> uint8 HWC -> float32/255,
    - ``Normalize(mean, std)``.
  The random *draws* (crop box, flip, jitter u) are fixed and stored so the
  comparison is deterministic; distribution differences of the samplers stay
  documented deviations (README), not pixel bugs.

Run manually (torch CPU import is ~15 s here; fixtures are committed):

    python tools/gen_pixel_golden.py
"""

import importlib.util
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402  (only needed to run the reference's ImageJitter)

OUT = {}

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _load_ref_jitter():
    """Import the reference's additional_transforms by file path (the
    ``data`` package drags in torchvision via datamgr at package scope)."""
    spec = importlib.util.spec_from_file_location(
        "ref_additional_transforms", "/root/reference/data/additional_transforms.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.ImageJitter


# ---- exact PIL reproductions of the torchvision ops -------------------------

def tv_resize_list(img: Image.Image, h: int, w: int) -> Image.Image:
    """transforms.Scale/Resize([h, w]): squash to exactly (h, w)."""
    return img.resize((w, h), Image.BILINEAR)


def tv_center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def tv_resized_crop(img: Image.Image, i: int, j: int, h: int, w: int, size: int) -> Image.Image:
    return img.crop((j, i, j + w, i + h)).resize((size, size), Image.BILINEAR)


def tv_to_normalized(img: Image.Image) -> np.ndarray:
    """ToTensor + Normalize, kept HWC float32 (mft_tpu's layout)."""
    x = np.asarray(img, np.uint8).astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


# ---- deterministic synthetic source images ----------------------------------

def make_sources():
    """Structured + noisy content at the aspect/size cases that matter:
    landscape (downscale), small portrait (upscale), and exactly
    ``int(1.15*224) = 257`` square (the identity-resize case)."""
    rs = np.random.RandomState(42)
    out = {}

    def build(h, w):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        r = 0.5 + 0.5 * np.sin(2 * np.pi * (xx / w * 3 + yy / h))
        g = yy / max(h - 1, 1)
        b = xx / max(w - 1, 1)
        img = np.stack([r, g, b], -1)
        # hard edges + noise: high-frequency content that exposes resampling bugs
        img[h // 4 : h // 2, w // 4 : w // 2] = (1.0, 0.1, 0.0)
        img += rs.uniform(-0.15, 0.15, img.shape)
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    out["land"] = build(300, 400)
    out["port"] = build(120, 84)
    out["sq257"] = build(257, 257)
    return out


def gen_clean(sources, size=224):
    """Reference no-aug view: Scale([257,257]) -> CenterCrop(224) ->
    ToTensor -> Normalize (datamgr.py:28,38)."""
    big = int(size * 1.15)
    for name, src in sources.items():
        OUT[f"src.{name}"] = src
        img = Image.fromarray(src)
        resized = tv_resize_list(img, big, big)
        OUT[f"clean.{name}.resized_u8"] = np.asarray(resized, np.uint8)
        OUT[f"clean.{name}.out"] = tv_to_normalized(tv_center_crop(resized, size))


def gen_jitter(sources):
    """Reference ImageJitter at recorded torch.rand draws, on the post-crop
    224x224 clean view (where the reference applies it in the aug chain).
    Covers the generic train params (B=C=Color=0.4, datamgr.py:14) and the
    CropDisease TransformLoader2 eval params (B=C=0.2, Color=0.05,
    datasets/CropDisease_few_shot.py:248)."""
    ImageJitter = _load_ref_jitter()
    base = tv_center_crop(tv_resize_list(Image.fromarray(sources["land"]), 257, 257), 224)
    OUT["jitter.input_u8"] = np.asarray(base, np.uint8)

    cases = {
        "mid": [0.3, 0.7, 0.5],
        "lo": [0.0, 0.0, 0.0],
        "hi": [1.0, 1.0, 1.0],
    }
    params = {
        "train": dict(Brightness=0.4, Contrast=0.4, Color=0.4),
        "cd2": dict(Brightness=0.2, Contrast=0.2, Color=0.05),
    }
    orig_rand = torch.rand
    try:
        for pname, pdict in params.items():
            jit = ImageJitter(pdict)
            for cname, u in cases.items():
                torch.rand = lambda n, _u=u: torch.tensor(_u[:n], dtype=torch.float32)
                out = jit(base)
                OUT[f"jitter.{pname}.{cname}.u"] = np.asarray(u, np.float32)
                OUT[f"jitter.{pname}.{cname}.out_u8"] = np.asarray(out, np.uint8)
    finally:
        torch.rand = orig_rand


def gen_random_crop(sources, size=224):
    """The aug view at FIXED draws: RandomSizedCrop box -> ImageJitter ->
    RandomHorizontalFlip -> ToTensor -> Normalize
    (datasets/CropDisease_few_shot.py:237: ['RandomSizedCrop', 'ImageJitter',
    'RandomHorizontalFlip', 'ToTensor', 'Normalize']).  The warp-only output
    is stored too, so the tests can attribute error between the crop warp and
    the jitter chain."""
    ImageJitter = _load_ref_jitter()
    jit = ImageJitter(dict(Brightness=0.4, Contrast=0.4, Color=0.4))
    u = [0.25, 0.8, 0.6]
    # (src, i, j, h, w, flip): boxes inside each source's bounds, spanning
    # near-full-area and small-scale crops
    draws = [
        ("land", 10, 30, 260, 330, 0),
        ("land", 80, 150, 120, 160, 1),
        ("sq257", 0, 0, 257, 257, 0),
        ("sq257", 40, 60, 150, 112, 1),
    ]
    orig_rand = torch.rand
    try:
        torch.rand = lambda n, _u=u: torch.tensor(_u[:n], dtype=torch.float32)
        for idx, (name, i, j, h, w, flip) in enumerate(draws):
            img = Image.fromarray(sources[name])
            warped = tv_resized_crop(img, i, j, h, w, size)
            OUT[f"rrc.{idx}.box"] = np.asarray([i, j, h, w, flip], np.int32)
            OUT[f"rrc.{idx}.src"] = np.bytes_(name)
            OUT[f"rrc.{idx}.warp_u8"] = np.asarray(warped, np.uint8)
            out = jit(warped)
            if flip:
                out = out.transpose(Image.FLIP_LEFT_RIGHT)
            OUT[f"rrc.{idx}.out"] = tv_to_normalized(out)
        OUT["rrc.u"] = np.asarray(u, np.float32)
    finally:
        torch.rand = orig_rand


def main():
    sources = make_sources()
    gen_clean(sources)
    gen_jitter(sources)
    gen_random_crop(sources)
    out = os.path.normpath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures", "pixel_golden.npz")
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **OUT)
    print(f"wrote {out} ({len(OUT)} arrays)")
    for k in sorted(OUT):
        v = OUT[k]
        print(" ", k, getattr(v, "shape", v))


if __name__ == "__main__":
    main()
