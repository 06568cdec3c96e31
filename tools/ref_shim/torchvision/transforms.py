"""Reference-era torchvision.transforms surface, exact-PIL implementations.

Only the names the reference's TransformLoader/TransformLoader2 request via
``getattr(transforms, name)`` (data/datamgr.py:17-43,
datasets/CropDisease_few_shot.py:211-281) are provided.  The deterministic
clean chain (Scale list -> CenterCrop -> ToTensor -> Normalize) is the one
the parity fixtures exercise and matches torchvision's PIL backend exactly
(pinned by tests/fixtures/pixel_golden.npz via tools/gen_pixel_golden.py).
"""

from __future__ import annotations

import numpy as np
import torch
from PIL import Image


class Compose:
    def __init__(self, transforms_list):
        self.transforms = list(transforms_list)

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


class Resize:
    """torchvision F.resize with a SEQUENCE size: aspect-squashing resize to
    exactly (h, w) with PIL BILINEAR — the form every reference loader uses
    (``Scale([int(1.15*s), int(1.15*s)])``)."""

    def __init__(self, size, interpolation=Image.BILINEAR):
        if isinstance(size, int):
            size = [size, size]  # shorter-side form unused by the reference
        self.size = list(size)
        self.interpolation = interpolation

    def __call__(self, img):
        h, w = self.size
        return img.resize((w, h), self.interpolation)


#: reference-era alias (transforms.Scale was the pre-0.8 name; the
#: reference requests 'Scale' by string, datamgr.py:28)
Scale = Resize


class CenterCrop:
    def __init__(self, size):
        self.size = int(size)

    def __call__(self, img):
        w, h = img.size
        s = self.size
        top = int(round((h - s) / 2.0))
        left = int(round((w - s) / 2.0))
        return img.crop((left, top, left + s, top + s))


class ToTensor:
    """PIL -> float32 CHW tensor in [0, 1] (torchvision semantics)."""

    def __call__(self, img):
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.astype(np.float32) / 255.0)
        return t.permute(2, 0, 1).contiguous()


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
        self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if torch.rand(1).item() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


class RandomVerticalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if torch.rand(1).item() < self.p:
            return img.transpose(Image.FLIP_TOP_BOTTOM)
        return img


class RandomResizedCrop:
    """Area/ratio-sampled crop + BILINEAR resize.  Draws from torch RNG; the
    sampling procedure follows torchvision's get_params but is NOT pinned
    bit-for-bit to a release — fixture runs use gen_examples=0, which never
    invokes it (shim module docstring)."""

    def __init__(self, size, scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0), interpolation=Image.BILINEAR):
        self.size = int(size)
        self.scale = scale
        self.ratio = ratio
        self.interpolation = interpolation

    def __call__(self, img):
        import math

        w, h = img.size
        area = w * h
        for _ in range(10):
            target_area = area * (self.scale[0] + (self.scale[1] - self.scale[0]) * torch.rand(1).item())
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            aspect = math.exp(log_ratio[0] + (log_ratio[1] - log_ratio[0]) * torch.rand(1).item())
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                top = int(torch.randint(0, h - ch + 1, (1,)).item())
                left = int(torch.randint(0, w - cw + 1, (1,)).item())
                return img.crop((left, top, left + cw, top + ch)).resize(
                    (self.size, self.size), self.interpolation
                )
        # fallback: center crop of the shorter side
        s = min(w, h)
        return CenterCrop(s)(img).resize((self.size, self.size), self.interpolation)


#: reference-era alias (datamgr.py:24 requests 'RandomSizedCrop')
RandomSizedCrop = RandomResizedCrop
