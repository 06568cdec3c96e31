"""torchvision.datasets.ImageFolder stand-in (reference-e2e shim).

Reproduces torchvision's directory-walk semantics: classes are the sorted
subdirectory names, samples are (path, class_idx) sorted by filename within
each class (torchvision folder.py make_dataset), items load via PIL and
convert to RGB.  The reference constructs it bare — no transform — and
indexes it from SubDataset2 (datasets/CropDisease_few_shot.py:163-165,
SetDataManager2:296-299).
"""

from __future__ import annotations

import os

from PIL import Image

_IMG_EXT = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp")


def pil_loader(path):
    with open(path, "rb") as f:
        img = Image.open(f)
        return img.convert("RGB")


class ImageFolder:
    def __init__(self, root, transform=None, target_transform=None, loader=pil_loader):
        self.root = root
        self.transform = transform
        self.target_transform = target_transform
        self.loader = loader
        self.classes = sorted(
            e.name for e in os.scandir(root) if e.is_dir()
        )
        if not self.classes:
            raise FileNotFoundError(f"no class directories under {root!r}")
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples = []
        for c in self.classes:
            d = os.path.join(root, c)
            for dirpath, _, fnames in sorted(os.walk(d)):
                for fname in sorted(fnames):
                    if fname.lower().endswith(_IMG_EXT):
                        self.samples.append((os.path.join(dirpath, fname), self.class_to_idx[c]))
        self.imgs = self.samples

    def __getitem__(self, index):
        if index >= len(self.samples):  # enumerate() over this object stops here
            raise IndexError(index)
        path, target = self.samples[index]
        sample = self.loader(path)
        if self.transform is not None:
            sample = self.transform(sample)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return sample, target

    def __len__(self):
        return len(self.samples)
