"""On-device, fused image augmentation (pure JAX, vmapped over views).

Capability parity with the reference's torchvision pipelines
(data/datamgr.py:11-43, data/additional_transforms.py:15-28, and the
per-dataset ``TransformLoader2`` eval variants, e.g.
datasets/CropDisease_few_shot.py:211-281):

* RandomResizedCrop / RandomSizedCrop(size, scale, ratio),
* ImageJitter: PIL Brightness/Contrast/Color enhancement with per-factor
  strength ``alpha*(2u-1)+1``,
* random horizontal / vertical flips,
* Resize(1.15x) + CenterCrop for the no-aug view,
* ImageNet mean/std normalization.

TPU-first design: the reference decodes and transforms every image
``gen_examples + 2`` times on a single host thread (the eval wall-clock
bottleneck, SURVEY.md §3.4).  Here the host decodes each image once to a
canonical base resolution; the replica fan-out happens on device as one
jitted program: crops are dynamic affine warps via
``jax.image.scale_and_translate`` (static output shape, traced scale/
translation), jitter/flip/normalize fuse into the surrounding elementwise
pipeline.  Cropping from the canonical base image instead of the original
full-resolution file is the one intentional divergence (statistically
equivalent augmentation, documented here).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# PIL L-mode grayscale weights (ImageEnhance degenerate images)
_LUMA = (0.299, 0.587, 0.114)


class AugmentCfg(NamedTuple):
    """One dataset's augmentation hyperparameters (reference per-dataset
    TransformLoader values; defaults = torchvision RandomResizedCrop +
    the generic train jitter of data/datamgr.py:14)."""

    image_size: int = 224
    scale_min: float = 0.08
    scale_max: float = 1.0
    ratio_min: float = 3.0 / 4.0
    ratio_max: float = 4.0 / 3.0
    brightness: float = 0.4
    contrast: float = 0.4
    color: float = 0.4
    hflip: bool = True
    vflip: bool = False


def pipeline_dtype(compute_dtype: str):
    """Augment-pipeline dtype for a backbone compute dtype: bf16 halves the
    fan-out traffic at uint8-source precision (see :func:`to_float`)."""
    return jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32


def to_float(images: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [0,255] -> float [0,1] on device (host->device transport stays
    uint8: 4x less PCIe/ICI traffic than shipping decoded floats).

    ``dtype=bfloat16`` halves every augment-pipeline tensor: bf16's ~3
    decimal digits of [0,1] precision (~0.004) equals the uint8 source
    quantization step (1/255), so nothing real is lost."""
    if images.dtype == jnp.uint8:
        return images.astype(dtype) / jnp.asarray(255.0, dtype)
    return images.astype(dtype) if images.dtype != dtype else images


def normalize(x: jnp.ndarray) -> jnp.ndarray:
    """ImageNet normalization of a [0,1] RGB image (last axis = channel)."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def center_view(image: jnp.ndarray, size: int) -> jnp.ndarray:
    """Resize to ``1.15*size`` square then center-crop ``size`` — the no-aug
    eval view (data/datamgr.py:38: ['Resize','CenterCrop',...]).

    When the host already decoded to exactly ``int(1.15*size)`` (the
    ``base_size`` auto default, config.py), the resize is skipped: the
    composed host-decode + crop is then PIXEL-EXACT vs the reference's
    ``Scale([1.15s,1.15s]) + CenterCrop`` (pinned by
    tests/test_augment.py::test_clean_view_pixel_golden_exact_base against
    a run-the-reference fixture).  The crop offset ``(big-size)//2`` equals
    torchvision's ``int(round((big-size)/2))`` for the 257->224 case (both
    16: Python round() is half-to-even)."""
    big = int(size * 1.15)
    if image.shape[0] == big and image.shape[1] == big:
        r = image
    else:
        r = jax.image.resize(image, (big, big, image.shape[-1]), method="bilinear")
    off = (big - size) // 2
    return normalize(jax.lax.dynamic_slice(r, (off, off, 0), (size, size, image.shape[-1])))


def _sample_crop(key, h: int, w: int, cfg: AugmentCfg):
    """Sample (top, left, crop_h, crop_w) floats a la RandomResizedCrop.

    torchvision rejection-samples 10 times then falls back to a center crop;
    on device we clamp the sampled box to the image bounds instead
    (equivalent support, slightly different tail distribution)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w
    target_area = jax.random.uniform(k1, (), minval=cfg.scale_min, maxval=cfg.scale_max) * area
    log_ratio = jax.random.uniform(
        k2, (), minval=jnp.log(jnp.asarray(cfg.ratio_min)), maxval=jnp.log(jnp.asarray(cfg.ratio_max))
    )
    ratio = jnp.exp(log_ratio)
    cw = jnp.clip(jnp.sqrt(target_area * ratio), 8.0, w)
    ch = jnp.clip(jnp.sqrt(target_area / ratio), 8.0, h)
    top = jax.random.uniform(k3, ()) * (h - ch)
    left = jax.random.uniform(k4, ()) * (w - cw)
    return top, left, ch, cw


def _crop_resize(image: jnp.ndarray, top, left, ch, cw, size: int, flip_h=None, flip_v=None) -> jnp.ndarray:
    """Bilinear resize of a dynamic crop box to a static ``size`` square via
    one affine warp (scale_and_translate: in = (out+0.5-t)/s - 0.5).

    ``flip_h``/``flip_v`` (traced bools) fold the random flips into the
    warp's scale/translation SCALARS — a mirrored gather costs nothing,
    whereas a post-hoc ``where(flip, img[:, ::-1], img)`` materializes a
    full reversed copy plus a select per image (measured ~31 ms per
    8-episode eval batch in the bank fan-out, docs/PERF.md r3).  Exactness
    of the fold (vs reversing the output) is pinned in tests; it requires
    ``antialias=False`` — non-antialiased bilinear, the same class of
    documented statistical deviation from PIL as draft decode."""
    sy = size / ch
    sx = size / cw
    ty = -top * sy
    tx = -left * sx
    if flip_v is not None:
        sy, ty = jnp.where(flip_v, -sy, sy), jnp.where(flip_v, size + top * sy, ty)
    if flip_h is not None:
        sx, tx = jnp.where(flip_h, -sx, sx), jnp.where(flip_h, size + left * sx, tx)
    return jax.image.scale_and_translate(
        image,
        (size, size, image.shape[-1]),
        (0, 1),
        jnp.stack([sy, sx]).astype(jnp.float32),
        jnp.stack([ty, tx]).astype(jnp.float32),
        method="bilinear",
        antialias=False,
    )


def _enhance(img: jnp.ndarray, key, cfg: AugmentCfg) -> jnp.ndarray:
    """ImageJitter: PIL Brightness/Contrast/Color enhance, each with factor
    ``alpha*(2u-1)+1``, applied in that order with per-step clipping
    (additional_transforms.py:20-28; PIL operates on clipped uint8)."""
    u = jax.random.uniform(key, (3,))
    r_b = cfg.brightness * (2.0 * u[0] - 1.0) + 1.0
    r_c = cfg.contrast * (2.0 * u[1] - 1.0) + 1.0
    r_s = cfg.color * (2.0 * u[2] - 1.0) + 1.0
    return apply_enhance(img, r_b, r_c, r_s)


def apply_enhance(img: jnp.ndarray, r_b, r_c, r_s) -> jnp.ndarray:
    """The jitter chain at explicit factors (Brightness, Contrast, Color) —
    the deterministic remainder of ImageJitter once the draws are fixed,
    golden-pinned against the reference's own ImageJitter at recorded
    ``torch.rand`` draws (tests/test_augment.py::test_image_jitter_golden).
    Float path: PIL rounds to uint8 after every blend and uses the
    integer-rounded L mean for contrast; the measured divergence is <=2/255
    per channel (pinned in the golden test)."""
    luma = jnp.asarray(_LUMA, img.dtype)
    # Brightness: blend with black
    img = jnp.clip(img * r_b, 0.0, 1.0)
    # Contrast: blend with the mean gray of the L image (f32 accumulate —
    # a 50k-element bf16 sum would lose the mean's low bits)
    gray = jnp.sum(img * luma, axis=-1, keepdims=True)
    mean = jnp.mean(gray, dtype=jnp.float32).astype(img.dtype)
    img = jnp.clip(mean + (img - mean) * r_c, 0.0, 1.0)
    # Color: blend with the grayscale image
    gray = jnp.sum(img * luma, axis=-1, keepdims=True)
    img = jnp.clip(gray + (img - gray) * r_s, 0.0, 1.0)
    return img


def augment_view(key, image: jnp.ndarray, cfg: AugmentCfg) -> jnp.ndarray:
    """One augmented, normalized view of a [H0, W0, 3] image in [0,1].

    The random flips are folded into the crop warp (mirrored gather, zero
    extra traffic); flip-then-jitter equals the reference's jitter-then-flip
    exactly (ImageJitter is pointwise and its contrast mean is
    flip-invariant)."""
    k_crop, k_jit, k_flip = jax.random.split(key, 3)
    h, w = image.shape[0], image.shape[1]
    top, left, ch, cw = _sample_crop(k_crop, h, w, cfg)
    kh, kv = jax.random.split(k_flip)
    flip_h = jax.random.bernoulli(kh) if cfg.hflip else None
    flip_v = jax.random.bernoulli(kv) if cfg.vflip else None
    img = _crop_resize(image, top, left, ch, cw, cfg.image_size, flip_h=flip_h, flip_v=flip_v)
    img = jnp.clip(img, 0.0, 1.0)
    img = _enhance(img, k_jit, cfg)
    return normalize(img)


def augment_batch(key, images: jnp.ndarray, cfg: AugmentCfg, dtype=jnp.float32) -> jnp.ndarray:
    """Independent augmented views for a batch [..., H0, W0, 3] (u8 or f32).

    ``dtype=bfloat16`` runs the whole fan-out at half traffic (see
    :func:`to_float`) — the eval engine's bank precompute uses the
    backbone's compute dtype."""
    images = to_float(images, dtype)
    lead = images.shape[:-3]
    flat = images.reshape((-1,) + images.shape[-3:])
    keys = jax.random.split(key, flat.shape[0])
    out = jax.vmap(lambda k, im: augment_view(k, im, cfg))(keys, flat)
    return out.reshape(lead + out.shape[1:])


def center_batch(images: jnp.ndarray, size: int, dtype=jnp.float32) -> jnp.ndarray:
    images = to_float(images, dtype)
    lead = images.shape[:-3]
    flat = images.reshape((-1,) + images.shape[-3:])
    out = jax.vmap(lambda im: center_view(im, size))(flat)
    return out.reshape(lead + out.shape[1:])


def make_eval_replicas(key, support_images: jnp.ndarray, cfg: AugmentCfg, gen_examples: int) -> jnp.ndarray:
    """Device-side fan-out of the eval support bank.

    support_images: [n_way, n_support, H0, W0, 3] in [0,1] -> replicas
    [gen_examples + 3, n_way, n_support, S, S, 3]: the clean (center) view
    three times — reproducing the reference bank where liz_x[0] is duplicated
    and the second no-aug replica is bitwise identical (finetune.py:93,
    225-233) — followed by ``gen_examples`` independently augmented views.
    """
    support_images = to_float(support_images)
    clean = center_batch(support_images, cfg.image_size)
    keys = jax.random.split(key, gen_examples)
    augs = jax.vmap(lambda k: augment_batch(k, support_images, cfg))(keys)
    return jnp.concatenate([jnp.stack([clean, clean, clean]), augs], axis=0)
