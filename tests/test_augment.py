"""On-device augmentation: crop-warp parity, jitter semantics, replica bank."""

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu.ops import augment as aug


def _img(h=64, w=64, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(h, w, 3).astype(np.float32))


def test_crop_resize_matches_static_resize():
    im = _img()
    # integer crop box: warp must equal resize of the sliced crop (away from
    # the crop border, where resize renormalizes its kernel but the warp
    # correctly samples the surrounding image instead)
    top, left, ch, cw = 8.0, 12.0, 32.0, 40.0
    warped = jax.jit(lambda im: aug._crop_resize(im, top, left, ch, cw, 24))(im)
    ref = jax.jit(
        lambda im: jax.image.resize(im[8 : 8 + 32, 12 : 12 + 40], (24, 24, 3), "bilinear", antialias=False)
    )(im)
    np.testing.assert_allclose(np.asarray(warped)[3:-3, 3:-3], np.asarray(ref)[3:-3, 3:-3], atol=2e-5)


def test_crop_resize_flip_fold_exact():
    """The flips folded into the warp's scale/translate scalars equal
    reversing the warped output — zero-cost mirroring."""
    im = _img()
    top, left, ch, cw = 5.0, 9.0, 30.0, 41.0
    base = jax.jit(lambda im: aug._crop_resize(im, top, left, ch, cw, 24))(im)
    t = jnp.asarray(True)
    f = jnp.asarray(False)
    fh = jax.jit(lambda im: aug._crop_resize(im, top, left, ch, cw, 24, flip_h=t, flip_v=f))(im)
    fv = jax.jit(lambda im: aug._crop_resize(im, top, left, ch, cw, 24, flip_h=f, flip_v=t))(im)
    both = jax.jit(lambda im: aug._crop_resize(im, top, left, ch, cw, 24, flip_h=t, flip_v=t))(im)
    off = jax.jit(lambda im: aug._crop_resize(im, top, left, ch, cw, 24, flip_h=f, flip_v=f))(im)
    np.testing.assert_allclose(np.asarray(fh), np.asarray(base)[:, ::-1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(base)[::-1, :], atol=1e-5)
    np.testing.assert_allclose(np.asarray(both), np.asarray(base)[::-1, ::-1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(off), np.asarray(base), atol=1e-5)


def test_center_view_shape_and_normalization():
    im = _img(100, 100)
    out = jax.jit(lambda im: aug.center_view(im, 32))(im)
    assert out.shape == (32, 32, 3)
    # denormalize stays within [0,1] data range
    denorm = np.asarray(out) * np.asarray(aug.IMAGENET_STD) + np.asarray(aug.IMAGENET_MEAN)
    assert denorm.min() > -1e-3 and denorm.max() < 1.0 + 1e-3


def test_enhance_identity_at_zero_strength():
    cfg = aug.AugmentCfg(brightness=0.0, contrast=0.0, color=0.0)
    im = _img(16, 16)
    out = jax.jit(lambda k, im: aug._enhance(im, k, cfg))(jax.random.PRNGKey(0), im)
    np.testing.assert_allclose(np.asarray(out), np.asarray(im), atol=1e-6)


def test_enhance_brightness_scales():
    cfg = aug.AugmentCfg(brightness=0.5, contrast=0.0, color=0.0)
    im = _img(8, 8) * 0.3  # keep away from clipping
    key = jax.random.PRNGKey(1)
    out = jax.jit(lambda k, im: aug._enhance(im, k, cfg))(key, im)
    u = jax.random.uniform(jax.random.split(key, 1)[0], (3,))  # not the internal key; just check ratio constancy
    ratio = np.asarray(out) / np.asarray(im)
    assert np.allclose(ratio, ratio.flat[0], atol=1e-5)  # uniform scaling
    assert 0.45 < ratio.flat[0] < 1.55


def test_augment_batch_shapes_and_determinism():
    cfg = aug.AugmentCfg(image_size=24)
    ims = jnp.asarray(np.random.RandomState(2).rand(2, 3, 48, 48, 3).astype(np.float32))
    f = jax.jit(lambda k, x: aug.augment_batch(k, x, cfg))
    a = f(jax.random.PRNGKey(3), ims)
    b = f(jax.random.PRNGKey(3), ims)
    c = f(jax.random.PRNGKey(4), ims)
    assert a.shape == (2, 3, 24, 24, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_make_eval_replicas_clean_triplet():
    cfg = aug.AugmentCfg(image_size=16)
    support = jnp.asarray(np.random.RandomState(5).rand(3, 2, 32, 32, 3).astype(np.float32))
    reps = jax.jit(lambda k, s: aug.make_eval_replicas(k, s, cfg, gen_examples=4))(jax.random.PRNGKey(6), support)
    assert reps.shape == (7, 3, 2, 16, 16, 3)
    # first three replicas are the identical clean view (finetune.py:93,225)
    np.testing.assert_array_equal(np.asarray(reps[0]), np.asarray(reps[1]))
    np.testing.assert_array_equal(np.asarray(reps[1]), np.asarray(reps[2]))
    # augmented replicas differ from clean and from each other
    assert not np.allclose(np.asarray(reps[3]), np.asarray(reps[0]))
    assert not np.allclose(np.asarray(reps[3]), np.asarray(reps[4]))


def test_flip_flags_respected():
    # left-dark / right-bright image: with flips disabled the horizontal
    # gradient direction must survive every augmentation draw
    im = np.zeros((32, 32, 3), np.float32)
    im[:, 16:, :] = 1.0
    im = jnp.asarray(im)
    cfg_no = aug.AugmentCfg(image_size=16, hflip=False, vflip=False)
    f = jax.jit(lambda k: aug.augment_view(k, im, cfg_no))
    for i in range(6):
        o = np.asarray(f(jax.random.PRNGKey(i)))
        assert o[:, :4].mean() < o[:, -4:].mean()
    # with hflip enabled, some draw flips the gradient
    cfg_h = aug.AugmentCfg(image_size=16, hflip=True, vflip=False)
    g = jax.jit(lambda k: aug.augment_view(k, im, cfg_h))
    flipped = any(np.asarray(g(jax.random.PRNGKey(i)))[:, :4].mean() > np.asarray(g(jax.random.PRNGKey(i)))[:, -4:].mean() for i in range(12))
    assert flipped
