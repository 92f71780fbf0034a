"""On-device, jit-fused augmentation matching the reference's albumentations
pipeline (reference trains.py:257-272):

    RandomRotate90(p=.5) -> Flip(p=.5) -> OneOf{HSV, brightness, contrast}(p=1)
    -> Resize(h, w) -> Normalize(ImageNet)  ... then the Dataset divides by 255
    again (reference dataset.py:71-74) — a quirk we reproduce for parity.

TPU-first design: the host only produces batch indices and PRNG keys; resize to
the target size happens once on the host at load time (images INTER_LINEAR,
masks INTER_NEAREST — identical to albumentations Resize), and the geometric
ops commute exactly with resize for square targets, so augmenting after the
resize is an exact equivalent of the reference's augment-then-resize. Color
jitter runs in float32 on device (stochastically equivalent to the reference's
uint8 LUTs). Everything here is vmap/jit-friendly with static shapes.

Note the reference feeds cv2 BGR images into albumentations' RGB-assuming
transforms; we operate on channels exactly as loaded, reproducing that behavior.
"""

from functools import partial

import jax
import jax.numpy as jnp

# albumentations Normalize defaults (applied to channels as loaded).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# The reference pipeline's transforms, individually selectable (the upstream
# ISIC trainers show the author hand-editing which transforms each experiment
# uses, reference trainISIC*.py; here that's a CLI spec instead of a code
# edit). Geometric ops apply independently at p=0.5; the selected color ops
# form the OneOf(p=1) pool.
AUGMENT_OPS = ("rot90", "flip", "hsv", "brightness", "contrast")


def parse_augment_spec(spec):
    """'full' | 'none' | comma-list of AUGMENT_OPS | bool | tuple -> static
    tuple of op names (hashable, jit-static). Raises ValueError on unknown
    ops so a typo'd --augment fails loudly at startup."""
    if spec is True:
        return AUGMENT_OPS
    if spec in (False, None):
        return ()
    if isinstance(spec, (tuple, list)):
        ops = tuple(spec)
    else:
        s = str(spec).strip().lower()
        if s == "full":
            return AUGMENT_OPS
        if s in ("none", ""):
            return ()
        ops = tuple(p.strip() for p in s.split(",") if p.strip())
    unknown = sorted(set(ops) - set(AUGMENT_OPS))
    if unknown:
        raise ValueError(f"unknown augment op(s) {unknown}; "
                         f"available: {list(AUGMENT_OPS)}")
    # canonical order, deduped — the spec is part of the jit cache key
    return tuple(op for op in AUGMENT_OPS if op in ops)


def rgb_to_hsv(img):
    """img float [0,1] (..., 3) -> h [0,1), s [0,1], v [0,1]."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c == 0, 1.0, c)
    h = jnp.where(
        v == r, (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    h = jnp.where(c == 0, 0.0, h / 6.0)
    h = jnp.where(h < 0, h + 1.0, h)
    s = jnp.where(v == 0, 0.0, c / jnp.where(v == 0, 1.0, v))
    return h, s, v


def hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _rot90_square(img, k):
    """k in {0,1,2,3} counter-clockwise rot90 for square H==W images (traced k)."""
    return jax.lax.switch(
        k,
        [lambda x: x,
         lambda x: jnp.rot90(x, 1, axes=(0, 1)),
         lambda x: jnp.rot90(x, 2, axes=(0, 1)),
         lambda x: jnp.rot90(x, 3, axes=(0, 1))],
        img,
    )


def _rot90_rect(img, k):
    """rot90 for H != W: odd k transposes, then we resample back to (H, W).

    The reference rotates the raw image and then resizes to (h, w)
    (trains.py:258-268); with a rectangular target this changes the aspect.
    We reproduce that by resizing the transposed image back — an equivalent
    up to resampling filter.
    """
    from ..ops.resize import resize_bilinear

    h, w = img.shape[0], img.shape[1]
    even = jnp.where(k == 2, jnp.rot90(img, 2, axes=(0, 1)), img)
    is_odd = (k % 2) == 1
    # Both branches produce (h, w, c); pick with where on the traced predicate.
    transposed = jnp.swapaxes(img, 0, 1)
    odd_rot = jnp.where(k == 1, transposed[::-1, :], transposed[:, ::-1])  # rot90 / rot270 of img, shape (w, h, c)
    odd_resized = resize_bilinear(odd_rot, (h, w), align_corners=False)
    return jnp.where(is_odd, odd_resized, even)


def random_rot90_flip(key, img, mask, do_rot: bool = True, do_flip: bool = True):
    """RandomRotate90(p=.5) then Flip(p=.5) (albumentations semantics).

    do_rot/do_flip are STATIC switches (the augment-spec subset); the key
    split layout is fixed so a given (key, image) pair produces the same
    transform regardless of which other ops are enabled."""
    k_rot, k_apply_rot, k_flip, k_d = jax.random.split(key, 4)
    if do_rot:
        apply_rot = jax.random.bernoulli(k_apply_rot, 0.5)
        k = jnp.where(apply_rot, jax.random.randint(k_rot, (), 0, 4), 0)

        if img.shape[0] == img.shape[1]:
            img = _rot90_square(img, k)
            mask = _rot90_square(mask, k)
        else:
            img = _rot90_rect(img, k)
            mask = _rot90_rect(mask, k)

    if do_flip:
        apply_flip = jax.random.bernoulli(k_flip, 0.5)
        d = jax.random.randint(k_d, (), -1, 2)  # -1: both, 0: vertical (ud), 1: horizontal (lr)
        do_ud = jnp.logical_and(apply_flip, d <= 0)
        do_lr = jnp.logical_and(apply_flip, d != 0)
        img = jnp.where(do_ud, img[::-1, :, :], img)
        img = jnp.where(do_lr, img[:, ::-1, :], img)
        mask = jnp.where(do_ud, mask[::-1, :, :], mask)
        mask = jnp.where(do_lr, mask[:, ::-1, :], mask)
    return img, mask


def random_color_jitter(key, img, pool=("hsv", "brightness", "contrast")):
    """OneOf{HueSaturationValue, RandomBrightness, RandomContrast} p=1 over
    the STATIC `pool` subset (full pool = reference semantics).

    img float32 in [0,1] (pixel scale /255). Limits mirror albumentations
    defaults: hue ±20 (cv2 units of 2°), sat ±30/255, val ±20/255,
    brightness ±0.2, contrast alpha in [0.8, 1.2]. Clipped to [0,1].
    """
    k_choice, k_h, k_s, k_v, k_b, k_c = jax.random.split(key, 6)

    def hsv_fn(x):
        h, s, v = rgb_to_hsv(x)
        h = (h + jax.random.uniform(k_h, (), minval=-20.0, maxval=20.0) / 180.0) % 1.0
        s = jnp.clip(s + jax.random.uniform(k_s, (), minval=-30.0, maxval=30.0) / 255.0, 0.0, 1.0)
        v = jnp.clip(v + jax.random.uniform(k_v, (), minval=-20.0, maxval=20.0) / 255.0, 0.0, 1.0)
        return hsv_to_rgb(h, s, v)

    def brightness_fn(x):
        beta = jax.random.uniform(k_b, (), minval=-0.2, maxval=0.2)
        return jnp.clip(x + beta, 0.0, 1.0)

    def contrast_fn(x):
        alpha = jax.random.uniform(k_c, (), minval=0.8, maxval=1.2)
        return jnp.clip(x * alpha, 0.0, 1.0)

    fns = {"hsv": hsv_fn, "brightness": brightness_fn, "contrast": contrast_fn}
    branches = [fns[name] for name in pool if name in fns]
    if not branches:
        return img
    if len(branches) == 1:
        return branches[0](img)
    choice = jax.random.randint(k_choice, (), 0, len(branches))
    return jax.lax.switch(choice, branches, img)


def normalize(img):
    """albumentations Normalize + the Dataset's extra /255 (reference dataset.py:71).

    img float32 in [0,1] -> ((img - mean)/std) / 255.
    """
    mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(IMAGENET_STD, img.dtype)
    return ((img - mean) / std) / 255.0


def _augment_one(key, img_u8, mask_u8, train):
    """train: bool (legacy) or a static op tuple from parse_augment_spec."""
    ops = parse_augment_spec(train)
    img = img_u8.astype(jnp.float32) / 255.0
    mask = mask_u8.astype(jnp.float32) / 255.0
    if ops:
        k_geo, k_color = jax.random.split(key)
        img, mask = random_rot90_flip(k_geo, img, mask,
                                      do_rot="rot90" in ops,
                                      do_flip="flip" in ops)
        img = random_color_jitter(
            k_color, img,
            pool=tuple(o for o in ops if o in ("hsv", "brightness", "contrast")))
    img = normalize(img)
    return img, mask


@partial(jax.jit, static_argnames=("train",))
def augment_batch(key, images_u8, masks_u8, train=True):
    """(B,H,W,3) uint8 images + (B,H,W,C) uint8 masks -> normalized float32
    batch. `train` is a bool or a static augment-op tuple (see AUGMENT_OPS)."""
    keys = jax.random.split(key, images_u8.shape[0])
    return jax.vmap(_augment_one, in_axes=(0, 0, 0, None))(keys, images_u8, masks_u8, train)


def eval_transform(images_u8, masks_u8):
    """Val pipeline: Resize (done at load) + Normalize + /255 (trains.py:269-272)."""
    img = normalize(images_u8.astype(jnp.float32) / 255.0)
    mask = masks_u8.astype(jnp.float32) / 255.0
    return img, mask
