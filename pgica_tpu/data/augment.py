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
the column matrix for free. The reference's ±5° rotation is approximated by
small random translations (folded into the same matrices) — a documented
deviation chosen because true rotation is non-separable; at ≤5° the
augmentation effect (local pixel displacement) is comparable.

All functions take **normalized** NHWC float32 batches; color jitter is
applied in de-normalized [0, 1] space internally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pgica_tpu.data.preprocessing import IMAGENET_MEAN, IMAGENET_STD

_MEAN = jnp.asarray(IMAGENET_MEAN)
_STD = jnp.asarray(IMAGENET_STD)


def _resample_matrix(
    key: jax.Array, size: int, min_scale: float, max_shift_frac: float, flip: bool = False
) -> jax.Array:
    """(size, size) nearest-neighbor resample matrix: crop+resize+shift (+flip).

    Samples a crop scale in [min_scale, 1] and a placement offset, then builds
    the one-hot matrix M with out = M @ in along this axis.
    """
    k_scale, k_off, k_shift, k_flip = jax.random.split(key, 4)
    scale = jax.random.uniform(k_scale, (), minval=min_scale, maxval=1.0)
    crop_len = size * scale
    max_off = size - crop_len
    offset = jax.random.uniform(k_off, (), minval=0.0, maxval=1.0) * max_off
    # small translation standing in for the reference's ±5° rotation
    shift = jax.random.uniform(k_shift, (), minval=-max_shift_frac, maxval=max_shift_frac) * size

    positions = offset + shift + (jnp.arange(size) + 0.5) * (crop_len / size) - 0.5
    idx = jnp.clip(jnp.round(positions).astype(jnp.int32), 0, size - 1)
    if flip:
        do_flip = jax.random.bernoulli(k_flip)
        idx = jnp.where(do_flip, size - 1 - idx, idx)
    return jax.nn.one_hot(idx, size, dtype=jnp.float32)  # (size_out, size_in)


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


def _augment_one(key: jax.Array, img: jax.Array) -> jax.Array:
    h, w, _ = img.shape
    k_h, k_w, k_col = jax.random.split(key, 3)
    # sqrt so the 2D area scale matches the reference's area-based crop range
    min_axis_scale = 0.8**0.5
    m_rows = _resample_matrix(k_h, h, min_axis_scale, max_shift_frac=0.02, flip=False)
    m_cols = _resample_matrix(k_w, w, min_axis_scale, max_shift_frac=0.02, flip=True)
    # out[i, j, c] = sum_{a,b} m_rows[i,a] * img[a,b,c] * m_cols[j,b]  (two MXU matmuls)
    img = jnp.einsum("ia,abc->ibc", m_rows, img, preferred_element_type=jnp.float32)
    img = jnp.einsum("jb,ibc->ijc", m_cols, img, preferred_element_type=jnp.float32)

    img01 = jnp.clip(img * _STD + _MEAN, 0.0, 1.0)
    img01 = _color_jitter(k_col, img01)
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
