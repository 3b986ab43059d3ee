"""Device-side, PRNG-keyed image augmentation fused into the jitted step.

Replaces the reference's torchvision host-side transforms (reference
preprocessing.py:52-68: RandomResizedCrop(0.8-1.0), HFlip(0.5),
ColorJitter(0.2/0.2/0.2/0.1), RandomRotation(±5°)) with pure-JAX functions
that run on device under jit, so augmentation rides the TPU VPU instead of
the (single-core) host.

All functions take **normalized** NHWC float32 batches. Color jitter is
applied in de-normalized [0,1] space internally.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pgica_tpu.data.preprocessing import IMAGENET_MEAN, IMAGENET_STD

_MEAN = jnp.asarray(IMAGENET_MEAN)
_STD = jnp.asarray(IMAGENET_STD)


def _random_resized_crop(key: jax.Array, img: jax.Array, min_scale: float = 0.8) -> jax.Array:
    """Crop a random area in [min_scale, 1.0] and resize back (per image, HWC)."""
    h, w, _ = img.shape
    k_scale, k_y, k_x = jax.random.split(key, 3)
    scale = jax.random.uniform(k_scale, (), minval=min_scale, maxval=1.0)
    ch = jnp.round(h * jnp.sqrt(scale)).astype(jnp.int32)
    cw = jnp.round(w * jnp.sqrt(scale)).astype(jnp.int32)
    y0 = jax.random.randint(k_y, (), 0, h - ch + 1)
    x0 = jax.random.randint(k_x, (), 0, w - cw + 1)
    # Static-shape gather: build source index grids for the resized output.
    yy = (jnp.arange(h) * (ch.astype(jnp.float32) / h)).astype(jnp.int32) + y0
    xx = (jnp.arange(w) * (cw.astype(jnp.float32) / w)).astype(jnp.int32) + x0
    return img[yy][:, xx]


def _hflip(key: jax.Array, img: jax.Array) -> jax.Array:
    return jnp.where(jax.random.bernoulli(key), img[:, ::-1, :], img)


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
    # Cheap hue shift: rotate channels toward their mean by a random amount.
    shift = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    rolled = jnp.roll(img01, 1, axis=-1)
    img01 = img01 * (1 - jnp.abs(shift)) + rolled * jnp.abs(shift)
    return jnp.clip(img01, 0.0, 1.0)


def _rotate(key: jax.Array, img: jax.Array, max_degrees: float = 5.0) -> jax.Array:
    """Small-angle rotation via inverse-mapped nearest-neighbor sampling."""
    h, w, _ = img.shape
    angle = jax.random.uniform(key, (), minval=-max_degrees, maxval=max_degrees) * jnp.pi / 180.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = jnp.mgrid[0:h, 0:w]
    yc, xc = ys - cy, xs - cx
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    src_y = jnp.clip(jnp.round(cos * yc - sin * xc + cy).astype(jnp.int32), 0, h - 1)
    src_x = jnp.clip(jnp.round(sin * yc + cos * xc + cx).astype(jnp.int32), 0, w - 1)
    return img[src_y, src_x]


def _augment_one(key: jax.Array, img: jax.Array) -> jax.Array:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = _random_resized_crop(k1, img)
    img = _hflip(k2, img)
    img01 = jnp.clip(img * _STD + _MEAN, 0.0, 1.0)
    img01 = _color_jitter(k3, img01)
    img = (img01 - _MEAN) / _STD
    img = _rotate(k4, img)
    return img


@functools.partial(jax.jit, static_argnames=("enabled",))
def augment_batch(key: jax.Array, images: jax.Array, enabled: bool = True) -> jax.Array:
    """Augment an NHWC normalized batch on device. No-op when disabled."""
    if not enabled:
        return images
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(_augment_one)(keys, images)
