"""Int8 weight quantization for the decode/serving path.

The autoregressive decode loop reads every decoder weight once per token
step (see results/PROFILE_decode.md); at batch <= 32 the loop is dominated
by that per-step fixed cost. Storing block matmul weights as int8 halves
their HBM traffic, and the v5e MXU executes int8 x int8 matmuls at 2x the
bf16 rate — so the quantized path helps both the weight-read floor and the
matmul itself.

Two modes (``inference.quantization`` in the config / ``--quant`` on
scripts/serve.py):

* ``int8``   — W8A8: per-output-channel symmetric int8 weights + per-row
  (per-token) dynamic activation quantization; the matmul runs int8 x int8
  -> int32 on the MXU and is rescaled in f32. Both operands of the decode
  loop's dots stay int8 in HBM, so XLA cannot (and need not) hoist a
  dequantized copy out of the ``lax.scan``.
* ``int8_weight_only`` — W8: weights dequantize to the compute dtype inside
  the matmul fusion; activations untouched. Numerically gentler, but XLA
  may hoist the loop-invariant dequantized weights out of the decode scan
  (materializing bf16 copies), so its bandwidth win is compile-dependent.

Training is NEVER quantized — this is an inference-only transform applied to
a trained f32 checkpoint (``quantize_like``). The reference has no analog
(its serving path is HF ``generate()`` at full precision); this is a
beyond-reference production-serving feature.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

INT8_MODES = ("int8", "int8_weight_only")


def quantize_weight(w: jax.Array, n_feature_dims: int) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization.

    ``w`` has shape (contract_dims..., feature_dims...); the scale is an
    amax over the contracting (leading) dims, one per output channel.
    Returns (int8 q, f32 scale) with ``w ~= q * scale``.
    """
    w = jnp.asarray(w, jnp.float32)
    contract_axes = tuple(range(w.ndim - n_feature_dims))
    amax = jnp.max(jnp.abs(w), axis=contract_axes)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row (per-token) symmetric int8 activation quantization.

    x: (rows, K) in any float dtype -> (int8 (rows, K), f32 (rows, 1) scale).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def q8_matmul(x: jax.Array, kernel_q: jax.Array, scale: jax.Array,
              weight_only: bool = False, out_dtype: Any = jnp.bfloat16) -> jax.Array:
    """x @ dequant(kernel_q): (rows, K) x (K, N) -> (rows, N).

    W8A8 by default (int8 x int8 -> int32 on the MXU, f32 rescale);
    ``weight_only`` dequantizes the kernel and runs the matmul in f32/bf16.
    """
    if weight_only:
        w = kernel_q.astype(out_dtype) * scale.astype(out_dtype)[None, :]
        return (x.astype(out_dtype) @ w).astype(out_dtype)
    xq, sx = _quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, kernel_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * sx * scale[None, :]).astype(out_dtype)


class QuantDenseGeneral(nn.Module):
    """Drop-in for the ``nn.DenseGeneral``/``nn.Dense`` patterns used in
    :mod:`pgica_tpu.models.layers`, with an int8 kernel.

    Supports ``axis=-1`` (contract the last dim) and ``axis=(-2, -1)``
    (contract the last two dims, e.g. attention out_proj); ``features`` may
    be an int or a tuple. Params: ``kernel_q`` int8 (contract..., features...),
    ``scale`` f32 (features...), ``bias`` f32 (features...).

    Initialization quantizes a LeCun-normal sample so a standalone init has
    sensible magnitudes, but the intended use is :func:`quantize_like` on a
    trained checkpoint.
    """

    features: Union[int, Sequence[int]]
    axis: Union[int, Sequence[int]] = -1
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    weight_only: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        features = (self.features,) if isinstance(self.features, int) else tuple(self.features)
        axis = (self.axis,) if isinstance(self.axis, int) else tuple(self.axis)
        n_contract = len(axis)
        contract_shape = x.shape[-n_contract:]
        kernel_shape = contract_shape + features

        def init_q(rng, shape):
            fan_in = int(np.prod(contract_shape))
            w = jax.random.normal(rng, shape, jnp.float32) / np.sqrt(fan_in)
            return quantize_weight(w, len(features))[0]

        def init_scale(rng, shape):
            fan_in = int(np.prod(contract_shape))
            return jnp.full(shape, 1.0 / (127.0 * np.sqrt(fan_in)), jnp.float32)

        kernel_q = self.param("kernel_q", init_q, kernel_shape)
        scale = self.param("scale", init_scale, features)

        lead = x.shape[: x.ndim - n_contract]
        rows = int(np.prod(lead)) if lead else 1
        k = int(np.prod(contract_shape))
        n = int(np.prod(features))
        y = q8_matmul(
            x.reshape(rows, k), kernel_q.reshape(k, n), scale.reshape(n),
            weight_only=self.weight_only, out_dtype=self.dtype,
        )
        y = y.reshape(lead + features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, features, jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def _is_dense_leaf_dict(d: Any) -> bool:
    return isinstance(d, dict) and "kernel_q" in d


def quantize_like(template: Any, source: Any, path: str = "",
                  cast_rest: Optional[Any] = None) -> Any:
    """Fill a quantized param-tree ``template`` (e.g. from ``jax.eval_shape``
    of the quantized twin module's init) from a trained f32 ``source`` tree.

    Wherever the template expects ``{kernel_q, scale[, bias]}``, the source's
    ``{kernel[, bias]}`` is quantized per output channel (from the f32
    masters — never from an already-rounded copy); all other leaves are
    copied from the source. ``cast_rest`` (e.g. ``jnp.bfloat16``) casts those
    remaining FLOAT leaves for decode-bandwidth parity with
    ``_inference_params`` — scales stay f32 and int leaves stay put.
    """
    if _is_dense_leaf_dict(template):
        if "kernel" not in source:
            raise ValueError(f"{path}: source has no 'kernel' for a quantized dense")
        n_feature_dims = template["scale"].ndim
        q, scale = quantize_weight(jnp.asarray(source["kernel"]), n_feature_dims)
        if q.shape != tuple(template["kernel_q"].shape):
            raise ValueError(
                f"{path}: kernel shape {q.shape} != template {tuple(template['kernel_q'].shape)}"
            )
        out = {"kernel_q": q, "scale": scale}
        if "bias" in template:
            out["bias"] = jnp.asarray(source["bias"], jnp.float32)
        return out
    if isinstance(template, dict):
        out = {}
        for key, tval in template.items():
            if key not in source:
                raise ValueError(f"{path}/{key}: missing in source params")
            out[key] = quantize_like(tval, source[key], f"{path}/{key}", cast_rest)
        return out
    # array leaf: copy from source
    leaf = jnp.asarray(source)
    if leaf.shape != tuple(template.shape):
        raise ValueError(f"{path}: shape {leaf.shape} != template {tuple(template.shape)}")
    if cast_rest is not None and jnp.issubdtype(leaf.dtype, jnp.floating):
        return leaf.astype(cast_rest)
    return leaf.astype(template.dtype)
