"""Pallas fused LayerNorm (fwd + bwd) for the TPU hot path.

Motivation (results/PROFILE_stage2.md): the stage-2 step spends ~17% of
device time in XLA's LayerNorm fwd/bwd fusions, which the profile shows
running far below HBM bandwidth (~170 GB/s effective vs ~800 peak on v5e).
One pallas pass per row-block reads x once, computes the f32 statistics
in VMEM, and writes y — and the backward fuses dx with the dgamma/dbeta
cross-row reductions via sequential-grid scratch accumulation (same
pattern as ops/fused_ce.py).

Semantics match ``flax.linen.LayerNorm(param_dtype=f32)``: statistics in
f32 over the last axis, ``y = (x - mu) * rstd * scale + bias`` cast back
to the input dtype. The :class:`FusedLayerNorm` module uses the SAME
param names ("scale"/"bias") as ``nn.LayerNorm`` so checkpoints and
converted HF weights are interchangeable.

Dispatch: pallas on TPU for statically-large row counts, the jnp
reference elsewhere (CPU tests exercise the kernel via ``interpret=True``
explicitly). Toggle with ``set_enabled`` / ``PGICA_FUSED_LN`` (unset =
auto).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ENABLED: Optional[bool] = {"1": True, "0": False}.get(os.environ.get("PGICA_FUSED_LN", ""))
_MIN_ROWS = 1024  # below this the launch overhead beats the fusion win (decode)


def set_enabled(flag: Optional[bool]) -> None:
    """Force the fused path on/off for subsequent TRACES (None = auto)."""
    global _ENABLED
    _ENABLED = flag


def _auto_on(rows: int, hidden: int) -> bool:
    if _ENABLED is None:
        # Default OFF — decided by the interleaved on-chip A/B
        # (results/PROFILE_stage2.md): XLA's LN+residual fusions beat this
        # kernel by ~3.8% on the stage-2 step at batch 16, and at batch 32
        # the pallas call acts as a fusion barrier that materializes f32
        # activations XLA would otherwise remat, OOMing the 16 GB chip.
        # Kept for backends/shapes where XLA's fusion heuristics differ
        # (set_enabled(True)/PGICA_FUSED_LN=1).
        return False
    return (
        _ENABLED
        and jax.default_backend() == "tpu"
        and rows >= _MIN_ROWS
        and hidden % 128 == 0
    )


def _ln_ref(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    rstd = jax.lax.rsqrt(jnp.mean(xc * xc, axis=-1, keepdims=True) + eps)
    y = xc * rstd * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


# ------------------------------------------------------------------ kernels


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, mu_ref, rs_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # (br, H)
    mu = jnp.mean(x, axis=1)
    xc = x - mu[:, None]
    rstd = jax.lax.rsqrt(jnp.mean(xc * xc, axis=1) + eps)
    xhat = xc * rstd[:, None]
    g = g_ref[...].astype(jnp.float32)  # (1, H)
    b = b_ref[...].astype(jnp.float32)
    y_ref[...] = (xhat * g + b).astype(y_ref.dtype)
    mu_ref[...] = mu[None, :]
    rs_ref[...] = rstd[None, :]


def _bwd_kernel(x_ref, g_ref, dy_ref, mu_ref, rs_ref, dx_ref, dg_ref, db_ref,
                dg_scr, db_scr, *, num_r):
    r_idx = pl.program_id(0)

    @pl.when(r_idx == 0)
    def _init():
        dg_scr[...] = jnp.zeros_like(dg_scr)
        db_scr[...] = jnp.zeros_like(db_scr)

    x = x_ref[...].astype(jnp.float32)      # (br, H)
    dy = dy_ref[...].astype(jnp.float32)    # (br, H)
    g = g_ref[...].astype(jnp.float32)      # (1, H)
    mu = mu_ref[...][0]                     # (br,)
    rstd = rs_ref[...][0]
    xhat = (x - mu[:, None]) * rstd[:, None]

    dg_scr[...] += jnp.sum(dy * xhat, axis=0)[None, :]
    db_scr[...] += jnp.sum(dy, axis=0)[None, :]

    dxhat = dy * g
    m1 = jnp.mean(dxhat, axis=1)
    m2 = jnp.mean(dxhat * xhat, axis=1)
    dx = rstd[:, None] * (dxhat - m1[:, None] - xhat * m2[:, None])
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(r_idx == num_r - 1)
    def _finish():
        dg_ref[...] = dg_scr[...]
        db_ref[...] = db_scr[...]


def _rms_fwd_kernel(x_ref, g_ref, y_ref, rs_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # (br, H)
    rstd = jax.lax.rsqrt(jnp.mean(x * x, axis=1) + eps)
    g = g_ref[...].astype(jnp.float32)  # (1, H)
    y_ref[...] = (x * rstd[:, None] * g).astype(y_ref.dtype)
    rs_ref[...] = rstd[None, :]


def _rms_bwd_kernel(x_ref, g_ref, dy_ref, rs_ref, dx_ref, dg_ref, dg_scr, *, num_r):
    r_idx = pl.program_id(0)

    @pl.when(r_idx == 0)
    def _init():
        dg_scr[...] = jnp.zeros_like(dg_scr)

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    rstd = rs_ref[...][0]
    xhat = x * rstd[:, None]

    dg_scr[...] += jnp.sum(dy * xhat, axis=0)[None, :]

    dxhat = dy * g
    m2 = jnp.mean(dxhat * xhat, axis=1)
    dx_ref[...] = (rstd[:, None] * (dxhat - xhat * m2[:, None])).astype(dx_ref.dtype)

    @pl.when(r_idx == num_r - 1)
    def _finish():
        dg_ref[...] = dg_scr[...]


# ------------------------------------------------------------------ plumbing


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_rows(x: jax.Array, rows_p: int) -> jax.Array:
    pad = rows_p - x.shape[0]
    return x if pad == 0 else jnp.pad(x, ((0, pad), (0, 0)))


def _block(rows: int, block_r: int) -> int:
    # 16-row granularity: bf16's min sublane tile (f32 needs only 8)
    return min(block_r, _round_up(rows, 16))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(x, scale, bias, eps, block_r, interpret):
    y, _, _ = _fused_fwd_impl(x, scale, bias, eps, block_r, interpret)
    return y


def _fused_fwd_impl(x, scale, bias, eps, block_r, interpret):
    rows, h = x.shape
    br = _block(rows, block_r)
    rows_p = _round_up(rows, br)
    xp = _pad_rows(x, rows_p)
    y, mu, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(rows_p // br,),
        in_specs=[
            pl.BlockSpec((br, h), lambda r: (r, 0)),
            pl.BlockSpec((1, h), lambda r: (0, 0)),
            pl.BlockSpec((1, h), lambda r: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((br, h), lambda r: (r, 0)),
            pl.BlockSpec((1, br), lambda r: (0, r)),
            pl.BlockSpec((1, br), lambda r: (0, r)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_p, h), x.dtype),
            jax.ShapeDtypeStruct((1, rows_p), jnp.float32),
            jax.ShapeDtypeStruct((1, rows_p), jnp.float32),
        ],
        interpret=interpret,
    )(xp, scale.reshape(1, h), bias.reshape(1, h))
    return y[:rows], mu, rstd


def _fused_fwd(x, scale, bias, eps, block_r, interpret):
    y, mu, rstd = _fused_fwd_impl(x, scale, bias, eps, block_r, interpret)
    return y, (x, scale, mu, rstd)


def _fused_bwd(eps, block_r, interpret, residuals, dy):
    x, scale, mu, rstd = residuals
    rows, h = x.shape
    br = _block(rows, block_r)
    rows_p = _round_up(rows, br)
    num_r = rows_p // br
    xp = _pad_rows(x, rows_p)
    # dy padding is zeros, so the padded rows contribute nothing to dg/db.
    dyp = _pad_rows(dy, rows_p)
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, num_r=num_r),
        grid=(num_r,),
        in_specs=[
            pl.BlockSpec((br, h), lambda r: (r, 0)),
            pl.BlockSpec((1, h), lambda r: (0, 0)),
            pl.BlockSpec((br, h), lambda r: (r, 0)),
            pl.BlockSpec((1, br), lambda r: (0, r)),
            pl.BlockSpec((1, br), lambda r: (0, r)),
        ],
        out_specs=[
            pl.BlockSpec((br, h), lambda r: (r, 0)),
            pl.BlockSpec((1, h), lambda r: (0, 0)),
            pl.BlockSpec((1, h), lambda r: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_p, h), x.dtype),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
        ],
        interpret=interpret,
    )(xp, scale.reshape(1, h), dyp, mu, rstd)
    return dx[:rows], dg.reshape(h).astype(scale.dtype), db.reshape(h)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _rms_ref(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * rstd * scale.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_rms(x, scale, eps, block_r, interpret):
    y, _ = _fused_rms_fwd_impl(x, scale, eps, block_r, interpret)
    return y


def _fused_rms_fwd_impl(x, scale, eps, block_r, interpret):
    rows, h = x.shape
    br = _block(rows, block_r)
    rows_p = _round_up(rows, br)
    xp = _pad_rows(x, rows_p)
    y, rstd = pl.pallas_call(
        functools.partial(_rms_fwd_kernel, eps=eps),
        grid=(rows_p // br,),
        in_specs=[
            pl.BlockSpec((br, h), lambda r: (r, 0)),
            pl.BlockSpec((1, h), lambda r: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((br, h), lambda r: (r, 0)),
            pl.BlockSpec((1, br), lambda r: (0, r)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_p, h), x.dtype),
            jax.ShapeDtypeStruct((1, rows_p), jnp.float32),
        ],
        interpret=interpret,
    )(xp, scale.reshape(1, h))
    return y[:rows], rstd


def _fused_rms_fwd(x, scale, eps, block_r, interpret):
    y, rstd = _fused_rms_fwd_impl(x, scale, eps, block_r, interpret)
    return y, (x, scale, rstd)


def _fused_rms_bwd(eps, block_r, interpret, residuals, dy):
    x, scale, rstd = residuals
    rows, h = x.shape
    br = _block(rows, block_r)
    rows_p = _round_up(rows, br)
    num_r = rows_p // br
    xp = _pad_rows(x, rows_p)
    dyp = _pad_rows(dy, rows_p)
    dx, dg = pl.pallas_call(
        functools.partial(_rms_bwd_kernel, num_r=num_r),
        grid=(num_r,),
        in_specs=[
            pl.BlockSpec((br, h), lambda r: (r, 0)),
            pl.BlockSpec((1, h), lambda r: (0, 0)),
            pl.BlockSpec((br, h), lambda r: (r, 0)),
            pl.BlockSpec((1, br), lambda r: (0, r)),
        ],
        out_specs=[
            pl.BlockSpec((br, h), lambda r: (r, 0)),
            pl.BlockSpec((1, h), lambda r: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_p, h), x.dtype),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, h), jnp.float32)],
        interpret=interpret,
    )(xp, scale.reshape(1, h), dyp, rstd)
    return dx[:rows], dg.reshape(h).astype(scale.dtype)


_fused_rms.defvjp(_fused_rms_fwd, _fused_rms_bwd)


def fused_rmsnorm(
    x: jax.Array,
    scale: jax.Array,
    eps: float = 1e-5,
    block_r: int = 512,
    interpret: bool = False,
    force: Optional[bool] = None,
) -> jax.Array:
    """RMSNorm over the last axis (llama towers); same dispatch as
    :func:`fused_layernorm`."""
    h = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= int(d)
    on = force if force is not None else (interpret or _auto_on(rows, h))
    if not on:
        return _rms_ref(x, scale, eps)
    return _fused_rms(x.reshape(rows, h), scale, eps, block_r, interpret).reshape(x.shape)


class RMSNorm(nn.Module):
    """nn.RMSNorm-compatible module backed by the pallas kernel (same class
    name -> same auto-generated scope names; param "scale" in f32)."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (h,), jnp.float32)
        return fused_rmsnorm(x.astype(self.dtype), scale, self.epsilon)


def fused_layernorm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    block_r: int = 512,
    interpret: bool = False,
    force: Optional[bool] = None,
) -> jax.Array:
    """LayerNorm over the last axis; leading axes are flattened to rows.

    ``force`` overrides the auto dispatch (None = auto: pallas on TPU when
    the static row count clears ``_MIN_ROWS``); ``interpret`` runs the
    pallas kernel in interpreter mode (CPU tests).
    """
    h = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= int(d)
    on = force if force is not None else (interpret or _auto_on(rows, h))
    if not on:
        return _ln_ref(x, scale, bias, eps)
    y = _fused(x.reshape(rows, h), scale, bias, eps, block_r, interpret)
    return y.reshape(x.shape)


class LayerNorm(nn.Module):
    """nn.LayerNorm-compatible module backed by the pallas kernel.

    Same param names/shapes ("scale"/"bias", f32) and f32-statistics
    semantics as ``nn.LayerNorm(param_dtype=jnp.float32)`` — and the same
    CLASS name, so flax auto-naming produces identical param-tree scopes
    ("LayerNorm_0", ...) as the nn module it replaces (converted HF
    checkpoints keep loading unchanged).
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (h,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (h,), jnp.float32)
        return fused_layernorm(x.astype(self.dtype), scale, bias, self.epsilon)


# explicit-import alias (call sites read better than bare LayerNorm)
FusedLayerNorm = LayerNorm
