"""ZeRO-1: reduce-scattered gradients + flat-sharded optimizer state.

BACKLOG scale-out item ("explicit shard_map training loop with
reduce_scatter-then-update"). The GSPMD path (parallel/sharding.py) already
shards parameters over ``fsdp``; this module is the EXPLICIT-collective
alternative targeting optimizer-state memory — the dominant term at 8B scale
(Adam moments are 8 bytes/param in f32):

* parameters live as ONE flat f32 buffer, sharded over the data axis
  (each device owns ``total/n`` contiguous elements);
* the step all-gathers the flat shard (one fused ICI all-gather instead of
  per-layer gathers — seq 128 models are weight-bandwidth friendly), runs the
  local loss/grad on the local batch, then ``psum_scatter``s the flat gradient
  so every device updates only ITS shard with only ITS slice of Adam state;
* global-norm clipping uses a psum of local shard square-sums; NaN-safe
  skipping matches train_step._apply_update semantics (zero update, keep
  moments, bump the skip counter).

Grad-accumulation (optax.MultiSteps) is intentionally not threaded through —
accumulate microbatches outside if needed. Freezing is an update mask (frozen
slices keep their values; no decay applied), built from the same
freeze_labels as the standard optimizer.

The per-shard loss_fn may use ``axis_name`` collectives (e.g. NT-Xent global
negatives all-gather) — the reverse-mode collective routes cross-shard
embedding cotangents back to their origin shard, so psum-scattered local
grads equal the gradient of the pmean'ed global loss exactly
(tests/test_parallel.py::TestZero1).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class FlatSpec(NamedTuple):
    """Static recipe for tree <-> flat f32 buffer round-trips."""

    treedef: Any
    shapes: Tuple[Tuple[int, ...], ...]
    sizes: Tuple[int, ...]
    dtypes: Tuple[Any, ...]
    padded_size: int  # total elements, padded to a multiple of the axis size


def make_flat_spec(params: Any, n_shards: int) -> FlatSpec:
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = tuple(l.shape for l in leaves)
    dtypes = tuple(l.dtype for l in leaves)
    sizes = tuple(int(np.prod(s)) if s else 1 for s in shapes)
    total = sum(sizes)
    padded = ((total + n_shards - 1) // n_shards) * n_shards
    return FlatSpec(treedef, shapes, sizes, dtypes, padded)


def flatten_tree(tree: Any, spec: FlatSpec) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    flat = jnp.concatenate([l.astype(jnp.float32).reshape(-1) for l in leaves])
    return jnp.pad(flat, (0, spec.padded_size - flat.shape[0]))


def unflatten_tree(flat: jax.Array, spec: FlatSpec) -> Any:
    leaves = []
    offset = 0
    for shape, size, dtype in zip(spec.shapes, spec.sizes, spec.dtypes):
        leaves.append(flat[offset : offset + size].reshape(shape).astype(dtype))
        offset += size
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)


class Zero1State(flax.struct.PyTreeNode):
    step: jax.Array
    param_shard: jax.Array  # (padded_size / n,) f32, this device's slice
    opt_state: Any          # adamw state over the shard
    skipped: jax.Array


def _make_tx(schedule, weight_decay: float, eps: float) -> optax.GradientTransformation:
    return optax.adamw(schedule, weight_decay=weight_decay, eps=eps)


def make_zero1_train_step(
    loss_fn: Callable[[Any, Dict[str, jax.Array], jax.Array], Tuple[jax.Array, Dict]],
    mesh: Mesh,
    axis_name: str = "data",
    learning_rate: Any = 1e-4,  # float or optax schedule
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    trainable_mask: Optional[Any] = None,
    eps: float = 1e-8,
) -> Tuple[Callable, Callable]:
    """Returns (init_fn, step_fn).

    ``init_fn(params) -> Zero1State`` — shards the flat parameter buffer and
    Adam state over ``axis_name`` (device_put with the right layout; no
    full-size optimizer state ever exists).

    ``step_fn(state, batch, rng) -> (state, metrics)`` — one shard_map train
    step; batch leading dims are split over ``axis_name``. ``loss_fn`` runs
    per shard on the local batch and may use ``axis_name`` collectives.

    ``trainable_mask``: optional bool pytree (params-shaped); False entries
    are frozen (no update, no decay) — compose with
    :func:`pgica_tpu.training.optim.freeze_labels`.
    """
    n = mesh.shape[axis_name]
    schedule = learning_rate if callable(learning_rate) else (lambda _: learning_rate)
    tx = _make_tx(schedule, weight_decay, eps)
    spec_holder = {}

    def init_fn(params: Any) -> Zero1State:
        spec = make_flat_spec(params, n)
        spec_holder["spec"] = spec
        if trainable_mask is not None:
            mask_leaves = [
                jnp.broadcast_to(jnp.asarray(m, jnp.float32), l.shape).reshape(-1)
                for m, l in zip(
                    jax.tree_util.tree_leaves(trainable_mask),
                    jax.tree_util.tree_leaves(params),
                )
            ]
            mask_flat = jnp.pad(
                jnp.concatenate(mask_leaves),
                (0, spec.padded_size - sum(spec.sizes)),
            )
        else:
            mask_flat = None
        spec_holder["mask"] = mask_flat

        flat = flatten_tree(params, spec)
        flat = jax.device_put(flat, NamedSharding(mesh, P(axis_name)))

        # Initialize Adam moments INSIDE shard_map so the full-size buffers
        # never materialize: count is a replicated scalar, mu/nu are sharded
        # like the parameter buffer they mirror.
        opt_state = shard_map(
            tx.init, mesh=mesh, in_specs=P(axis_name),
            out_specs=_opt_out_specs(tx, axis_name), check_vma=False,
        )(flat)
        return Zero1State(
            step=jnp.zeros((), jnp.int32),
            param_shard=flat,  # stored padded-full but SHARDED over axis_name
            opt_state=opt_state,
            skipped=jnp.zeros((), jnp.int32),
        )

    def step_fn(state: Zero1State, batch, rng) -> Tuple[Zero1State, Dict]:
        spec: FlatSpec = spec_holder["spec"]
        mask_flat = spec_holder["mask"]
        has_mask = mask_flat is not None

        def body(param_flat_shard, opt_state, step, skipped, batch_local, rng_in, mask_shard):
            # 1. materialize full params: ONE fused all-gather over ICI
            flat = jax.lax.all_gather(param_flat_shard, axis_name, tiled=True)
            params = unflatten_tree(flat, spec)
            # 2. local loss/grads (loss_fn may all-gather embeddings etc.).
            # Per-shard key: without the axis_index fold every shard would
            # draw IDENTICAL augmentation crops / dropout masks for its
            # local batch, silently diverging from the GSPMD path's
            # batch-wide independent draws.
            step_rng = jax.random.fold_in(
                jax.random.fold_in(rng_in, step), jax.lax.axis_index(axis_name)
            )
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_local, step_rng
            )
            # 3. reduce-scatter the flat gradient; /n for the pmean-loss grad
            gflat = flatten_tree(grads, spec)
            gshard = jax.lax.psum_scatter(gflat, axis_name, tiled=True) / n
            # Frozen slices are zeroed BEFORE the norm so clipping matches
            # the standard optimizer, where clip_by_global_norm sits inside
            # the 'train' partition and never sees frozen-tower gradients.
            if has_mask:
                gshard = gshard * mask_shard
            # 4. global-norm clip from psum of shard square-sums
            gnorm = jnp.sqrt(jax.lax.psum(jnp.sum(gshard * gshard), axis_name))
            scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(gnorm, 1e-12))
            gshard = gshard * scale
            # 5. NaN-safe sharded AdamW update
            loss_g = jax.lax.pmean(loss, axis_name)
            ok = jnp.isfinite(loss_g) & jnp.isfinite(gnorm)
            safe_g = jnp.where(ok, gshard, jnp.zeros_like(gshard))
            updates, new_opt = tx.update(safe_g, opt_state, param_flat_shard)
            updates = jnp.where(ok, updates, jnp.zeros_like(updates))
            if has_mask:
                updates = updates * mask_shard
            new_param_shard = param_flat_shard + updates
            new_opt = jax.tree.map(
                lambda a, b: jnp.where(ok, a, b), new_opt, opt_state
            )
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis_name), metrics)
            metrics["loss"] = loss_g
            metrics["grad_norm"] = gnorm
            new_skipped = skipped + jnp.where(ok, 0, 1).astype(jnp.int32)
            metrics["skipped"] = new_skipped
            return new_param_shard, new_opt, step + 1, new_skipped, metrics

        batch_specs = jax.tree.map(lambda _: P(axis_name), batch)
        out = shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P(axis_name), _opt_out_specs(tx, axis_name), P(), P(),
                batch_specs, P(),
                P(axis_name) if has_mask else P(),
            ),
            out_specs=(
                P(axis_name), _opt_out_specs(tx, axis_name), P(), P(),
                P(),
            ),
            check_vma=False,
        )(state.param_shard, state.opt_state, state.step, state.skipped, batch, rng,
          mask_flat if has_mask else jnp.zeros((), jnp.float32))
        new_param, new_opt, new_step, new_skipped, metrics = out
        return (
            Zero1State(step=new_step, param_shard=new_param, opt_state=new_opt,
                       skipped=new_skipped),
            metrics,
        )

    def gather_params(state: Zero1State) -> Any:
        spec: FlatSpec = spec_holder["spec"]
        return unflatten_tree(state.param_shard, spec)

    step_fn.gather_params = gather_params  # type: ignore[attr-defined]
    return init_fn, step_fn


def _opt_out_specs(tx: optax.GradientTransformation, axis_name: str) -> Any:
    """PartitionSpecs for the adamw state over a flat shard: count replicated,
    mu/nu sharded like the buffer they mirror."""
    state_shape = jax.eval_shape(tx.init, jax.ShapeDtypeStruct((8,), jnp.float32))

    def spec_for(leaf):
        return P(axis_name) if leaf.ndim >= 1 else P()

    return jax.tree.map(spec_for, state_shape)
