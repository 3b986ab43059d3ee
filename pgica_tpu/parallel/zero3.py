"""ZeRO-3: per-layer parameter gathering for scan-over-layers models.

The 8B-scale budget (configs/siglip_llama8b.yaml; reference scale target:
SURVEY §7.3 "Two GPT-2 copies + a frozen reference") cannot hold full
parameters + Adam moments per device. :mod:`pgica_tpu.parallel.zero1` shards
optimizer state but still materializes the full parameter tree for the
forward/backward pass; this module shards the PARAMETERS themselves and
gathers them one transformer layer at a time:

* ``LMConfig.scan_layers`` stacks the homogeneous blocks into one
  ``blocks/...`` subtree with a leading num_layers dim, scanned by one
  compiled block body (``models/lm.py``);
* block parameters live sharded over ``axis_name`` on their LAST dim (always
  head_dim / hidden / intermediate — divisible by any practical fsdp world,
  and unambiguous for the gather hook, which sees only local arrays and
  gathers ``axis=ndim-1``); each scan iteration's
  ``nn.map_variables`` hook (:func:`gather_layer_params`, wired through
  ``TransformerLM.fsdp_axis``) all-gathers exactly ONE layer's weights
  inside the loop body — and, because remat wraps the gather, the backward
  pass RE-gathers instead of saving the full layer;
* the gather's AD transpose is ``psum_scatter``: block gradients leave the
  backward pass already globally summed AND sharded (ZeRO-2 reduce-scatter
  for free, no hand-written collective);
* everything outside the stacked blocks (wte/wpe/ln_f, projection heads, the
  unrolled vision tower) uses the zero1 flat-buffer treatment: one fused
  all-gather per step, gradients scattered by the same transpose mechanism;
* Adam state is sharded exactly like the parameters it mirrors (ZeRO-1).

Per-device parameter residency is therefore ``params/n + one layer``
(gathered transiently), vs GSPMD's "whatever the partitioner decides" — on
CPU the partitioner provably hoists the per-layer gathers to the entry
(tests/test_scan_layers.py documents this), which is exactly the full-
residency failure mode ZeRO-3 exists to avoid. Here the gather sits inside
the traced scan body, so it is inside the compiled while-loop BY
CONSTRUCTION on every backend.

Composition: ``axis_name`` may be a single mesh axis or a tuple (e.g.
``("data", "fsdp")`` — canonical ZeRO shards batch and params over the SAME
devices). Tensor parallelism does not compose with this explicit path (use
the GSPMD scan_layers path for fsdp x model meshes); LoRA's merged-weight
formulation doesn't either, same as zero1.

No reference analog: the reference trains 0.5B models on a single GPU with
HF Accelerate (reference src training loop, SURVEY §2.2); this is the
TPU-native growth path for BASELINE config 5.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pgica_tpu.parallel.zero1 import (
    FlatSpec,
    flatten_tree,
    make_flat_spec,
    unflatten_tree,
)

AxisName = Union[str, Tuple[str, ...]]


def gather_layer_params(tree: Any, axis: AxisName) -> Any:
    """All-gather one layer's weight shards along their LAST dim (inside the
    scan body).

    This is the ``trans_in_fn`` for ``TransformerLM.fsdp_axis``'s
    ``nn.map_variables`` hook: every leaf arrives as this device's
    ``[..., d/n]`` slice of that scan iteration's layer and leaves full. The
    last dim is the one convention derivable from a local array alone. Its
    transpose (reverse-mode AD) is ``psum_scatter`` — gradients w.r.t. the
    shards come back globally summed and scattered, no explicit collective
    needed.
    """
    return jax.tree.map(
        lambda x: jax.lax.all_gather(x, axis, axis=x.ndim - 1, tiled=True), tree
    )


def make_zero3_module(module, axis_name: AxisName):
    """Clone the composed module with per-layer gathering on both text towers.

    ``fsdp_axis`` adds no parameters; the clone shares the original's param
    tree. The module must have ``scan_layers`` text configs
    (``build_module(..., scan_layers=True)``).
    """
    return module.clone(fsdp_axis=axis_name)


def _axis_names(axis_name: AxisName) -> Tuple[str, ...]:
    return axis_name if isinstance(axis_name, tuple) else (axis_name,)


def _fold_axis_index(rng: jax.Array, axis_name: AxisName) -> jax.Array:
    for name in _axis_names(axis_name):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(name))
    return rng


def _is_block_path(path) -> bool:
    return any(
        getattr(k, "key", None) == "blocks" or getattr(k, "name", None) == "blocks"
        for k in path
    )


class ParamLayout:
    """Static split of a param tree into stacked-block leaves + the rest.

    Blocks keep their pytree positions (sharded over their LAST dim); the
    rest round-trips through zero1's flat f32 buffer.
    """

    def __init__(self, params: Any, n: int):
        leaves_with_paths, self.treedef = jax.tree_util.tree_flatten_with_path(params)
        self.is_block = tuple(_is_block_path(p) for p, _ in leaves_with_paths)
        self.n = n
        self.block_ranks = tuple(
            l.ndim for (_, l), b in zip(leaves_with_paths, self.is_block) if b
        )
        for (path, leaf), blk in zip(leaves_with_paths, self.is_block):
            if blk and (leaf.ndim < 2 or leaf.shape[-1] % n):
                raise ValueError(
                    f"zero3: stacked block leaf {jax.tree_util.keystr(path)} "
                    f"shape {leaf.shape} — last dim must be divisible by the "
                    f"axis size {n}; pick head_dim/hidden/intermediate sizes "
                    f"divisible by the fsdp world"
                )
        rest = [l for (_, l), b in zip(leaves_with_paths, self.is_block) if not b]
        self.flat_spec: FlatSpec = make_flat_spec(rest, n)

    def split(self, params: Any) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
        """(block leaves in tree order, flat f32 buffer of the rest)."""
        leaves = jax.tree_util.tree_leaves(params)
        blocks = tuple(l for l, b in zip(leaves, self.is_block) if b)
        rest = [l for l, b in zip(leaves, self.is_block) if not b]
        return blocks, flatten_tree(rest, self.flat_spec)

    def merge(self, blocks: Sequence[jax.Array], rest_flat_full: jax.Array) -> Any:
        """Reassemble the full tree (block leaves may be local shards)."""
        rest = unflatten_tree(rest_flat_full, self.flat_spec)
        bi, ri, leaves = iter(blocks), iter(rest), []
        for b in self.is_block:
            leaves.append(next(bi) if b else next(ri))
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    def block_specs(self, axis_name: AxisName) -> Tuple[P, ...]:
        return tuple(
            P(*([None] * (r - 1) + [axis_name])) for r in self.block_ranks
        )


class Zero3State(flax.struct.PyTreeNode):
    step: jax.Array
    blocks: Tuple[jax.Array, ...]  # stacked (L, ...) — last dim sharded
    rest_flat: jax.Array           # (padded,) f32 — sharded over the axis
    opt_state: Any                 # adamw over (blocks, rest_flat) shards
    skipped: jax.Array


def _opt_specs(tx, layout: ParamLayout, axis_name: AxisName, blocks, rest_flat):
    """PartitionSpecs for the adamw state: scalars replicated, mu/nu shaped
    like the (blocks, rest_flat) pytree they mirror — blocks leaves are
    always rank>=2 (layer dim + weight dims, last dim sharded) and the flat
    buffer rank 1, so rank alone determines the spec."""
    shapes = jax.eval_shape(tx.init, (blocks, rest_flat))

    def spec_for(leaf):
        if leaf.ndim == 0:
            return P()
        if leaf.ndim == 1:
            return P(axis_name)
        return P(*([None] * (leaf.ndim - 1) + [axis_name]))

    return jax.tree.map(spec_for, shapes)


def make_zero3_train_step(
    loss_fn: Callable,
    mesh: Mesh,
    axis_name: AxisName = "fsdp",
    learning_rate: Any = 1e-4,  # float or optax schedule
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    trainable_mask: Optional[Any] = None,
    eps: float = 1e-8,
    with_ref: bool = False,
) -> Tuple[Callable, Callable]:
    """Returns (init_fn, step_fn) for explicit ZeRO-3 training.

    ``loss_fn(params, batch, rng) -> (loss, metrics)`` — or, with
    ``with_ref=True``, ``loss_fn(params, ref_params, batch, rng)`` (DPO
    stage 2: the frozen reference is sharded identically and gathered the
    same way). ``params`` arrive with block leaves as LOCAL dim-0 shards;
    build the loss over a :func:`make_zero3_module` clone so the module
    gathers them per layer.

    ``init_fn(params) -> Zero3State`` shards parameters + Adam state;
    ``init_fn.shard_ref(ref_params) -> (blocks, rest_flat)`` prepares a
    frozen reference tree for the ``ref`` step argument.

    ``step_fn(state, batch, rng, ref=None) -> (state, metrics)``; batch
    leading dims split over ``axis_name`` (a name or tuple of names — pass
    ``("data", "fsdp")`` to shard batch and params over the same devices).
    """
    n = int(np.prod([mesh.shape[a] for a in _axis_names(axis_name)]))
    schedule = learning_rate if callable(learning_rate) else (lambda _: learning_rate)
    tx = optax.adamw(schedule, weight_decay=weight_decay, eps=eps)
    holder: Dict[str, Any] = {}

    def _place(params: Any) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
        layout: ParamLayout = holder["layout"]
        blocks, rest_flat = layout.split(params)
        blocks = tuple(
            jax.device_put(
                b, NamedSharding(mesh, P(*([None] * (b.ndim - 1) + [axis_name])))
            )
            for b in blocks
        )
        rest_flat = jax.device_put(rest_flat, NamedSharding(mesh, P(axis_name)))
        return blocks, rest_flat

    def init_fn(params: Any) -> Zero3State:
        layout = ParamLayout(params, n)
        holder["layout"] = layout
        if trainable_mask is not None:
            mask_tree = jax.tree.map(
                lambda m, l: jnp.broadcast_to(jnp.asarray(m, jnp.float32), l.shape),
                trainable_mask, params,
            )
            holder["mask"] = _place(mask_tree)
        else:
            holder["mask"] = None
        blocks, rest_flat = _place(params)
        opt_state = shard_map(
            tx.init, mesh=mesh,
            in_specs=((layout.block_specs(axis_name), P(axis_name)),),
            out_specs=_opt_specs(tx, layout, axis_name, blocks, rest_flat),
            check_vma=False,
        )((blocks, rest_flat))
        return Zero3State(
            step=jnp.zeros((), jnp.int32),
            blocks=blocks,
            rest_flat=rest_flat,
            opt_state=opt_state,
            skipped=jnp.zeros((), jnp.int32),
        )

    init_fn.shard_ref = lambda ref_params: _place(ref_params)  # type: ignore[attr-defined]

    def step_fn(state: Zero3State, batch, rng, ref=None) -> Tuple[Zero3State, Dict]:
        layout: ParamLayout = holder["layout"]
        mask = holder["mask"]
        has_mask = mask is not None
        has_ref = ref is not None
        if with_ref and not has_ref:
            raise ValueError("step_fn built with with_ref=True needs ref=(blocks, rest_flat)")
        bspecs = layout.block_specs(axis_name)

        def _gather_rest(rest_shard: jax.Array) -> jax.Array:
            return jax.lax.all_gather(rest_shard, axis_name, tiled=True)

        def body(blocks, rest_shard, opt_state, step, skipped, batch_local,
                 rng_in, mask_parts, ref_parts):
            def local_loss(blocks_in, rest_shard_in):
                # Rest params: ONE fused gather; its transpose scatters the
                # gradient back to this shard globally summed. Block params
                # stay LOCAL shards — the module's fsdp_axis hook gathers
                # them one layer per scan iteration (re-gathered by remat on
                # the backward pass).
                params = layout.merge(blocks_in, _gather_rest(rest_shard_in))
                step_rng = _fold_axis_index(
                    jax.random.fold_in(rng_in, step), axis_name
                )
                if has_ref:
                    ref_blocks, ref_rest = ref_parts
                    ref_tree = layout.merge(ref_blocks, _gather_rest(ref_rest))
                    return loss_fn(params, ref_tree, batch_local, step_rng)
                return loss_fn(params, batch_local, step_rng)

            (loss, metrics), (g_blocks, g_rest) = jax.value_and_grad(
                local_loss, argnums=(0, 1), has_aux=True
            )(blocks, rest_shard)
            # AD left both components globally SUMMED (psum_scatter transpose);
            # /n matches the pmean'ed global loss.
            g_blocks = tuple(g.astype(jnp.float32) / n for g in g_blocks)
            g_rest = g_rest / n
            if has_mask:
                mb, mr = mask_parts
                g_blocks = tuple(g * m for g, m in zip(g_blocks, mb))
                g_rest = g_rest * mr
            sq = sum(jnp.sum(g * g) for g in g_blocks) + jnp.sum(g_rest * g_rest)
            gnorm = jnp.sqrt(jax.lax.psum(sq, axis_name))
            scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(gnorm, 1e-12))
            grads = (tuple(g * scale for g in g_blocks), g_rest * scale)

            loss_g = jax.lax.pmean(loss, axis_name)
            ok = jnp.isfinite(loss_g) & jnp.isfinite(gnorm)
            safe = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
            updates, new_opt = tx.update(safe, opt_state, (blocks, rest_shard))
            updates = jax.tree.map(lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
            if has_mask:
                mb, mr = mask_parts
                updates = (
                    tuple(u * m.astype(u.dtype) for u, m in zip(updates[0], mb)),
                    updates[1] * mr,
                )
            new_blocks = tuple(p + u.astype(p.dtype) for p, u in zip(blocks, updates[0]))
            new_rest = rest_shard + updates[1]
            new_opt = jax.tree.map(lambda a, b: jnp.where(ok, a, b), new_opt, opt_state)
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis_name), metrics)
            metrics["loss"] = loss_g
            metrics["grad_norm"] = gnorm
            new_skipped = skipped + jnp.where(ok, 0, 1).astype(jnp.int32)
            metrics["skipped"] = new_skipped
            return new_blocks, new_rest, new_opt, step + 1, new_skipped, metrics

        batch_specs = jax.tree.map(lambda _: P(axis_name), batch)
        opt_specs = _opt_specs(tx, layout, axis_name, state.blocks, state.rest_flat)
        pspecs = (bspecs, P(axis_name))
        out = shard_map(
            body, mesh=mesh,
            in_specs=(bspecs, P(axis_name), opt_specs, P(), P(), batch_specs, P(),
                      pspecs if has_mask else P(),
                      pspecs if has_ref else P()),
            out_specs=(bspecs, P(axis_name), opt_specs, P(), P(), P()),
            check_vma=False,
        )(state.blocks, state.rest_flat, state.opt_state, state.step, state.skipped,
          batch, rng,
          mask if has_mask else jnp.zeros((), jnp.float32),
          ref if has_ref else jnp.zeros((), jnp.float32))
        new_blocks, new_rest, new_opt, new_step, new_skipped, metrics = out
        return (
            Zero3State(step=new_step, blocks=new_blocks, rest_flat=new_rest,
                       opt_state=new_opt, skipped=new_skipped),
            metrics,
        )

    def gather_params(state: Zero3State) -> Any:
        """Full parameter tree (for checkpointing / eval). The state's arrays
        are logically full (sharded placements), so this is just a reshape of
        the flat buffer back into the rest leaves."""
        layout: ParamLayout = holder["layout"]
        return layout.merge(state.blocks, state.rest_flat)

    step_fn.gather_params = gather_params  # type: ignore[attr-defined]
    return init_fn, step_fn
