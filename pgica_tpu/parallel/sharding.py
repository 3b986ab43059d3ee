"""Parameter partition rules: param-tree path -> PartitionSpec.

Tensor-parallel layout follows the Megatron/scaling-book recipe:

* attention q/k/v DenseGeneral kernels (embed, heads, head_dim): heads over
  ``model``, embed over ``fsdp``;
* attention out_proj (heads, head_dim, embed): heads over ``model``, embed
  over ``fsdp``;
* MLP in/gate/up (embed, intermediate): intermediate over ``model``;
  MLP out/down (intermediate, embed): intermediate over ``model``;
* token embedding (vocab, embed): vocab over ``model`` (weight-tied logits
  are resolved by XLA SPMD with a psum over the model axis);
* norms/biases/small heads: replicated;
* scan_layers stacked blocks (leading num_layers dim): ``fsdp`` shards the
  layer dim (whole layers per device, gathered one per scan iteration —
  ZeRO-3), ``model`` stays on head/intermediate dims.

Every rule degrades gracefully: if a dimension is not divisible by the axis
size, that axis is dropped (replicated) so tiny test models still compile on
8-device meshes.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

# (path regex, spec per dimension) — first match wins. Dim entries may be
# None, an axis name, or a tuple of axis names.
_RULES: Tuple[Tuple[str, Tuple], ...] = (
    (r".*(q_proj|k_proj|v_proj)/kernel$", ("fsdp", "model", None)),
    (r".*out_proj/kernel$", ("model", None, "fsdp")),
    (r".*(fc_in|gate_proj|up_proj)/kernel$", ("fsdp", "model")),
    (r".*(fc_out|down_proj)/kernel$", ("model", "fsdp")),
    # wte: vocab over model (Megatron vocab-parallel; weight-tied logits get
    # the matching split). On meshes with a real model axis the embedding dim
    # is deliberately NOT fsdp-sharded: the token-lookup gather inherits the
    # operand's emb sharding, which conflicts with batch-over-(data, fsdp)
    # activations downstream and made the SPMD partitioner fall back to
    # involuntary FULL rematerialization of the [B, S, E] embeddings on
    # data x fsdp x model meshes (root-caused round 4; 3 warnings in
    # MULTICHIP_r03 traced to exactly this rule). On PURE-FSDP meshes
    # (model axis absent or size 1) that conflict cannot arise — vocab is
    # unsharded so the gather is local — and replicating wte there costs
    # ~0.6 GB/device for GPT-2's 50262x1024 table (params + fp32 Adam state),
    # so infer_param_spec swaps the emb dim back to fsdp in that case
    # (verified remat-warning-free on an fsdp=8 mesh, round 5).
    (r".*wte/embedding$", ("model", None)),
    (r".*wpe/embedding$", (None, "fsdp")),
    (r".*patch_embed/kernel$", (None, None, None, "model")),
    (r".*projection/(fc1|fc2)/kernel$", ("fsdp", None)),
    (r".*vision_projection.*kernel$", ("fsdp", None)),
)


def _axis_size(mesh: Mesh, axis) -> int:
    """Axes absent from the mesh count as size 1 (rule drops to replicated),
    so partial meshes (e.g. a data/model/seq test mesh with no fsdp axis)
    still shard under the same rule table."""
    if axis is None:
        return 1
    if isinstance(axis, tuple):
        size = 1
        for a in axis:
            size *= mesh.shape.get(a, 1)
        return size
    return mesh.shape.get(axis, 1)


def _apply_dims(dims, shape, mesh) -> P:
    spec = []
    for i, axis in enumerate(dims[: len(shape)]):
        if axis is not None and shape[i] % _axis_size(mesh, axis) == 0 and _axis_size(mesh, axis) > 1:
            spec.append(axis)
        else:
            spec.append(None)
    spec += [None] * (len(shape) - len(spec))
    return P(*spec)


def infer_param_spec(path: str, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Partition spec for one parameter, with divisibility fallback.

    ``scan_layers`` models stack block params under ``.../blocks/...`` with a
    leading num_layers dim. For those, ``fsdp`` moves to the LAYER dim: each
    device owns num_layers/fsdp whole layers, and XLA keeps the weight
    all-gather INSIDE the scan body (one layer per iteration = ZeRO-3 working
    set; verified in tests/test_scan_layers.py). Sharding the inner weight
    dims instead tempts XLA to hoist one big all-gather to the entry — full
    parameter residency, which is exactly what ZeRO-3 must avoid. ``model``
    (tensor-parallel) stays on its usual head/intermediate dims. When
    num_layers is not divisible by fsdp, falls back to inner-dim fsdp
    (memory still sharded at rest; gathers may hoist).
    """
    scanned = "blocks" in path.split("/")
    for pattern, dims in _RULES:
        if re.match(pattern, path):
            if dims == ("model", None) and _axis_size(mesh, "model") == 1:
                # wte on a pure-FSDP mesh: see the rule-table comment.
                dims = (None, "fsdp")
            if scanned:
                layer_dims = ("fsdp",) + tuple(
                    None if a == "fsdp" else a for a in dims
                )
                if shape[0] % _axis_size(mesh, "fsdp") == 0:
                    return _apply_dims(layer_dims, shape, mesh)
                dims = (None,) + tuple(dims)
            return _apply_dims(dims, shape, mesh)
    return P()  # replicate


def _flatten_path(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def make_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching ``params`` under the TP/FSDP rules."""

    def spec_for(key_path, leaf):
        path = _flatten_path(key_path)
        return NamedSharding(mesh, infer_param_spec(path, leaf.shape, mesh))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put parameters with their inferred shardings."""
    shardings = make_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
