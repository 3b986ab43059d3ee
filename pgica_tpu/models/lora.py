"""Functional LoRA adapters (reference C8/C9: peft LoRA r=16 alpha=32 on
c_attn/c_proj, model.py:352-394, 543-559).

JAX-idiomatic design: LoRA factors live in a *separate* pytree; the adapted
weights are materialized inside the jitted step as
``W_eff = W + (alpha/r) * A @ B`` — a cheap rank-r outer product that XLA
fuses into the surrounding graph. The base params stay frozen by simply not
differentiating w.r.t. them, so no optimizer masking is needed:

    lora = init_lora(params, rng, rank=16, targets=("q_proj", "v_proj"))
    def loss_fn(lora):
        merged = apply_lora(params, lora, alpha=32.0)
        return model.apply({'params': merged}, ...)

Target selection is by path regex, mirroring peft's ``target_modules``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = ("q_proj", "v_proj")  # peft's c_attn ~ our fused q/k/v split

# Reference scope: peft wraps the text encoder (model.py:352-394) and caption
# decoder (model.py:543-559), never the vision tower. Restricting by path
# prefix matters because our ViT blocks use the same q_proj/out_proj naming.
DEFAULT_SCOPE = ("text_encoder/backbone", "caption_decoder/lm", "shared_lm")


def _flatten(key_path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)


def _is_target(path: str, targets: Sequence[str], scope: Sequence[str]) -> bool:
    if scope and not any(path.startswith(s) for s in scope):
        return False
    return path.endswith("/kernel") and any(
        re.search(rf"(^|/){re.escape(t)}/kernel$", path) for t in targets
    )


def init_lora(
    params: Any,
    rng: jax.Array,
    rank: int = 16,
    targets: Sequence[str] = DEFAULT_TARGETS,
    scope: Sequence[str] = DEFAULT_SCOPE,
) -> Dict[str, Tuple[jax.Array, jax.Array]]:
    """Create {path: (A, B)} factors for every targeted kernel.

    A ~ N(0, 1/rank) with shape (fan_in, rank); B zeros with shape
    (rank, fan_out_flat) — standard LoRA init so the adapter starts as a
    no-op. ``scope`` limits adaptation to the text towers (reference
    semantics; see DEFAULT_SCOPE).
    """
    factors: Dict[str, Tuple[jax.Array, jax.Array]] = {}
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    for key_path, leaf in leaves:
        path = _flatten(key_path)
        if not _is_target(path, targets, scope):
            continue
        fan_in = leaf.shape[0]
        fan_out = int(np.prod(leaf.shape[1:]))
        rng, sub = jax.random.split(rng)
        a = jax.random.normal(sub, (fan_in, rank), jnp.float32) / jnp.sqrt(rank)
        b = jnp.zeros((rank, fan_out), jnp.float32)
        factors[path] = (a, b)
    return factors


def apply_lora(
    params: Any,
    lora: Dict[str, Tuple[jax.Array, jax.Array]],
    alpha: float = 32.0,
    rank: int = 16,
    dropout: float = 0.0,
    rng: jax.Array | None = None,
) -> Any:
    """Return params with LoRA deltas merged (pure; used inside jit).

    ``dropout`` + ``rng`` enable the training-time regularizer matching peft's
    ``lora_dropout`` (reference model.py:352-394 via peft's
    ``nn.Dropout(p)(x) @ A @ B``): input features of the adapter path are
    dropped by zeroing rows of A (inverted scaling by 1/keep). Because the
    merge happens once per step, the mask is shared across batch positions —
    DropConnect on the adapter's input rows, resampled every step — whereas
    peft resamples per token. Expectation and the "drop adapter inputs"
    semantics match; only the sampling granularity differs. Pass ``rng=None``
    (eval) to disable, like torch ``.eval()``.
    """
    if not lora:
        return params
    scale = alpha / rank
    masks = {}
    if dropout > 0.0 and rng is not None:
        keep = 1.0 - dropout
        for i, path in enumerate(sorted(lora)):
            fan_in = lora[path][0].shape[0]
            bern = jax.random.bernoulli(jax.random.fold_in(rng, i), keep, (fan_in, 1))
            masks[path] = bern.astype(jnp.float32) / keep

    def merge(key_path, leaf):
        path = _flatten(key_path)
        if path in lora:
            a, b = lora[path]
            if path in masks:
                a = a * masks[path]
            delta = (a @ b).reshape(leaf.shape) * scale
            return leaf + delta.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)


def count_lora_params(lora: Dict[str, Tuple[jax.Array, jax.Array]]) -> int:
    return sum(int(np.prod(a.shape)) + int(np.prod(b.shape)) for a, b in lora.values())


# -- checkpoint (de)serialization ------------------------------------------------

_SEP = "--"  # path separator safe for checkpoint key names ("/" nests in orbax)


def lora_to_tree(lora: Dict[str, Tuple[jax.Array, jax.Array]]) -> Dict[str, Dict[str, jax.Array]]:
    """Factors dict -> checkpoint-safe nested pytree."""
    return {p.replace("/", _SEP): {"a": a, "b": b} for p, (a, b) in lora.items()}


def lora_from_tree(tree: Dict[str, Dict[str, Any]]) -> Dict[str, Tuple[jax.Array, jax.Array]]:
    return {p.replace(_SEP, "/"): (v["a"], v["b"]) for p, v in tree.items()}


# -- peft-name translation -------------------------------------------------------

# peft targets GPT-2's fused Conv1D module names (reference default.yaml:24-29);
# this framework splits them into per-projection kernels.
PEFT_NAME_MAP = {
    "c_attn": ("q_proj", "k_proj", "v_proj"),
    "c_proj": ("out_proj", "fc_out"),
    "c_fc": ("fc_in",),
}


def normalize_lora_config(raw: Any) -> Any:
    """``model.lora_config`` (peft schema: r/lora_alpha/target_modules/
    lora_dropout, reference configs/default.yaml:24-29) -> internal dict
    {rank, alpha, targets, dropout}. Returns None when LoRA is disabled.

    ``lora_dropout`` maps to the adapter-input DropConnect implemented in
    :func:`apply_lora` (active in train steps only; see its docstring for the
    per-step-vs-per-token sampling deviation from peft).
    """
    if not raw:
        return None
    targets = []
    for t in raw.get("target_modules", ["c_attn"]):
        targets.extend(PEFT_NAME_MAP.get(t, (t,)))
    return {
        "rank": int(raw.get("r", raw.get("rank", 16))),
        "alpha": float(raw.get("lora_alpha", raw.get("alpha", 32))),
        "targets": tuple(dict.fromkeys(targets)),
        "dropout": float(raw.get("lora_dropout", raw.get("dropout", 0.0))),
    }
