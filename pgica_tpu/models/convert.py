"""HF-torch -> pgica_tpu weight converters.

Imports pretrained (or randomly-initialized, for parity testing) Hugging Face
checkpoints into this framework's Flax parameter trees:

* :func:`convert_gpt2` — ``GPT2Model``/``GPT2LMHeadModel`` state dict ->
  :class:`~pgica_tpu.models.lm.TransformerLM` params. Handles GPT-2's Conv1D
  layout (weights stored (in, out) — NOT transposed like nn.Linear) and the
  fused c_attn qkv projection.
* :func:`convert_clip_vision` — ``CLIPVisionModel`` state dict ->
  :class:`~pgica_tpu.models.vit.VisionTransformer` params. Handles torch's
  OIHW conv layout -> flax HWIO and the class/position embeddings.
* :func:`convert_llama` — ``LlamaModel`` state dict -> TransformerLM (llama
  arch) params, for the scaled decoder config.

These make output-fidelity parity against the PyTorch reference testable:
tests/test_convert.py builds HF models from configs (offline, random init),
converts, and asserts logits/hidden-state agreement to float tolerance.
NOTE on RoPE: HF Llama applies rotary embeddings in "split-half" layout
(x[..., :d/2], x[..., d/2:]) while this framework uses interleaved pairs;
conversion permutes q/k projection rows so outputs match exactly.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pgica_tpu.models.presets import LMConfig, ViTConfig


def stack_scan_params(backbone: Dict) -> Dict:
    """Unrolled ``block_0..block_{L-1}`` TransformerLM params -> the stacked
    ``blocks`` layout used by ``LMConfig.scan_layers`` (leading num_layers dim
    on every block leaf; lax.scan slices one layer per iteration).

    Non-block leaves (wte/wpe/ln_f) pass through unchanged. Use after
    :func:`convert_gpt2`/:func:`convert_llama` when the target module scans.
    """
    import jax

    names = sorted(
        (k for k in backbone if k.startswith("block_")), key=lambda s: int(s.split("_")[1])
    )
    if not names:
        raise ValueError("no block_i entries to stack")
    out = {k: v for k, v in backbone.items() if not k.startswith("block_")}
    out["blocks"] = jax.tree.map(lambda *xs: np.stack(xs), *(backbone[k] for k in names))
    return out


def unstack_scan_params(backbone: Dict) -> Dict:
    """Inverse of :func:`stack_scan_params`: stacked ``blocks`` -> block_i."""
    import jax

    if "blocks" not in backbone:
        raise ValueError("no stacked 'blocks' entry to unstack")
    out = {k: v for k, v in backbone.items() if k != "blocks"}
    stacked = backbone["blocks"]
    n = np.shape(jax.tree.leaves(stacked)[0])[0]
    for i in range(n):
        out[f"block_{i}"] = jax.tree.map(lambda x, i=i: np.asarray(x[i]), stacked)
    return out


def pad_vocab_rows(converted: Dict, module_params: Dict, name: str = "lm") -> Dict:
    """Pad converted ``wte`` rows up to the module's vocabulary size.

    HF GPT-2 artifacts carry 50,257 embedding rows, but the module's tokenizer
    appends special tokens ([PAD]/[UNK]/[BOS]/[EOS]/[SEP] — data/tokenizer.py)
    so the module vocab is a few ids larger. Installing the unpadded matrix
    would silently clamp those ids to the last HF row in JAX gather and
    mismatch the weight-tied logits width. The appended rows keep the module's
    initialization (the reference resizes embeddings the same way —
    reference model.py:315-324 ``resize_token_embeddings``).
    """
    wte = converted.get("wte", {}).get("embedding")
    target = module_params.get("wte", {}).get("embedding")
    if wte is None or target is None:
        return converted
    have, want = wte.shape[0], target.shape[0]
    if have > want:
        raise ValueError(
            f"{name}: converted vocab {have} exceeds module vocab {want}; "
            "rebuild the module with the checkpoint's tokenizer"
        )
    if have < want:
        converted = dict(converted)
        converted["wte"] = {
            "embedding": np.concatenate([np.asarray(wte), np.asarray(target[have:])], axis=0)
        }
    return converted


def assert_tree_shapes(converted: Dict, module_params: Dict, name: str = "") -> None:
    """Raise if any converted leaf's shape disagrees with the module's params."""
    import jax

    flat_new = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    flat_old = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_flatten_with_path(module_params)[0]}
    missing = sorted(set(flat_old) - set(flat_new))
    extra = sorted(set(flat_new) - set(flat_old))
    if missing or extra:
        raise ValueError(f"{name}: converted param tree mismatch (missing={missing[:5]} extra={extra[:5]})")
    for key, leaf in flat_new.items():
        want = tuple(flat_old[key].shape)
        have = tuple(np.shape(leaf))
        if have != want:
            raise ValueError(f"{name}{key}: converted shape {have} != module shape {want}")


def _np(tensor) -> np.ndarray:
    try:
        return tensor.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(tensor)


def _ln(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def convert_gpt2(state_dict: Dict, config: LMConfig) -> Dict:
    """GPT-2 (Conv1D layout) -> TransformerLM params."""
    sd = {k.removeprefix("transformer."): v for k, v in state_dict.items()}
    h, n_head = config.hidden_size, config.num_heads
    d = h // n_head
    params: Dict = {
        "wte": {"embedding": _np(sd["wte.weight"])},
        "wpe": {"embedding": _np(sd["wpe.weight"])},
        "ln_f": _ln(sd, "ln_f"),
    }
    for i in range(config.num_layers):
        p = f"h.{i}"
        # Conv1D stores (in, out): c_attn (h, 3h) -> split to q/k/v (h, h)
        c_attn_w = _np(sd[f"{p}.attn.c_attn.weight"])
        c_attn_b = _np(sd[f"{p}.attn.c_attn.bias"])
        qw, kw, vw = np.split(c_attn_w, 3, axis=1)
        qb, kb, vb = np.split(c_attn_b, 3, axis=0)
        out_w = _np(sd[f"{p}.attn.c_proj.weight"])  # (h, h), (in, out)
        params[f"block_{i}"] = {
            "LayerNorm_0": _ln(sd, f"{p}.ln_1"),
            "LayerNorm_1": _ln(sd, f"{p}.ln_2"),
            "attn": {
                "q_proj": {"kernel": qw.reshape(h, n_head, d), "bias": qb.reshape(n_head, d)},
                "k_proj": {"kernel": kw.reshape(h, n_head, d), "bias": kb.reshape(n_head, d)},
                "v_proj": {"kernel": vw.reshape(h, n_head, d), "bias": vb.reshape(n_head, d)},
                "out_proj": {
                    "kernel": out_w.reshape(n_head, d, h),
                    "bias": _np(sd[f"{p}.attn.c_proj.bias"]),
                },
            },
            "mlp": {
                "fc_in": {
                    "kernel": _np(sd[f"{p}.mlp.c_fc.weight"]),
                    "bias": _np(sd[f"{p}.mlp.c_fc.bias"]),
                },
                "fc_out": {
                    "kernel": _np(sd[f"{p}.mlp.c_proj.weight"]),
                    "bias": _np(sd[f"{p}.mlp.c_proj.bias"]),
                },
            },
        }
    return params


def convert_clip_vision(state_dict: Dict, config: ViTConfig) -> Dict:
    """CLIPVisionModel -> VisionTransformer params."""
    sd = {k.removeprefix("vision_model."): v for k, v in state_dict.items()}
    h, n_head = config.hidden_size, config.num_heads
    d = h // n_head

    def linear(prefix: str, out_shape=None, in_heads=False):
        w = _np(sd[f"{prefix}.weight"]).T  # torch Linear (out,in) -> (in,out)
        b = _np(sd[f"{prefix}.bias"])
        if out_shape == "qkv":  # (h, h) -> (h, heads, d)
            return {"kernel": w.reshape(h, n_head, d), "bias": b.reshape(n_head, d)}
        if out_shape == "out":  # (h, h) with heads on input side -> (heads, d, h)
            return {"kernel": w.reshape(n_head, d, h), "bias": b}
        return {"kernel": w, "bias": b}

    params: Dict = {
        "cls_token": _np(sd["embeddings.class_embedding"]).reshape(1, 1, h),
        "pos_embed": _np(sd["embeddings.position_embedding.weight"])[None],
        "patch_embed": {
            # torch conv OIHW -> flax HWIO
            "kernel": _np(sd["embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
        },
        "pre_ln": _ln(sd, "pre_layrnorm"),  # (sic) HF attribute name
        "post_ln": _ln(sd, "post_layernorm"),
    }
    for i in range(config.num_layers):
        p = f"encoder.layers.{i}"
        params[f"block_{i}"] = {
            "LayerNorm_0": _ln(sd, f"{p}.layer_norm1"),
            "LayerNorm_1": _ln(sd, f"{p}.layer_norm2"),
            "attn": {
                "q_proj": linear(f"{p}.self_attn.q_proj", "qkv"),
                "k_proj": linear(f"{p}.self_attn.k_proj", "qkv"),
                "v_proj": linear(f"{p}.self_attn.v_proj", "qkv"),
                "out_proj": linear(f"{p}.self_attn.out_proj", "out"),
            },
            "mlp": {
                "fc_in": linear(f"{p}.mlp.fc1"),
                "fc_out": linear(f"{p}.mlp.fc2"),
            },
        }
    return params


def convert_linear(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    """torch ``nn.Linear`` -> flax Dense: (out, in) weight transposed."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    bias = sd.get(f"{prefix}.bias")
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def convert_projection_head(sd: Dict, prefix: str = "") -> Dict:
    """Reference 2-layer projection head -> :class:`ProjectionHead` params.

    torch layout (reference model.py:136-142, 338-344): ``nn.Sequential`` of
    Linear(0)-ReLU-Dropout-Linear(3)-LayerNorm(4); flax names fc1/fc2/ln.
    """
    p = f"{prefix}." if prefix else ""
    return {
        "fc1": convert_linear(sd, f"{p}0"),
        "fc2": convert_linear(sd, f"{p}3"),
        "ln": _ln(sd, f"{p}4"),
    }


def convert_mha(sd: Dict, prefix: str, num_heads: int) -> Dict:
    """torch ``nn.MultiheadAttention`` (packed in_proj) -> our MultiHeadAttention.

    Used for the decoder's vision-text cross-attention (reference
    model.py:528-533). torch packs q/k/v as in_proj_weight (3h, h) with the
    embedding dim split head-major (head i owns dims [i*d, (i+1)*d)) — the
    same layout our DenseGeneral reshape (h, heads, d) produces.
    """
    p = f"{prefix}." if prefix else ""
    w = _np(sd[f"{p}in_proj_weight"])  # (3h, h)
    b = _np(sd[f"{p}in_proj_bias"])
    h = w.shape[1]
    d = h // num_heads
    qw, kw, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)

    def proj(wi, bi):
        return {"kernel": wi.T.reshape(h, num_heads, d), "bias": bi.reshape(num_heads, d)}

    return {
        "q_proj": proj(qw, qb),
        "k_proj": proj(kw, kb),
        "v_proj": proj(vw, vb),
        "out_proj": {
            "kernel": _np(sd[f"{p}out_proj.weight"]).T.reshape(num_heads, d, h),
            "bias": _np(sd[f"{p}out_proj.bias"]),
        },
    }


def _rope_permute(w: np.ndarray, n_head: int, d: int) -> np.ndarray:
    """HF split-half RoPE layout -> interleaved-pair layout.

    HF rotates (x[:d/2], x[d/2:]); we rotate (x[0::2], x[1::2]). Reordering
    each head's output rows as [0, d/2, 1, d/2+1, ...] makes the two exactly
    equivalent.
    """
    w = w.reshape(n_head, d, -1)
    perm = np.empty((d,), np.int64)
    perm[0::2] = np.arange(d // 2)
    perm[1::2] = np.arange(d // 2) + d // 2
    return w[:, perm, :].reshape(n_head * d, -1)


def convert_llama(state_dict: Dict, config: LMConfig) -> Dict:
    """Llama (RoPE/RMSNorm/SwiGLU/GQA) -> TransformerLM(arch='llama') params."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    h = config.hidden_size
    n_head, n_kv = config.num_heads, config.kv_heads
    d = config.head_dim

    params: Dict = {
        "wte": {"embedding": _np(sd["embed_tokens.weight"])},
        "ln_f": {"scale": _np(sd["norm.weight"])},
    }
    for i in range(config.num_layers):
        p = f"layers.{i}"

        def proj(name: str, heads: int, rope: bool):
            w = _np(sd[f"{p}.self_attn.{name}.weight"])  # (heads*d, h)
            if rope:
                w = _rope_permute(w, heads, d)
            return {"kernel": w.T.reshape(h, heads, d)}

        params[f"block_{i}"] = {
            "RMSNorm_0": {"scale": _np(sd[f"{p}.input_layernorm.weight"])},
            "RMSNorm_1": {"scale": _np(sd[f"{p}.post_attention_layernorm.weight"])},
            "attn": {
                "q_proj": proj("q_proj", n_head, rope=True),
                "k_proj": proj("k_proj", n_kv, rope=True),
                "v_proj": proj("v_proj", n_kv, rope=False),
                "out_proj": {
                    "kernel": _np(sd[f"{p}.self_attn.o_proj.weight"]).T.reshape(n_head, d, h)
                },
            },
            "mlp": {
                "gate_proj": {"kernel": _np(sd[f"{p}.mlp.gate_proj.weight"]).T},
                "up_proj": {"kernel": _np(sd[f"{p}.mlp.up_proj.weight"]).T},
                "down_proj": {"kernel": _np(sd[f"{p}.mlp.down_proj.weight"]).T},
            },
        }
    return params
