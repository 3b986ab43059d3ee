"""Scaled stage-2 DPO residency: byte-level fit/infeasibility evidence
(round-4 VERDICT item 1).

The r4/r5 on-chip sweeps (results/scaled_sweep_r*.jsonl) show stage-2 DPO at
CLIP ViT-L/14 + GPT-2 Large OOMs on one v5e chip at every tried
(batch, seq, remat, drop_unused_tower) point. This probe explains WHY in
bytes, and demonstrates the 2-chip fit, three ways:

* ``--part bytes`` (host-only, instant): exact argument residency from
  ``jax.eval_shape`` — fp32 masters, Adam moments for the trainable
  partition only (``optax.multi_transform`` holds no state for frozen
  leaves), the bf16 frozen DPO reference, and the batch. No device, no
  allocation; these are the bytes XLA must park in HBM for the step's
  *arguments* alone, independent of compiler choices.
* ``--part tpu``: AOT-lowers the real stage-2 train step on the TPU backend
  from ShapeDtypeStructs (no buffers allocated) and reads the compiled
  executable's own ``memory_analysis()`` — exact argument + temp bytes the
  server-side compiler budgets, plus the device's ``bytes_limit``. If the
  compile itself RESOURCE_EXHAUSTs, the error is recorded as the witness.
* ``--part fsdp``: materializes the full-shape state on an N-virtual-device
  CPU mesh (default 2), sharded by the production GSPMD rules
  (``parallel/sharding.py``, the trainer's ``_shard_state_params`` path),
  compiles the same step, and reports per-device argument/temp bytes —
  the fsdp=2 fit the single-chip negative result points to. Argument bytes
  are backend-independent (sharded array sizes); temps are indicative.

Reference scale anchor: BASELINE config 4; reference stage-2 hot loop
/root/reference/src/.../training/trainer.py:546-652. Results land in
results/PROFILE_scaled.md; raw JSONL in results/s2_residency.jsonl.
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

GB = 2**30

ap = argparse.ArgumentParser()
ap.add_argument("--part", choices=("bytes", "tpu", "fsdp"), required=True)
ap.add_argument("--bs", type=int, default=8)
ap.add_argument("--seq", type=int, default=128)
ap.add_argument("--remat", action="store_true")
ap.add_argument("--drop-text-tower", action="store_true")
ap.add_argument("--fsdp", type=int, default=2, help="fsdp axis size (part fsdp)")
ap.add_argument("--out", default="/root/repo/results/s2_residency.jsonl")
args = ap.parse_args()

import os  # noqa: E402

if args.part in ("bytes", "fsdp"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    if args.part == "fsdp":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.fsdp}"
        )

import jax  # noqa: E402

if args.part in ("bytes", "fsdp"):
    # the axon TPU plugin ignores JAX_PLATFORMS; the config API is authoritative
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pgica_tpu.core.precision import cast_floating  # noqa: E402
from pgica_tpu.models.model import build_module  # noqa: E402
from pgica_tpu.training.optim import create_optimizer, freeze_labels  # noqa: E402
from pgica_tpu.training.train_step import (  # noqa: E402
    TrainState,
    make_stage2_train_step,
)

GPT2_VOCAB = 50262  # bench.py convention (GPT-2 vocab rounded to MXU lane tile)


def _emit(row):
    print(json.dumps(row), flush=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")


def _build(remat: bool, seq: int):
    return build_module(
        vision_model="openai/clip-vit-large-patch14",
        text_model="gpt2-large",
        projection_dim=512,
        temperature=0.5,
        vocab_size=GPT2_VOCAB,
        max_caption_length=seq,
        dtype=jnp.bfloat16,
        remat=remat,
        freeze_vision_backbone=True,
    )


def _param_shapes(module, seq: int):
    """Abstract param tree at scaled shapes — zero allocation."""
    img = jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32)
    ids = jax.ShapeDtypeStruct((1, seq), jnp.int32)

    def init(key, im, i, m):
        return module.init(key, im, i, m, mode="dual")["params"]

    return jax.eval_shape(init, jax.random.PRNGKey(0), img, ids, ids)


def _abstract_batch(bs: int, seq: int, sharding=None):
    def sds(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

    return {
        "image": sds((bs, 224, 224, 3), jnp.float32),
        "preferred_ids": sds((bs, seq), jnp.int32),
        "preferred_mask": sds((bs, seq), jnp.int32),
        "rejected_ids": sds((bs, seq), jnp.int32),
        "rejected_mask": sds((bs, seq), jnp.int32),
    }


def _nbytes(tree) -> int:
    return sum(
        x.size * jnp.dtype(x.dtype).itemsize for x in jax.tree.leaves(tree)
    )


def _stage2_trees(params, drop: bool):
    """(policy tree, frozen prefixes) under drop_unused_tower semantics."""
    if drop and "text_encoder" in params:
        params = {k: v for k, v in params.items() if k != "text_encoder"}
        frozen = ()
    else:
        frozen = (("text_encoder",),)
    return params, frozen


def part_bytes():
    module = _build(remat=False, seq=128)
    full = _param_shapes(module, 128)
    for drop in (False, True):
        params, frozen = _stage2_trees(full, drop)
        labels = freeze_labels(
            params, freeze_vision_backbone=True, freeze_text_backbone=False,
            frozen_prefixes=frozen,
        )
        flat_p = jax.tree.leaves(params)
        flat_l = jax.tree.leaves(labels)
        train_b = sum(
            p.size * 4 for p, lab in zip(flat_p, flat_l) if lab == "train"
        )
        p32 = _nbytes(params)  # all-float tree at fp32
        ref16 = p32 // 2  # cast_floating -> bf16 copy of the same tree
        adam = 2 * train_b  # m + v, trainable partition only (set_to_zero holds none)
        row = {
            "part": "bytes", "drop_text_tower": drop,
            "params_m": round(sum(p.size for p in flat_p) / 1e6, 1),
            "trainable_m": round(train_b / 4 / 1e6, 1),
            "fp32_params_gb": round(p32 / GB, 3),
            "adam_moments_gb": round(adam / GB, 3),
            "bf16_reference_gb": round(ref16 / GB, 3),
        }
        for bs, seq in ((2, 128), (8, 128), (4, 64), (16, 64)):
            bb = _nbytes(_abstract_batch(bs, seq))
            row[f"args_total_gb_bs{bs}_seq{seq}"] = round(
                (p32 + adam + ref16 + bb) / GB, 3
            )
        _emit(row)


def _make_step_and_abstract(module, params, frozen, bs, seq, sharding_fn=None):
    """jit-wrapped stage-2 step + fully abstract (state, ref, batch) inputs.

    ``sharding_fn(tree) -> sharding tree`` attaches NamedShardings (part
    fsdp); None leaves inputs unsharded (single device).
    """
    opt = create_optimizer(
        1e-5, total_steps=10_000, warmup_steps=500,
        params_for_freezing=params, freeze_vision_backbone=True,
        frozen_prefixes=frozen,
    )
    step = jax.jit(
        make_stage2_train_step(module, opt, beta=0.1, augment=True),
        donate_argnums=(0,),
    )
    state = jax.eval_shape(lambda p: TrainState.create(p, opt), params)
    ref = jax.eval_shape(
        lambda p: cast_floating(jax.tree.map(lambda x: x, p), jnp.bfloat16), params
    )
    return step, state, ref


def part_tpu():
    assert jax.default_backend() == "tpu", jax.default_backend()
    dev = jax.local_devices()[0]
    stats = dev.memory_stats() or {}
    module = _build(remat=args.remat, seq=args.seq)
    full = _param_shapes(module, args.seq)
    params, frozen = _stage2_trees(full, args.drop_text_tower)
    step, state, ref = _make_step_and_abstract(
        module, params, frozen, args.bs, args.seq
    )
    batch = _abstract_batch(args.bs, args.seq)
    row = {
        "part": "tpu", "bs": args.bs, "seq": args.seq, "remat": args.remat,
        "drop_text_tower": args.drop_text_tower,
        "hbm_bytes_limit_gb": round(stats.get("bytes_limit", 0) / GB, 2),
    }
    try:
        compiled = step.lower(state, ref, batch, jax.random.PRNGKey(0)).compile()
        mem = compiled.memory_analysis()
        row.update(
            mem_args_gb=round(mem.argument_size_in_bytes / GB, 3),
            mem_temp_gb=round(mem.temp_size_in_bytes / GB, 3),
            mem_out_gb=round(mem.output_size_in_bytes / GB, 3),
            # XLA's own alias accounting: with donation compiled in,
            # alias_size == output_size (the new state aliases the donated
            # one) and peak_memory is the executable's true HBM high-water
            # mark — the number the round-5 fit verdict rests on.
            mem_alias_gb=round(
                getattr(mem, "alias_size_in_bytes", 0) / GB, 3
            ),
            mem_peak_gb=round(
                getattr(mem, "peak_memory_in_bytes", 0) / GB, 3
            ),
            compiles=True,
        )
    except Exception as e:  # server-side compile OOM is itself the witness
        msg = str(e)
        row["compiles"] = False
        row["compile_error"] = msg.splitlines()[0][:300] if msg else repr(e)[:300]
    _emit(row)


def part_fsdp():
    assert jax.device_count() == args.fsdp, jax.devices()
    from pgica_tpu.parallel.mesh import MeshContext
    from pgica_tpu.parallel.sharding import make_param_shardings

    mesh_ctx = MeshContext(fsdp=args.fsdp, devices=jax.devices())
    mesh = mesh_ctx.mesh
    module = _build(remat=args.remat, seq=args.seq)
    full = _param_shapes(module, args.seq)
    params_sds, frozen = _stage2_trees(full, args.drop_text_tower)

    # Materialize at true shapes on host (125 GB RAM; ~25 GB used), sharded
    # by the production rules — exactly the trainer's GSPMD stage-2 layout
    # (_shard_state_params -> TrainState.create -> deep-copied bf16 ref).
    shardings = make_param_shardings(params_sds, mesh)

    def make_leaf(sds, sh):
        return jax.device_put(jnp.zeros(sds.shape, sds.dtype), sh)

    params = jax.tree.map(make_leaf, params_sds, shardings)
    opt = create_optimizer(
        1e-5, total_steps=10_000, warmup_steps=500,
        params_for_freezing=params, freeze_vision_backbone=True,
        frozen_prefixes=frozen,
    )
    with mesh:
        state = jax.jit(lambda p: TrainState.create(p, opt))(params)
        ref = jax.jit(lambda p: cast_floating(p, jnp.bfloat16))(params)
        del params
        step = jax.jit(
            make_stage2_train_step(module, opt, beta=0.1, augment=True),
            donate_argnums=(0,),
        )
        batch = mesh_ctx.shard_batch({
            "image": np.zeros((args.bs, 224, 224, 3), np.float32),
            "preferred_ids": np.zeros((args.bs, args.seq), np.int32),
            "preferred_mask": np.ones((args.bs, args.seq), np.int32),
            "rejected_ids": np.zeros((args.bs, args.seq), np.int32),
            "rejected_mask": np.ones((args.bs, args.seq), np.int32),
        })
        compiled = step.lower(state, ref, batch, jax.random.PRNGKey(0)).compile()
    mem = compiled.memory_analysis()
    # SPMD memory analysis reports PER-DEVICE bytes.
    _emit({
        "part": "fsdp", "fsdp": args.fsdp, "bs": args.bs, "seq": args.seq,
        "remat": args.remat, "drop_text_tower": args.drop_text_tower,
        "backend": "cpu-virtual (argument bytes are backend-independent)",
        "args_gb_per_device": round(mem.argument_size_in_bytes / GB, 3),
        "temp_gb_per_device": round(mem.temp_size_in_bytes / GB, 3),
        "out_gb_per_device": round(mem.output_size_in_bytes / GB, 3),
    })


{"bytes": part_bytes, "tpu": part_tpu, "fsdp": part_fsdp}[args.part]()
