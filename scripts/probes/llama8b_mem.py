"""BASELINE config 5 (SigLIP-So400m + Llama-3-8B) at TRUE shapes
(round-4 VERDICT item 2).

`configs/siglip_llama8b.yaml` had only tiny-llama dryrun evidence; nothing
was ever compiled or memory-analyzed at the real 8B/128,256-vocab/512-seq
shapes. This probe produces that evidence on the 8-virtual-device CPU mesh
(fsdp=2 x model=4, the yaml's layout), two ways:

* ``--part mem8b`` — AOT memory analysis at FULL 8B shapes, zero
  allocation: abstract params from ``jax.eval_shape``, production GSPMD
  shardings (``parallel/sharding.py``) attached to every input
  ``ShapeDtypeStruct``, the real stage-1/stage-2 train step lowered and
  compiled, and the executable's own per-device argument/temp bytes read
  back. Argument bytes are backend-independent (sharded array sizes);
  CPU-compiled temps are indicative. Reported against the v5e 16 GB/chip
  budget in docs/SCALING.md.
* ``--part step1b`` — a mid-scale (~1.4B-param) llama on the SAME mesh,
  ACTUALLY MATERIALIZED and stepped once (stage 2 DPO: policy fwd+bwd +
  frozen bf16 reference, vocab-parallel fused CE), loss asserted finite —
  the stepping upgrade of the dryrun's tiny-llama sections.

Reference scale anchor: /root/reference/README.md:141-142 (the reference
tops out at gpt2-medium; config 5 is the framework's growth target).
Raw JSONL: results/llama8b_mem.jsonl; prose: results/PROFILE_llama.md.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

GB = 2**30

ap = argparse.ArgumentParser()
ap.add_argument("--part", choices=("mem8b", "step1b"), required=True)
ap.add_argument("--stage", type=int, default=2, choices=(1, 2))
ap.add_argument("--bs", type=int, default=None,
                help="default: the yaml's stage batch (4 stage 1, 2 stage 2)")
ap.add_argument("--seq", type=int, default=512)
ap.add_argument("--fsdp", type=int, default=2)
ap.add_argument("--model", type=int, default=4)
ap.add_argument("--keep-text-tower", action="store_true",
                help="stage 2: keep the frozen, never-executed text tower "
                     "(default drops it, = training.stage2.drop_unused_tower)")
ap.add_argument("--out", default="/root/repo/results/llama8b_mem.jsonl")
args = ap.parse_args()

N_DEV = args.fsdp * args.model
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV}"
    # step1b runs ~1B-scale per-device programs serially on this 1-core
    # host: virtual-device threads reach each collective minutes apart, and
    # XLA:CPU's default 40 s rendezvous watchdog aborts the process (seen:
    # AllGather "Termination timeout ... exceeded"). Not a deadlock — raise
    # the watchdog for the analysis run.
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
    + " --xla_cpu_collective_timeout_seconds=7200"
)

import jax  # noqa: E402

# the axon TPU plugin ignores JAX_PLATFORMS; the config API is authoritative
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pgica_tpu.core.precision import cast_floating  # noqa: E402
from pgica_tpu.models import presets  # noqa: E402
from pgica_tpu.models.model import build_module  # noqa: E402
from pgica_tpu.parallel.mesh import MeshContext  # noqa: E402
from pgica_tpu.parallel.sharding import make_param_shardings, shard_params  # noqa: E402
from pgica_tpu.training.optim import create_optimizer  # noqa: E402
from pgica_tpu.training.train_step import (  # noqa: E402
    TrainState,
    make_stage1_train_step,
    make_stage2_train_step,
)

VOCAB = 128256  # Llama-3 tokenizer (configs/siglip_llama8b.yaml model.vocab_size)
IMAGE = 384     # SigLIP-So400m-patch14-384
BS = args.bs if args.bs is not None else (4 if args.stage == 1 else 2)


def _emit(row):
    print(json.dumps(row), flush=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")


def _build(text_model: str):
    # remat + scan_layers: the only sane layout at 8B (ZeRO-3 per-layer
    # gather; one compiled block body). attn_impl stays "auto" — on the CPU
    # analysis backend that is XLA attention; on TPU the d=128 heads
    # dispatch to the Pallas flash kernel (ops/attention.py crossover).
    return build_module(
        vision_model="google/siglip-so400m-patch14-384",
        text_model=text_model,
        projection_dim=512,
        temperature=0.5,
        vocab_size=VOCAB,
        max_caption_length=args.seq,
        dtype=jnp.bfloat16,
        remat=True,
        scan_layers=True,
        freeze_vision_backbone=True,
    )


def _abstract_params(module):
    img = jax.ShapeDtypeStruct((1, IMAGE, IMAGE, 3), jnp.float32)
    ids = jax.ShapeDtypeStruct((1, args.seq), jnp.int32)

    def init(key, im, i, m):
        return module.init(key, im, i, m, mode="dual")["params"]

    return jax.eval_shape(init, jax.random.PRNGKey(0), img, ids, ids)


def _drop_tower(params):
    if args.stage == 2 and not args.keep_text_tower and "text_encoder" in params:
        return {k: v for k, v in params.items() if k != "text_encoder"}, ()
    return params, (("text_encoder",),) if args.stage == 2 else (("caption_decoder",),)


def _make_opt(params, frozen):
    lr = 5e-5 if args.stage == 1 else 1e-5
    return create_optimizer(
        lr, total_steps=10_000, warmup_steps=500,
        params_for_freezing=params, freeze_vision_backbone=True,
        frozen_prefixes=frozen,
    )


def _batch_sds(mesh_ctx, bs):
    sh = mesh_ctx.batch_sharding

    def sds(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)

    if args.stage == 1:
        return {
            "image": sds((bs, IMAGE, IMAGE, 3), jnp.float32),
            "caption_ids": sds((bs, args.seq), jnp.int32),
            "caption_mask": sds((bs, args.seq), jnp.int32),
        }
    return {
        "image": sds((bs, IMAGE, IMAGE, 3), jnp.float32),
        "preferred_ids": sds((bs, args.seq), jnp.int32),
        "preferred_mask": sds((bs, args.seq), jnp.int32),
        "rejected_ids": sds((bs, args.seq), jnp.int32),
        "rejected_mask": sds((bs, args.seq), jnp.int32),
    }


def part_mem8b():
    assert jax.device_count() == N_DEV, jax.devices()
    mesh_ctx = MeshContext(data=-1, fsdp=args.fsdp, model=args.model,
                           devices=jax.devices())
    mesh = mesh_ctx.mesh
    module = _build("meta-llama/Meta-Llama-3-8B")
    full = _abstract_params(module)
    params_sds, frozen = _drop_tower(full)
    param_sh = make_param_shardings(params_sds, mesh)
    opt = _make_opt(params_sds, frozen)

    # Abstract TrainState (params + Adam moments + schedule counters) with
    # the production shardings attached. eval_shape does not propagate
    # shardings, so leaves are re-mapped by (shape, dtype): the moments
    # mirror trainable param shapes exactly; anything unmatched (counters,
    # scalars) replicates — which is also what the trainer does.
    by_shape = {}
    for leaf, sh in zip(jax.tree.leaves(params_sds), jax.tree.leaves(param_sh)):
        by_shape.setdefault((leaf.shape, str(leaf.dtype)), sh)
    rep = mesh_ctx.replicated

    def reshard(leaf):
        sh = by_shape.get((leaf.shape, str(leaf.dtype)), rep)
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=sh)

    state_sds = jax.tree.map(
        reshard, jax.eval_shape(lambda p: TrainState.create(p, opt), params_sds)
    )
    batch = _batch_sds(mesh_ctx, BS)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)

    if args.stage == 1:
        step = make_stage1_train_step(module, opt, temperature=0.5, augment=True)
        lower_args = (state_sds, batch, key)
    else:
        step = make_stage2_train_step(module, opt, beta=0.1, augment=True, mesh=mesh)
        ref_sds = jax.tree.map(
            reshard,
            jax.eval_shape(lambda p: cast_floating(p, jnp.bfloat16), params_sds),
        )
        # bf16 ref leaves don't shape+dtype-match the f32 params table; use
        # the param shardings tree directly (same tree structure).
        ref_sds = jax.tree.map(
            lambda l, sh: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=sh),
            ref_sds, param_sh,
        )
        lower_args = (state_sds, ref_sds, batch, key)

    n_params = sum(x.size for x in jax.tree.leaves(params_sds))
    row = {
        "part": "mem8b", "stage": args.stage, "bs": BS, "seq": args.seq,
        "fsdp": args.fsdp, "model": args.model,
        "drop_text_tower": args.stage == 2 and not args.keep_text_tower,
        "params_b": round(n_params / 1e9, 3), "vocab": VOCAB, "image": IMAGE,
        "backend": "cpu-virtual AOT (argument bytes are backend-independent)",
    }
    t0 = time.perf_counter()
    with mesh:
        compiled = jax.jit(step, donate_argnums=(0,)).lower(*lower_args).compile()
    mem = compiled.memory_analysis()
    row.update(
        compile_s=round(time.perf_counter() - t0, 1),
        # SPMD memory analysis reports PER-DEVICE bytes
        args_gb_per_device=round(mem.argument_size_in_bytes / GB, 3),
        temp_gb_per_device=round(mem.temp_size_in_bytes / GB, 3),
        out_gb_per_device=round(mem.output_size_in_bytes / GB, 3),
    )
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        row["tflop_per_step"] = round(float(ca.get("flops", 0.0)) / 1e12, 2)
    except Exception:
        pass
    _emit(row)


def part_step1b():
    assert jax.device_count() == N_DEV, jax.devices()
    # Mid-scale llama: same arch family (RoPE/RMSNorm/SwiGLU/GQA, untied
    # head handled by the preset machinery), ~1/6 the 8B's compute.
    presets.TEXT_PRESETS["llama-1b-probe"] = presets.LMConfig(
        hidden_size=2048, num_layers=16, num_heads=16, num_kv_heads=8,
        max_position_embeddings=8192, mlp_ratio=3.5, arch="llama",
        norm_eps=1e-5,
    )
    mesh_ctx = MeshContext(data=-1, fsdp=args.fsdp, model=args.model,
                           devices=jax.devices())
    mesh = mesh_ctx.mesh
    module = _build("llama-1b-probe")
    rng = np.random.default_rng(0)
    images = rng.normal(size=(BS, IMAGE, IMAGE, 3)).astype(np.float32)
    ids = rng.integers(0, VOCAB, (BS, args.seq)).astype(np.int32)
    mask = np.ones((BS, args.seq), np.int32)

    t0 = time.perf_counter()
    params = module.init(
        jax.random.PRNGKey(0), jnp.asarray(images[:1]), jnp.asarray(ids[:1]),
        jnp.asarray(mask[:1]), mode="dual",
    )["params"]
    params, frozen = _drop_tower(params)
    params = shard_params(params, mesh)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    opt = _make_opt(params, frozen)
    with mesh:
        state = jax.jit(lambda p: TrainState.create(p, opt))(params)
        if args.stage == 2:
            ref = jax.jit(lambda p: cast_floating(p, jnp.bfloat16))(params)
        del params
        batch = mesh_ctx.shard_batch(
            {"image": images, "caption_ids": ids, "caption_mask": mask}
            if args.stage == 1 else
            {"image": images, "preferred_ids": ids, "preferred_mask": mask,
             "rejected_ids": ids, "rejected_mask": mask}
        )
        if args.stage == 1:
            step = jax.jit(
                make_stage1_train_step(module, opt, temperature=0.5, augment=True),
                donate_argnums=(0,),
            )
            run = lambda s, k: step(s, batch, k)  # noqa: E731
        else:
            step = jax.jit(
                make_stage2_train_step(module, opt, beta=0.1, augment=True, mesh=mesh),
                donate_argnums=(0,),
            )
            run = lambda s, k: step(s, ref, batch, k)  # noqa: E731
        setup_s = time.perf_counter() - t0
        t1 = time.perf_counter()
        state, metrics = run(state, jax.random.PRNGKey(1))
        loss = float(metrics["loss"])
        first_step_s = time.perf_counter() - t1
        t2 = time.perf_counter()
        state, metrics = run(state, jax.random.PRNGKey(2))
        loss2 = float(metrics["loss"])
        warm_step_s = time.perf_counter() - t2
    assert np.isfinite(loss) and np.isfinite(loss2), (loss, loss2)
    _emit({
        "part": "step1b", "stage": args.stage, "bs": BS, "seq": args.seq,
        "fsdp": args.fsdp, "model": args.model, "vocab": VOCAB, "image": IMAGE,
        "params_b": round(n_params / 1e9, 3),
        "drop_text_tower": args.stage == 2 and not args.keep_text_tower,
        "backend": f"cpu-virtual ({N_DEV} host devices, REAL materialized step)",
        "setup_s": round(setup_s, 1),
        "first_step_s (incl compile)": round(first_step_s, 1),
        "warm_step_s": round(warm_step_s, 1),
        "loss_step1": round(loss, 4), "loss_step2": round(loss2, 4),
    })


{"mem8b": part_mem8b, "step1b": part_step1b}[args.part]()
