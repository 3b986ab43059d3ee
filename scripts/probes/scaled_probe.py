"""Scaled-config on-chip probe (BASELINE configs 4-5; VERDICT r3 item 2).

Compiles and steps `configs/scaled_vitl_gpt2large.yaml` shapes — CLIP
ViT-L/14 (frozen) + GPT-2 Large policy towers at the true 50,262-token
vocabulary — single-chip at random init, and records fit/OOM boundary,
ms/step, pairs/s/chip, FLOP count (compiled cost analysis) and MFU vs the
v5e bf16 peak (197 TFLOP/s). One (stage, batch, remat) point per process
invocation so a TPU OOM cannot poison later points; `--sweep` forks the grid.

Reference scale target: /root/reference/README.md:141-142 (867M params at
gpt2-medium); this config is the next rung up (~1.9B total / ~0.9B trainable
per stage). Results land in results/PROFILE_scaled.md.
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

V5E_BF16_PEAK = 197e12

ap = argparse.ArgumentParser()
ap.add_argument("--stage", type=int, default=1, choices=(1, 2))
ap.add_argument("--bs", type=int, default=16)
ap.add_argument("--remat", action="store_true")
ap.add_argument("--seq", type=int, default=128,
                help="caption width; 64 = the trainer's length-bucketing shape "
                     "for realistic 8-28-token captions with headroom")
ap.add_argument("--drop-text-tower", action="store_true",
                help="stage 2 only: remove the frozen, never-executed text "
                     "encoder from the policy state AND the frozen reference "
                     "(generation mode never looks its params up). Mirrors "
                     "training.stage2.drop_unused_tower.")
ap.add_argument("--steps", type=int, default=8)
ap.add_argument("--warmup", type=int, default=2)
ap.add_argument("--sweep", choices=("r4", "stage2fit", "fit5"), default=None,
                help="fork a named grid; every point appends to --out")
# Raw data lands in results/ DIRECTLY (round-4 verdict weak #1: probe JSONLs
# written to outputs/ were never committed and the MD tables diverged).
ap.add_argument("--out", default="/root/repo/results/scaled_sweep.jsonl")
args = ap.parse_args()

GRIDS = {
    # the round-4 grid: (stage, bs, remat, seq, drop)
    "r4": [
        (1, 8, False, 128, False), (1, 16, False, 128, False),
        (1, 32, False, 128, False), (1, 48, False, 128, False),
        (1, 32, True, 128, False), (1, 48, True, 128, False), (1, 64, True, 128, False),
        (2, 4, False, 128, False), (2, 8, False, 128, False), (2, 16, False, 128, False),
        (2, 8, True, 128, False), (2, 16, True, 128, False),
    ],
    # round-5 stage-2 fit hunt (verdict item 1): reproduce the r4 OOMs for
    # the published negative result, then the levers the r4 sweep never
    # tried — tiny batch, bucket-64 captions, dropping the unused text
    # tower, remat combinations. Ordered by information value: server-side
    # compiles cost ~15 min/point through the tunnel, so the grid is the
    # priority subset; follow-up points append to the same --out JSONL.
    "stage2fit": [
        (2, 8, False, 128, False),   # r4 OOM reproduction (remat off)
        (2, 16, True, 128, False),   # r4 OOM reproduction (remat on)
        (2, 2, False, 128, False),   # smallest batch, no levers
        (2, 8, True, 128, True),     # drop tower + remat at the r4 shape
        (2, 16, True, 64, True),     # + bucket-64 captions
        (2, 32, True, 64, True),     # throughput point if the above fits
    ],
    # round-5 boundary map AFTER the init-residency fix (generation-mode
    # init for drop-tower points): the compiled step peaks at 13.6 GB at
    # bs2/seq64 by XLA's own memory analysis and RUNS; these points locate
    # the single-chip batch ceiling at both bucket widths.
    "fit5": [
        (2, 2, True, 64, True),
        (2, 4, True, 64, True),
        (2, 8, True, 64, True),
        (2, 16, True, 64, True),
        (2, 2, True, 128, True),
        (2, 4, True, 128, True),
    ],
}

if args.sweep:
    # Each point in its own process: an OOM'd allocator never taints the next
    # measurement, and donated buffers are reclaimed by process exit.
    for stage, bs, remat, seq, drop in GRIDS[args.sweep]:
        cmd = [sys.executable, __file__, "--stage", str(stage), "--bs", str(bs),
               "--seq", str(seq), "--out", args.out]
        if remat:
            cmd.append("--remat")
        if drop:
            cmd.append("--drop-text-tower")
        r = subprocess.run(cmd, capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0 and "RESOURCE_EXHAUSTED" not in r.stdout + r.stderr:
            err = {"stage": stage, "bs": bs, "remat": remat, "seq": seq,
                   "drop_text_tower": drop, "error": (r.stderr or r.stdout)[-400:]}
            print(json.dumps(err), flush=True)
            with open(args.out, "a") as f:
                f.write(json.dumps(err) + "\n")
    sys.exit(0)

import numpy as np  # noqa: E402

from bench import GPT2_VOCAB, _enable_compile_cache, _median  # noqa: E402

_enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pgica_tpu.core.precision import cast_floating  # noqa: E402
from pgica_tpu.models.model import build_module  # noqa: E402
from pgica_tpu.training.optim import create_optimizer  # noqa: E402
from pgica_tpu.training.train_step import (  # noqa: E402
    TrainState,
    make_stage1_train_step,
    make_stage2_train_step,
)

BS, SEQ = args.bs, args.seq
point = {"stage": args.stage, "bs": BS, "remat": args.remat, "seq": SEQ,
         "drop_text_tower": args.drop_text_tower,
         "backend": jax.default_backend()}


def _emit(p):
    print(json.dumps(p), flush=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(p) + "\n")

module = build_module(
    vision_model="openai/clip-vit-large-patch14",
    text_model="gpt2-large",
    projection_dim=512,
    temperature=0.5,
    vocab_size=GPT2_VOCAB,
    max_caption_length=SEQ,
    dtype=jnp.bfloat16,
    remat=args.remat,
    freeze_vision_backbone=True,
)

rng = np.random.default_rng(0)
images = jnp.asarray(rng.normal(size=(BS, 224, 224, 3)).astype(np.float32))
ids = jnp.asarray(rng.integers(0, GPT2_VOCAB, (BS, SEQ)).astype(np.int32))
mask = jnp.ones((BS, SEQ), jnp.int32)

try:
    # Round-5 finding (results/PROFILE_scaled.md): dual-mode init materializes
    # BOTH text towers on device, and buffers dropped afterwards are not
    # reclaimed promptly through the axon runtime — the leaked ~2.9 GB made
    # every drop-text-tower sweep point "OOM" even though the compiled step's
    # own peak (13.6 GB by XLA memory analysis) fits. Init in generation mode
    # when the tower is dropped: flax then only ever creates the params the
    # stage-2 graph (encode_image + decode_train) actually uses.
    init_mode = (
        "generation" if (args.stage == 2 and args.drop_text_tower) else "dual"
    )
    params = module.init(
        jax.random.PRNGKey(0), images[:1], ids[:1], mask[:1], mode=init_mode
    )["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    point["params_m"] = round(n_params / 1e6, 1)

    if args.stage == 1:
        # Trainer stage-1 semantics: frozen ViT backbone + decoder outside the
        # gradient graph (trainer.py:211-216) -> no Adam moments for either.
        opt = create_optimizer(
            5e-5, total_steps=10_000, warmup_steps=500,
            params_for_freezing=params, freeze_vision_backbone=True,
            frozen_prefixes=(("caption_decoder",),),
        )
        step = jax.jit(
            make_stage1_train_step(module, opt, temperature=0.5, augment=True),
            donate_argnums=(0,),
        )
        state = TrainState.create(params, opt)
        del params
        batch = {"image": images, "caption_ids": ids, "caption_mask": mask}
        run = lambda s, k: step(s, batch, k)  # noqa: E731
    else:
        if args.drop_text_tower and "text_encoder" in params:
            # Reached only if init_mode above was "dual" (kept for safety):
            # stage 2 never executes the text encoder, dropping it from both
            # trees is loss-identical; the trainer merges it back for
            # checkpoints (training.stage2.drop_unused_tower). Must happen
            # BEFORE the optimizer: freezing partition labels match the tree.
            params = {k: v for k, v in params.items() if k != "text_encoder"}
        point["params_m"] = round(
            sum(x.size for x in jax.tree.leaves(params)) / 1e6, 1
        )
        opt = create_optimizer(
            1e-5, total_steps=10_000, warmup_steps=500,
            params_for_freezing=params, freeze_vision_backbone=True,
            frozen_prefixes=(("text_encoder",),),
        )
        step = jax.jit(
            make_stage2_train_step(module, opt, beta=0.1, augment=True),
            donate_argnums=(0,),
        )
        # Frozen DPO reference is bf16 (trainer convention: it only ever runs
        # a bf16 forward). jit the cast so no transient f32 copy tree is
        # materialized, and donate params into state creation so the f32
        # masters alias them instead of allocating a second tree.
        ref = jax.jit(lambda p: cast_floating(p, jnp.bfloat16))(params)
        state = jax.jit(lambda p: TrainState.create(p, opt), donate_argnums=(0,))(params)
        del params
        batch = {"image": images, "preferred_ids": ids, "preferred_mask": mask,
                 "rejected_ids": ids, "rejected_mask": mask}
        run = lambda s, k: step(s, ref, batch, k)  # noqa: E731

    key = jax.random.PRNGKey(1)
    t_c0 = time.perf_counter()
    state, m = run(state, key)
    jax.block_until_ready(m["loss"])
    point["compile_s"] = round(time.perf_counter() - t_c0, 1)

    # Compiled-executable accounting (same convention as PROFILE_stage2.md's
    # 23.03 TFLOP number: the executable's own cost analysis).
    try:
        lowered = (step.lower(state, batch, key) if args.stage == 1
                   else step.lower(state, ref, batch, key))
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        point["tflop_per_step"] = round(float(ca.get("flops", 0.0)) / 1e12, 2)
        mem = compiled.memory_analysis()
        if mem is not None:
            point["mem_args_gb"] = round(mem.argument_size_in_bytes / 2**30, 2)
            point["mem_temp_gb"] = round(mem.temp_size_in_bytes / 2**30, 2)
    except Exception as e:  # cost analysis is best-effort on axon
        point["cost_analysis_error"] = str(e)[:200]

    for i in range(args.warmup):
        state, m = run(state, jax.random.fold_in(key, i))
    jax.block_until_ready(m["loss"])

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, m = run(state, jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(m["loss"])
        times.append(time.perf_counter() - t0)
    ms = _median(times) * 1e3
    point["ms_per_step"] = round(ms, 1)
    point["pairs_per_sec"] = round(BS / (ms / 1e3), 1)
    point["loss"] = round(float(m["loss"]), 4)
    if "tflop_per_step" in point:
        point["mfu_pct"] = round(
            100.0 * point["tflop_per_step"] * 1e12 / (ms / 1e3) / V5E_BF16_PEAK, 1
        )
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            point["peak_hbm_gb"] = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        pass
    point["fit"] = True
except Exception as e:
    msg = str(e)
    # Axon's allocator sometimes surfaces OOM as a bare HLO-temp allocation
    # dump without the RESOURCE_EXHAUSTED prefix (seen on the (1,32,remat=off)
    # point) — match the dump's framing too.
    if ("RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower()
            or "Allocation type: HLO temp" in msg or "exhausted" in msg.lower()):
        point["fit"] = False
        point["oom"] = msg.splitlines()[0][:300]
    else:
        point["fit"] = False
        point["error"] = msg[:300]
        _emit(point)
        raise

_emit(point)
