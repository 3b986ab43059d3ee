"""Interleaved A/B: length-bucketed vs full-width steps on the real chip.

VERDICT r3 item 6 ("attack the stage-2 dominant op groups"): the 2x-row
[chosen; rejected] decoder pass runs at the full 128-token pad width even
though real captions are ~10-30 tokens. Length bucketing
(training/packing.py, exact — tests/test_packing.py) slices the batch to the
smallest multiple-of-32 bucket. This probe measures the win at realistic
caption lengths (8-28 tokens -> bucket 32) with the drift-free interleaving
discipline of s2_ab.py: ONE resident TrainState, two compiled steps (full /
bucketed), R rounds x K steps each, medians quoted.

Run: python scripts/probes/packing_ab.py [--stage 2] [--bs 32] [--rounds 4]

Every JSON line is appended to --out (default results/packing_ab_r5.jsonl)
as well as stdout, so the raw data lands in results/ atomically with the run
(VERDICT r4 item 5: no MD table row without its committed raw line).
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from bench import GPT2_VOCAB, _enable_compile_cache, _median

_enable_compile_cache()

import jax
import jax.numpy as jnp

from pgica_tpu.core.precision import cast_floating
from pgica_tpu.models.model import build_module
from pgica_tpu.training.optim import create_optimizer
from pgica_tpu.training.packing import bucket_batch
from pgica_tpu.training.train_step import (
    TrainState,
    make_stage1_train_step,
    make_stage2_train_step,
)

ap = argparse.ArgumentParser()
ap.add_argument("--stage", type=int, default=2, choices=(1, 2))
ap.add_argument("--bs", type=int, default=32)
ap.add_argument("--rounds", type=int, default=4)
ap.add_argument("--steps", type=int, default=4)
ap.add_argument("--min-len", type=int, default=8)
ap.add_argument("--max-len", type=int, default=28)
ap.add_argument("--out", default="/root/repo/results/packing_ab_r5.jsonl")
args = ap.parse_args()

_out = open(args.out, "a")  # noqa: SIM115 — held for the process lifetime


def emit(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    _out.write(line + "\n")
    _out.flush()


emit({"backend": jax.default_backend(), **vars(args)})

BS, SEQ = args.bs, 128
module = build_module(
    vision_model="openai/clip-vit-base-patch32", text_model="gpt2-medium",
    projection_dim=512, vocab_size=GPT2_VOCAB, max_caption_length=SEQ,
    dtype=jnp.bfloat16, remat=False, freeze_vision_backbone=True,
)

rng = np.random.default_rng(0)
images = rng.normal(size=(BS, 224, 224, 3)).astype(np.float32)
lengths = rng.integers(args.min_len, args.max_len + 1, BS)


def synth(lengths):
    ids = rng.integers(1, GPT2_VOCAB, (BS, SEQ)).astype(np.int32)
    mask = np.zeros((BS, SEQ), np.int32)
    for i, l in enumerate(lengths):
        mask[i, :l] = 1
    return ids * mask, mask


p_ids, p_mask = synth(lengths)
r_ids, r_mask = synth(rng.integers(args.min_len, args.max_len + 1, BS))

params = module.init(
    jax.random.PRNGKey(0), jnp.asarray(images[:1]), jnp.asarray(p_ids[:1, :8]),
    jnp.ones((1, 8), jnp.int32), mode="dual",
)["params"]

if args.stage == 2:
    full = {"image": images, "preferred_ids": p_ids, "preferred_mask": p_mask,
            "rejected_ids": r_ids, "rejected_mask": r_mask}
    opt = create_optimizer(
        1e-5, total_steps=10_000, warmup_steps=500, params_for_freezing=params,
        freeze_vision_backbone=True, frozen_prefixes=(("text_encoder",),),
    )
    step = jax.jit(
        make_stage2_train_step(module, opt, beta=0.1, augment=True),
        donate_argnums=(0,),
    )
    ref = cast_floating(jax.tree.map(lambda x: jnp.array(x, copy=True), params), jnp.bfloat16)
    run = lambda s, b, k: step(s, ref, b, k)  # noqa: E731
else:
    full = {"image": images, "caption_ids": p_ids, "caption_mask": p_mask}
    opt = create_optimizer(
        5e-5, total_steps=10_000, warmup_steps=500, params_for_freezing=params,
        freeze_vision_backbone=True, frozen_prefixes=(("caption_decoder",),),
    )
    step = jax.jit(
        make_stage1_train_step(module, opt, temperature=0.5, augment=True),
        donate_argnums=(0,),
    )
    run = lambda s, b, k: step(s, b, k)  # noqa: E731

state = TrainState.create(params, opt)
del params

cut = bucket_batch(full, (32, 64, 96, 128))
cut_w = next(v.shape[1] for k, v in cut.items() if k.endswith("_ids") or k == "caption_ids")
emit({"bucket_width": int(cut_w)})

batches = {"full128": jax.tree.map(jnp.asarray, full),
           f"bucket{cut_w}": jax.tree.map(jnp.asarray, cut)}

key = jax.random.PRNGKey(1)
# compile + warmup both (loss parity check rides along: augment is on, so
# only expect closeness, the exact-parity proof lives in tests/test_packing.py)
losses = {}
for name, b in batches.items():
    state, m = run(state, b, key)
    jax.block_until_ready(m["loss"])
    losses[name] = float(m["loss"])
emit({"compile_done": True, "losses": losses})

times = {name: [] for name in batches}
for r in range(args.rounds):
    for name, b in batches.items():
        for i in range(args.steps):
            t0 = time.perf_counter()
            state, m = run(state, b, jax.random.fold_in(key, r * 100 + i))
            jax.block_until_ready(m["loss"])
            times[name].append(time.perf_counter() - t0)

out = {}
for name, ts in times.items():
    ms = _median(ts) * 1e3
    out[name] = {"ms_per_step": round(ms, 1), "pairs_per_sec": round(BS / (ms / 1e3), 1),
                 "spread_ms": [round(min(ts) * 1e3, 1), round(max(ts) * 1e3, 1)]}
names = list(out)
speedup = out[names[0]]["ms_per_step"] / out[names[1]]["ms_per_step"]
emit({"results": out, "full_over_bucket_x": round(speedup, 2)})
