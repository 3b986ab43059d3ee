"""Stage-2 MFU decomposition probes on the real chip.

Variants of bench.py:run_stage2_bench isolating each suspected MFU drag:
  base       — dropout 0.1, augment on, frozen bf16 ref, threefry  (bench.py)
  no_aug     — augment off (jitter + its RNG off the step)
  no_drop    — dropout 0.0 (all rng-bit-generation + mask applies gone)
  no_ref     — reference_free DPO (frozen fwd-only ref pass gone)
  rbg        — hardware RNG keys (crashed the remote compile helper in r2)
Prints pairs/s + ms/step for each; each uses 12 timed steps with a hard
per-step float() sync.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import GPT2_VOCAB, _enable_compile_cache
from pgica_tpu.core.precision import cast_floating
from pgica_tpu.models.model import build_module
from pgica_tpu.training.optim import create_optimizer
from pgica_tpu.training.train_step import TrainState, make_stage2_train_step

_enable_compile_cache()

STEPS, WARM = 12, 3


def run(tag, dropout=0.1, augment=True, reference_free=False, impl="threefry2x32", BS=32):
    module = build_module(
        vision_model="openai/clip-vit-base-patch32", text_model="gpt2-medium",
        projection_dim=512, vocab_size=GPT2_VOCAB, dropout=dropout,
        max_caption_length=128, dtype=jnp.bfloat16, remat=False,
        freeze_vision_backbone=True,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(BS, 224, 224, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, GPT2_VOCAB, (BS, 128)).astype(np.int32))
    mask = jnp.ones((BS, 128), jnp.int32)
    params = module.init(jax.random.PRNGKey(0), images[:1], ids[:1], mask[:1], mode="dual")["params"]
    ref = None
    if not reference_free:
        ref = cast_floating(jax.tree.map(lambda x: jnp.array(x, copy=True), params), jnp.bfloat16)
    opt = create_optimizer(1e-5, total_steps=1000, warmup_steps=10)
    state = TrainState.create(params, opt)
    step = jax.jit(
        make_stage2_train_step(module, opt, beta=0.1, augment=augment,
                               reference_free=reference_free),
        donate_argnums=(0,),
    )
    batch = {"image": images, "preferred_ids": ids, "preferred_mask": mask,
             "rejected_ids": ids, "rejected_mask": mask}
    key = jax.random.key(0, impl=impl)
    try:
        for _ in range(WARM):
            state, metrics = step(state, ref, batch, key)
        jax.block_until_ready(metrics["loss"])
        t0 = time.time()
        for _ in range(STEPS):
            state, metrics = step(state, ref, batch, key)
            _ = float(metrics["loss"])
        dt = time.time() - t0
        print(json.dumps({"tag": tag, "pairs_s": round(BS * STEPS / dt, 1),
                          "ms_step": round(1000 * dt / STEPS, 1),
                          "backend": jax.default_backend()}), flush=True)
    except Exception as e:
        print(json.dumps({"tag": tag, "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)


import argparse
ap = argparse.ArgumentParser()
ap.add_argument("--only", default=None)
a = ap.parse_args()
variants = {
    "base": dict(),
    "no_aug": dict(augment=False),
    "no_drop": dict(dropout=0.0),
    "no_drop_no_aug": dict(dropout=0.0, augment=False),
    "no_ref": dict(reference_free=True),
    "bs48": dict(BS=48),
    "bs64": dict(BS=64),
    "rbg": dict(impl="rbg"),
}
for tag, kw in variants.items():
    if a.only and tag != a.only:
        continue
    run(tag, **kw)
