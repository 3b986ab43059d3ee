"""Interleaved stage-1 A/B: fused pallas LN vs XLA LN fusions.

Same drift-immune structure as s2_ab.py; stage-1 contrastive step at the
bench's true-vocab config, batch 128.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from bench import GPT2_VOCAB, _enable_compile_cache
from pgica_tpu.models.model import build_module
from pgica_tpu.training.optim import create_optimizer
from pgica_tpu.training.train_step import TrainState, make_stage1_train_step
from pgica_tpu.ops import layernorm as ln_mod

_enable_compile_cache()
print(json.dumps({"backend": jax.default_backend()}), flush=True)

BS, K, R = 128, 4, 4

module = build_module(
    vision_model="openai/clip-vit-base-patch32", text_model="gpt2-medium",
    projection_dim=512, vocab_size=GPT2_VOCAB,
    max_caption_length=128, dtype=jnp.bfloat16, remat=False,
)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.normal(size=(BS, 224, 224, 3)).astype(np.float32))
ids = jnp.asarray(rng.integers(0, GPT2_VOCAB, (BS, 128)).astype(np.int32))
mask = jnp.ones((BS, 128), jnp.int32)
params = module.init(jax.random.PRNGKey(0), images[:1], ids[:1], mask[:1], mode="contrastive")["params"]
opt = create_optimizer(1e-4, total_steps=1000, warmup_steps=10)
state = TrainState.create(params, opt)
del params
batch = {"image": images, "caption_ids": ids, "caption_mask": mask}
key = jax.random.key(0)

steps = {}
for name, ln in (("ln_xla", False), ("ln_fused", True)):
    t0 = time.time()
    ln_mod.set_enabled(ln)
    fn = jax.jit(make_stage1_train_step(module, opt, 0.07), donate_argnums=(0,))
    state, m = fn(state, batch, key)
    _ = float(m["loss"])
    steps[name] = fn
    print(json.dumps({"compiled": name, "s": round(time.time() - t0, 1)}), flush=True)

times = {n: [] for n in steps}
for rd in range(R):
    for name, fn in steps.items():
        t0 = time.time()
        for _ in range(K):
            state, m = fn(state, batch, key)
            _ = float(m["loss"])
        times[name].append((time.time() - t0) / K * 1000)
    print(json.dumps({"round": rd, **{n: round(v[-1], 1) for n, v in times.items()}}), flush=True)

out = {n: {"ms_step_median": round(float(np.median(v)), 1),
           "ms_step_all": [round(x, 1) for x in v],
           "pairs_s": round(BS / (np.median(v) / 1000), 1)} for n, v in times.items()}
print(json.dumps(out, indent=1), flush=True)
