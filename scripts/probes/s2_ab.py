"""Interleaved A/B stage-2 probe: dropout impls + structural pieces.

ONE resident TrainState/ref (HBM fits a single config only); the configs
differ only in their jitted step function (dropout lowering, rng key type,
reference-free). R rounds of K timed steps interleaved across configs so
tunnel drift hits every config equally; per-config median ms/step.
"""
import argparse, sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from bench import GPT2_VOCAB, _enable_compile_cache
from pgica_tpu.core.precision import cast_floating
from pgica_tpu.models.model import build_module
from pgica_tpu.training.optim import create_optimizer
from pgica_tpu.training.train_step import TrainState, make_stage2_train_step
from pgica_tpu.ops import dropout as dropout_mod
from pgica_tpu.ops import layernorm as ln_mod

_enable_compile_cache()
print(json.dumps({"backend": jax.default_backend()}), flush=True)

# All six executables resident at once OOM the 16 GB chip; worse, the
# fused-LN config alone OOMs at batch 32 with remat=False (pallas LN is a
# fusion barrier, so f32 activations that XLA remats inside fusions get
# materialized for backward: program temp 6.88G + args 9.83G > 15.75G).
# Run anchored subsets (always include "main") at --bs 16.
ap = argparse.ArgumentParser()
ap.add_argument("--only", type=str, default="",
                help="comma-separated config subset, e.g. main,ln_xla")
ap.add_argument("--bs", type=int, default=32)
args = ap.parse_args()

BS, K, R = args.bs, 4, 4


def make_module(dropout):
    return build_module(
        vision_model="openai/clip-vit-base-patch32", text_model="gpt2-medium",
        projection_dim=512, vocab_size=GPT2_VOCAB, dropout=dropout,
        max_caption_length=128, dtype=jnp.bfloat16, remat=False,
        freeze_vision_backbone=True,
    )


module = make_module(0.1)
module0 = make_module(0.0)  # no-dropout graph, same param shapes
rng = np.random.default_rng(0)
images = jnp.asarray(rng.normal(size=(BS, 224, 224, 3)).astype(np.float32))
ids = jnp.asarray(rng.integers(0, GPT2_VOCAB, (BS, 128)).astype(np.int32))
mask = jnp.ones((BS, 128), jnp.int32)
params = module.init(jax.random.PRNGKey(0), images[:1], ids[:1], mask[:1], mode="dual")["params"]
ref = cast_floating(jax.tree.map(lambda x: jnp.array(x, copy=True), params), jnp.bfloat16)
opt = create_optimizer(1e-5, total_steps=1000, warmup_steps=10)
state = TrainState.create(params, opt)
del params
batch = {"image": images, "preferred_ids": ids, "preferred_mask": mask,
         "rejected_ids": ids, "rejected_mask": mask}
key_tf = jax.random.key(0, impl="threefry2x32")
key_rbg = jax.random.key(0, impl="rbg")

configs = {
    # main = shipping default: packed dropout + XLA-fused LN + rbg keys.
    # (Measured bs16: pallas fused-LN 170.0 ms/step vs XLA LN 163.8 — XLA
    # wins, and the pallas variant OOMs at bs32 remat=False; default off.)
    "main": dict(impl="packed", ln=False, mod=module, key=key_rbg, rf=False),
    "ln_pallas": dict(impl="packed", ln=True, mod=module, key=key_rbg, rf=False),
    "drop_flax": dict(impl="flax", ln=False, mod=module, key=key_rbg, rf=False),
    "tf_keys": dict(impl="packed", ln=False, mod=module, key=key_tf, rf=False),
    "no_drop": dict(impl="packed", ln=False, mod=module0, key=key_rbg, rf=False),
    "no_ref": dict(impl="packed", ln=False, mod=module, key=key_rbg, rf=True),
}
only = [s for s in args.only.split(",") if s]
if only:
    configs = {n: configs[n] for n in only}
steps = {}
for name, c in configs.items():
    t0 = time.time()
    dropout_mod.set_impl(c["impl"])
    ln_mod.set_enabled(c["ln"])
    fn = jax.jit(make_stage2_train_step(c["mod"], opt, beta=0.1, augment=True,
                                        reference_free=c["rf"]), donate_argnums=(0,))
    r = None if c["rf"] else ref
    state, m = fn(state, r, batch, c["key"])  # trace+compile+run
    _ = float(m["loss"])
    steps[name] = (fn, r, c["key"])
    print(json.dumps({"compiled": name, "s": round(time.time() - t0, 1)}), flush=True)

times = {n: [] for n in steps}
for rd in range(R):
    for name, (fn, r, key) in steps.items():
        t0 = time.time()
        for _ in range(K):
            state, m = fn(state, r, batch, key)
            _ = float(m["loss"])
        times[name].append((time.time() - t0) / K * 1000)
    print(json.dumps({"round": rd, **{n: round(v[-1], 1) for n, v in times.items()}}), flush=True)

out = {n: {"ms_step_median": round(float(np.median(v)), 1),
           "ms_step_all": [round(x, 1) for x in v],
           "pairs_s": round(BS / (np.median(v) / 1000), 1)} for n, v in times.items()}
print(json.dumps(out, indent=1), flush=True)
