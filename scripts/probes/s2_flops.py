"""FLOP decomposition of the stage-2 step via XLA cost analysis (CPU compile).

Backend-independent: cost analysis counts HLO FLOPs from the optimized
module. Variants: full DPO step, reference-free step, and the frozen-ref
forward alone, plus the stage-1 step for cross-checking.
"""
import sys, json
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from bench import GPT2_VOCAB
from pgica_tpu.core.precision import cast_floating
from pgica_tpu.models.model import build_module
from pgica_tpu.training.optim import create_optimizer
from pgica_tpu.training.train_step import TrainState, make_stage2_train_step, make_stage1_train_step

BS1, BS2 = 128, 32
module = build_module(
    vision_model="openai/clip-vit-base-patch32", text_model="gpt2-medium",
    projection_dim=512, vocab_size=GPT2_VOCAB,
    max_caption_length=128, dtype=jnp.bfloat16, remat=False,
    freeze_vision_backbone=True,
)
rng = np.random.default_rng(0)
def batch2(bs):
    images = jnp.asarray(rng.normal(size=(bs, 224, 224, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, GPT2_VOCAB, (bs, 128)).astype(np.int32))
    mask = jnp.ones((bs, 128), jnp.int32)
    return images, ids, mask

images, ids, mask = batch2(BS2)
params = module.init(jax.random.PRNGKey(0), images[:1], ids[:1], mask[:1], mode="dual")["params"]
ref = cast_floating(jax.tree.map(lambda x: jnp.array(x, copy=True), params), jnp.bfloat16)
opt = create_optimizer(1e-5, total_steps=1000, warmup_steps=10)
state = TrainState.create(params, opt)
b2 = {"image": images, "preferred_ids": ids, "preferred_mask": mask,
      "rejected_ids": ids, "rejected_mask": mask}
key = jax.random.key(0)

def flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    return ca.get("flops", float("nan"))

out = {}
out["stage2_full"] = flops(make_stage2_train_step(module, opt, beta=0.1, augment=True), state, ref, b2, key)
out["stage2_no_ref"] = flops(make_stage2_train_step(module, opt, beta=0.1, augment=True, reference_free=True), state, None, b2, key)
out["stage2_no_aug"] = flops(make_stage2_train_step(module, opt, beta=0.1, augment=False), state, ref, b2, key)

# stage-1 for the cross-check (module without frozen vision config diff is fine)
module1 = build_module(
    vision_model="openai/clip-vit-base-patch32", text_model="gpt2-medium",
    projection_dim=512, vocab_size=GPT2_VOCAB,
    max_caption_length=128, dtype=jnp.bfloat16, remat=False,
)
i1, d1, m1 = batch2(BS1)
p1 = module1.init(jax.random.PRNGKey(0), i1[:1], d1[:1], m1[:1], mode="contrastive")["params"]
st1 = TrainState.create(p1, opt)
out["stage1"] = flops(make_stage1_train_step(module1, opt, 0.07), st1,
                      {"image": i1, "caption_ids": d1, "caption_mask": m1}, key)

# Bucketed shape (VERDICT r4 item 9): the shipping trainer length-buckets
# realistic 8-28-token captions to the 32 bucket (training/packing.py), so
# the post-bucketing MFU needs the seq-32 step's FLOPs, not seq-128's.
ids32, mask32 = ids[:, :32], mask[:, :32]
b2_32 = {"image": images, "preferred_ids": ids32, "preferred_mask": mask32,
         "rejected_ids": ids32, "rejected_mask": mask32}
out["stage2_full_seq32"] = flops(
    make_stage2_train_step(module, opt, beta=0.1, augment=True), state, ref, b2_32, key)

line = json.dumps({k: round(v / 1e12, 3) for k, v in out.items()})
print(line)
with open("/root/repo/results/s2_flops.jsonl", "a") as f:
    f.write(line + "\n")
