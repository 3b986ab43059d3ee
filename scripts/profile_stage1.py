#!/usr/bin/env python
"""Stage-1 per-op profile + MFU on the real TPU (VERDICT round-1 item 4).

Captures a ``jax.profiler`` xplane trace of steady-state stage-1 train steps
at the TRUE GPT-2 vocabulary, parses it into a per-op table with
``tensorboard_plugin_profile``, computes MFU from the compiled HLO cost
analysis, and writes ``results/PROFILE.md`` + the raw trace under
``results/profile/``.

Usage: python scripts/profile_stage1.py [--batch 64] [--steps 10]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/pgica_tpu/xla"))

V5E_BF16_PEAK_TFLOPS = 197.0  # TPU v5e (lite) peak bf16 TFLOP/s per chip
GPT2_VOCAB = 50262


def build(batch_size: int, dropout: float = 0.1, remat: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pgica_tpu.models.model import build_module
    from pgica_tpu.training.optim import create_optimizer
    from pgica_tpu.training.train_step import TrainState, make_stage1_train_step

    module = build_module(
        vision_model="openai/clip-vit-base-patch32", text_model="gpt2-medium",
        projection_dim=512, temperature=0.5, vocab_size=GPT2_VOCAB,
        max_caption_length=128, dtype=jnp.bfloat16, remat=remat, dropout=dropout,
    )
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(batch_size, 224, 224, 3)).astype(np.float32)),
        "caption_ids": jnp.asarray(rng.integers(0, GPT2_VOCAB, (batch_size, 128)).astype(np.int32)),
        "caption_mask": jnp.ones((batch_size, 128), jnp.int32),
    }
    params = module.init(
        jax.random.PRNGKey(0), batch["image"][:1], batch["caption_ids"][:1],
        batch["caption_mask"][:1], mode="contrastive",
    )["params"]
    opt = create_optimizer(
        5e-5, total_steps=1000, warmup_steps=10,
        params_for_freezing=params, freeze_vision_backbone=True,
    )
    state = TrainState.create(params, opt)
    step = jax.jit(
        make_stage1_train_step(module, opt, temperature=0.5, augment=True),
        donate_argnums=(0,),
    )
    return step, state, batch


def measure(step, state, batch, steps: int):
    import jax

    key = jax.random.PRNGKey(0)
    for _ in range(2):
        state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, batch, key)
        _ = float(metrics["loss"])
    return (time.time() - t0) / steps, state


def op_table(trace_dir: Path, top: int = 20):
    """Top self-time HLO ops from the captured xplane, via the TB plugin."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplanes = sorted(trace_dir.rglob("*.xplane.pb"))
    if not xplanes:
        return None, "no xplane found"
    data, _ = rtd.xspace_to_tool_data([str(xplanes[-1])], "framework_op_stats", {})
    return data, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", type=str, default="results")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    out_dir = Path(args.out)
    trace_dir = out_dir / "profile"
    trace_dir.mkdir(parents=True, exist_ok=True)

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    step, state, batch = build(args.batch)

    # FLOPs from the compiled HLO (stage-1 fwd+bwd+update, augment included).
    lowered = jax.jit(step._fun if hasattr(step, "_fun") else step, donate_argnums=(0,)).lower(
        state, batch, jax.random.PRNGKey(0)
    )
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))

    sec_per_step, state = measure(step, state, batch, args.steps)

    # trace a few steady-state steps
    key = jax.random.PRNGKey(1)
    with jax.profiler.trace(str(trace_dir)):
        for _ in range(3):
            state, metrics = step(state, batch, key)
        jax.block_until_ready(metrics["loss"])

    pairs_per_sec = args.batch / sec_per_step
    tflops_per_sec = flops / sec_per_step / 1e12
    mfu = tflops_per_sec / V5E_BF16_PEAK_TFLOPS

    table, err = op_table(trace_dir)
    rows = []
    if table is not None:
        try:
            parsed = json.loads(table)
            # framework_op_stats tool: list of tables; find the op one
            for t in parsed if isinstance(parsed, list) else [parsed]:
                cols = [c.get("label", c.get("id", "")) for c in t.get("cols", [])]
                if "Total self-time (us)" in " ".join(map(str, cols)) or t.get("rows"):
                    for r in t.get("rows", [])[:40]:
                        rows.append([c.get("v") for c in r.get("c", [])])
                    header = cols
                    break
        except Exception as e:
            err = f"parse failed: {e}"

    md = [
        "# Stage-1 per-op profile (real TPU, true vocab 50,262)",
        "",
        f"- batch {args.batch}, {args.steps} timed steps, bf16, augment on, frozen ViT",
        f"- step time: **{sec_per_step*1000:.1f} ms** -> **{pairs_per_sec:.1f} pairs/s/chip**",
        f"- compiled HLO cost: **{flops/1e12:.2f} TFLOP/step** -> {tflops_per_sec:.1f} TFLOP/s",
        f"- **MFU ~= {100*mfu:.1f}%** of v5e bf16 peak ({V5E_BF16_PEAK_TFLOPS:.0f} TFLOP/s)",
        "",
    ]
    if rows:
        md.append("## Top ops by self time")
        md.append("")
        md.append("| " + " | ".join(str(h) for h in header) + " |")
        md.append("|" + "---|" * len(header))
        for r in rows[:25]:
            md.append("| " + " | ".join(str(x) for x in r) + " |")
    else:
        md.append(f"(per-op table unavailable: {err})")
    (out_dir / "PROFILE.md").write_text("\n".join(md) + "\n")
    print("\n".join(md[:8]))
    print(f"trace in {trace_dir}, report in {out_dir}/PROFILE.md")


if __name__ == "__main__":
    sys.exit(main())
