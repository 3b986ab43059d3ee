#!/usr/bin/env python
"""Stage-1/stage-2 per-op profile + MFU on the real TPU (VERDICT round-1 item 4).

Captures a ``jax.profiler`` xplane trace of steady-state stage-1 train steps
at the TRUE GPT-2 vocabulary, parses it into a per-op table with
``tensorboard_plugin_profile``, computes MFU from the compiled HLO cost
analysis, and writes ``results/PROFILE.md`` + the raw trace under
``results/profile/``.

Usage: python scripts/profile_stage1.py [--stage 1|2] [--batch N] [--steps 10]
"""

import argparse
import json
import os

# Must precede ANY google.protobuf import (orbax/tensorstore pull it in):
# the TB profile plugin ships pre-3.19 generated protos that only the
# pure-Python implementation accepts.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/pgica_tpu/xla"))

V5E_BF16_PEAK_TFLOPS = 197.0  # TPU v5e (lite) peak bf16 TFLOP/s per chip
GPT2_VOCAB = 50262


def build(batch_size: int, stage: int = 1, dropout: float = 0.1, remat: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pgica_tpu.models.model import build_module
    from pgica_tpu.training.optim import create_optimizer
    from pgica_tpu.training.train_step import (
        TrainState,
        make_stage1_train_step,
        make_stage2_train_step,
    )

    module = build_module(
        vision_model="openai/clip-vit-base-patch32", text_model="gpt2-medium",
        projection_dim=512, temperature=0.5, vocab_size=GPT2_VOCAB,
        max_caption_length=128, dtype=jnp.bfloat16, remat=remat, dropout=dropout,
        freeze_vision_backbone=True,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch_size, 224, 224, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, GPT2_VOCAB, (batch_size, 128)).astype(np.int32))
    mask = jnp.ones((batch_size, 128), jnp.int32)
    if stage == 1:
        batch = {"image": images, "caption_ids": ids, "caption_mask": mask}
        params = module.init(
            jax.random.PRNGKey(0), images[:1], ids[:1], mask[:1], mode="contrastive"
        )["params"]
        opt = create_optimizer(
            5e-5, total_steps=1000, warmup_steps=10,
            params_for_freezing=params, freeze_vision_backbone=True,
        )
        state = TrainState.create(params, opt)
        step_fn = jax.jit(
            make_stage1_train_step(module, opt, temperature=0.5, augment=True),
            donate_argnums=(0,),
        )
        step = lambda st, key: step_fn(st, batch, key)
        cost_fn = lambda st, key: step_fn.lower(st, batch, key).compile().cost_analysis()
    else:
        from pgica_tpu.core.precision import cast_floating

        batch = {
            "image": images,
            "preferred_ids": ids, "preferred_mask": mask,
            "rejected_ids": ids, "rejected_mask": mask,
        }
        params = module.init(
            jax.random.PRNGKey(0), images[:1], ids[:1], mask[:1], mode="dual"
        )["params"]
        ref = cast_floating(jax.tree.map(lambda x: jnp.array(x, copy=True), params), jnp.bfloat16)
        opt = create_optimizer(1e-5, total_steps=1000, warmup_steps=10)
        state = TrainState.create(params, opt)
        step_fn = jax.jit(
            make_stage2_train_step(module, opt, beta=0.1, augment=True),
            donate_argnums=(0,),
        )
        step = lambda st, key: step_fn(st, ref, batch, key)
        cost_fn = lambda st, key: step_fn.lower(st, ref, batch, key).compile().cost_analysis()
    return step, state, cost_fn


def build_decode(batch_size: int, max_length: int):
    """Greedy-decode profile target: returns (run_fn, cost_fn)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pgica_tpu.data.tokenizer import CaptionTokenizer
    from pgica_tpu.generation.decode import _greedy_or_sample
    from pgica_tpu.models import PreferenceGuidedCaptioningModel

    tokenizer = CaptionTokenizer()
    model = PreferenceGuidedCaptioningModel(
        vision_model="openai/clip-vit-base-patch32", text_model="gpt2-medium",
        projection_dim=512, tokenizer=tokenizer, max_caption_length=128,
        dtype=jnp.bfloat16, seed=0, vocab_size=GPT2_VOCAB,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch_size, 224, 224, 3)).astype(np.float32))
    params = model._inference_params()
    vision = model._jit_encode_image(params, images)["embeddings"]  # outside the profiled region
    kw = dict(
        temperature=jnp.float32(1.0), top_p=jnp.float32(1.0),
        repetition_penalty=jnp.float32(1.0),
        max_length=max_length, do_sample=False,
        eos_token_id=tokenizer.eos_token_id, pad_token_id=tokenizer.pad_token_id,
    )

    def run():
        seqs = _greedy_or_sample(
            model.module, params, vision, jax.random.PRNGKey(0), **kw
        )
        # device_get, not block_until_ready: under the axon tunnel the
        # latter returns at enqueue time and undercounts by ~60x.
        return np.asarray(seqs)

    def cost_fn():
        return (
            _greedy_or_sample.lower(
                model.module, params, vision, jax.random.PRNGKey(0), **kw
            )
            .compile()
            .cost_analysis()
        )

    return run, cost_fn


def measure(step, state, steps: int, key):
    import jax

    for _ in range(2):
        state, metrics = step(state, key)
    jax.block_until_ready(metrics["loss"])
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, key)
        _ = float(metrics["loss"])
    return (time.time() - t0) / steps, state


def op_table(trace_dir: Path, top: int = 25):
    """Top HLO ops by device time, aggregated straight from the xplane proto
    ("XLA Ops" line of the TPU device plane)."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:
        return None, f"xplane proto unavailable: {e}"

    import gzip

    xplanes = sorted(
        list(trace_dir.rglob("*.xplane.pb")) + list(trace_dir.rglob("*.xplane.pb.gz")),
        key=lambda p: p.stat().st_mtime,
    )
    if not xplanes:
        return None, "no xplane found"
    raw = xplanes[-1].read_bytes()
    if xplanes[-1].suffix == ".gz":
        raw = gzip.decompress(raw)
    space = xplane_pb2.XSpace()
    space.ParseFromString(raw)
    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        import re

        meta = {m.id: m.name for m_id, m in plane.event_metadata.items() for m in [m]}

        def signature(name: str) -> str:
            # "%fusion.2239 = (f32[], bf16[4096,1024,1]{...}) fusion(...), ..."
            # -> group per-layer clones of the same op by result-type + kind.
            body = name.split(" = ", 1)[-1]
            body = re.sub(r"\{[^}]*\}", "", body)  # drop layout annotations
            m = re.match(r"(\([^)]*\)|[^ ]+) ([a-zA-Z0-9_\-]+)", body)
            if not m:
                return body[:70]
            return f"{m.group(2)} {m.group(1)}"[:90]

        totals = {}
        counts = {}
        total_ps = 0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                key = signature(meta.get(ev.metadata_id, str(ev.metadata_id)))
                totals[key] = totals.get(key, 0) + ev.duration_ps
                counts[key] = counts.get(key, 0) + 1
                total_ps += ev.duration_ps
        if not totals:
            continue
        rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
        return [
            (name, dur / 1e9, 100.0 * dur / max(total_ps, 1), counts[name])
            for name, dur in rows
        ], None
    return None, "no TPU device plane with XLA Ops"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1, choices=(1, 2))
    ap.add_argument("--decode", action="store_true",
                    help="profile the greedy decode call instead of a train step")
    ap.add_argument("--max-length", type=int, default=64, help="decode length (--decode)")
    ap.add_argument("--batch", type=int, default=0, help="0 = stage default (128 / 32)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", type=str, default="results")
    ap.add_argument("--parse-only", action="store_true",
                    help="regenerate the op table from an existing trace (no TPU run)")
    args = ap.parse_args()

    if args.parse_only:
        rows, err = op_table(Path(args.out) / "profile")
        if rows is None:
            print(err, file=sys.stderr)
            return 1
        report = Path(args.out) / "PROFILE.md"
        lines = report.read_text().splitlines() if report.exists() else []
        head = [l for l in lines if not l.startswith("|") and not l.startswith("## Top")]
        head += ["## Top HLO ops by device time (3 traced steps, 'XLA Ops' plane line)", "",
                 "| HLO op group (kind + result type) | device ms | % of op time | #events |",
                 "|---|---|---|---|"]
        head += [f"| `{n}` | {ms:.2f} | {pct:.1f}% | {cnt} |" for n, ms, pct, cnt in rows]
        report.write_text("\n".join(head) + "\n")
        print(f"op table refreshed in {report}")
        return 0

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    # match the production configs: TPU hardware RNG for dropout/augment keys
    try:
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass

    out_dir = Path(args.out)
    trace_dir = out_dir / "profile"
    trace_dir.mkdir(parents=True, exist_ok=True)

    print(f"backend={jax.default_backend()}", file=sys.stderr)

    if args.decode:
        trace_dir = out_dir / "profile_decode"
        trace_dir.mkdir(parents=True, exist_ok=True)
        batch_size = args.batch or 32
        run, cost_fn = build_decode(batch_size, max_length=args.max_length)
        run()  # compile
        t0 = time.time()
        for _ in range(args.steps):
            run()
        sec_per_call = (time.time() - t0) / args.steps
        cost = cost_fn()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        with jax.profiler.trace(str(trace_dir)):
            run()
        cps = batch_size / sec_per_call
        rows, err = op_table(trace_dir)
        md = [
            "# Greedy-decode per-op profile (real TPU, true vocab 50,262)",
            "",
            f"- batch {batch_size}, len {args.max_length}, bf16 inference params, "
            f"{args.steps} timed calls",
            f"- call time: **{sec_per_call*1000:.1f} ms** -> **{cps:.1f} captions/s** "
            f"({sec_per_call*1000/args.max_length:.2f} ms/token-step)",
            f"- compiled HLO cost: {flops/1e12:.3f} TFLOP/call",
            "",
        ]
        if rows:
            md += ["## Top HLO ops by device time (1 traced call, 'XLA Ops' plane line)", "",
                   "| HLO op group (kind + result type) | device ms | % of op time | #events |",
                   "|---|---|---|---|"]
            md += [f"| `{n}` | {ms:.2f} | {pct:.1f}% | {cnt} |" for n, ms, pct, cnt in rows]
        else:
            md.append(f"(per-op table unavailable: {err})")
        report = out_dir / "PROFILE_decode.md"
        report.write_text("\n".join(md) + "\n")
        print("\n".join(md[:6]))
        print(f"wrote {report}")
        return 0

    batch_size = args.batch or (128 if args.stage == 1 else 32)
    # stage-2 keeps threefry keys (the rbg variant of that graph crashes this
    # stack's remote compile helper — see bench.py)
    key = (jax.random.PRNGKey(0) if args.stage == 1
           else jax.random.key(0, impl="threefry2x32"))
    step, state, cost_fn = build(batch_size, stage=args.stage)

    # FLOPs from the compiled HLO (fwd+bwd+update, augment included) — uses
    # the SAME jit cache entry the measured steps execute, so no recompile.
    cost = cost_fn(state, key)
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))

    sec_per_step, state = measure(step, state, args.steps, key)

    # trace a few steady-state steps
    with jax.profiler.trace(str(trace_dir)):
        for _ in range(3):
            state, metrics = step(state, key)
        jax.block_until_ready(metrics["loss"])

    pairs_per_sec = batch_size / sec_per_step
    tflops_per_sec = flops / sec_per_step / 1e12
    mfu = tflops_per_sec / V5E_BF16_PEAK_TFLOPS

    rows, err = op_table(trace_dir)

    md = [
        f"# Stage-{args.stage} per-op profile (real TPU, true vocab 50,262)",
        "",
        f"- batch {batch_size}, {args.steps} timed steps, bf16, augment on, frozen ViT",
        f"- step time: **{sec_per_step*1000:.1f} ms** -> **{pairs_per_sec:.1f} pairs/s/chip**",
        f"- compiled HLO cost: **{flops/1e12:.2f} TFLOP/step** -> {tflops_per_sec:.1f} TFLOP/s",
        f"- **MFU ~= {100*mfu:.1f}%** of v5e bf16 peak ({V5E_BF16_PEAK_TFLOPS:.0f} TFLOP/s)",
        "",
    ]
    if rows:
        md.append("## Top HLO ops by device time (3 traced steps, 'XLA Ops' plane line)")
        md.append("")
        md.append("| HLO op group (kind + result type) | device ms | % of op time | #events |")
        md.append("|---|---|---|---|")
        for name, ms, pct, cnt in rows:
            md.append(f"| `{name}` | {ms:.2f} | {pct:.1f}% | {cnt} |")
    else:
        md.append(f"(per-op table unavailable: {err})")
    name = "PROFILE.md" if args.stage == 1 else "PROFILE_stage2.md"
    (out_dir / name).write_text("\n".join(md) + "\n")
    print("\n".join(md[:8]))
    print(f"trace in {trace_dir}, report in {out_dir}/{name}")


if __name__ == "__main__":
    sys.exit(main())
