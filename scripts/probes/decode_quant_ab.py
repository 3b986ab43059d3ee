#!/usr/bin/env python
"""On-chip A/B: bf16 vs int8 (W8A8) vs int8_weight_only greedy decode.

Flagship shapes (ViT-B/32 + GPT-2 Medium, vocab 50,262), len 64, uint8 wire.
ONE wrapper instance (one set of f32 masters — three full models OOM a 16 GB
chip); arms switch by mutating ``model.quantization``, whose twin/qparams are
cached per mode. Repetitions are interleaved so tunnel drift hits every arm
equally.

Run: python scripts/probes/decode_quant_ab.py [--batch 16 32] [--reps 7]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/pgica_tpu/xla"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

GPT2_VOCAB = 50257 + 5
ARMS = (None, "int8", "int8_weight_only")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--max-length", type=int, default=64)
    ap.add_argument("--arms", nargs="+", default=None,
                    help="subset of arms: none int8 int8_weight_only")
    args = ap.parse_args()
    arms = tuple(
        None if a in ("none", "None") else a for a in args.arms
    ) if args.arms else ARMS

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from pgica_tpu.data.tokenizer import CaptionTokenizer
    from pgica_tpu.models import PreferenceGuidedCaptioningModel

    model = PreferenceGuidedCaptioningModel(
        vision_model="openai/clip-vit-base-patch32", text_model="gpt2-medium",
        projection_dim=512, tokenizer=CaptionTokenizer(), max_caption_length=128,
        dtype=jnp.bfloat16, seed=0, vocab_size=GPT2_VOCAB,
    )
    quant_caches = {}  # mode -> (params_id_tuple) cache keyed by wrapper attr

    def set_arm(mode):
        model.quantization = mode
        # per-mode twin cache: the wrapper keys _quant_cache on params object
        # only, so swap a per-mode slot in/out
        model._quant_cache = quant_caches.get(mode)

    def save_arm(mode):
        quant_caches[mode] = getattr(model, "_quant_cache", None)

    rng = np.random.default_rng(0)
    for bs in args.batch:
        images = rng.integers(0, 256, size=(bs, 224, 224, 3), dtype=np.uint8)
        sample = {}
        for mode in arms:
            set_arm(mode)
            t0 = time.time()
            sample[mode] = model.generate_captions(images, max_length=args.max_length)
            save_arm(mode)
            print(f"bs={bs} {mode}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
        times = {mode: [] for mode in arms}
        for _ in range(args.reps):
            for mode in arms:  # interleaved: drift-fair
                set_arm(mode)
                t0 = time.time()
                model.generate_captions(images, max_length=args.max_length)
                times[mode].append(time.time() - t0)
        base = sorted(times[arms[0]])[args.reps // 2]
        for mode in arms:
            med = sorted(times[mode])[args.reps // 2]
            print(
                f"bs={bs} {str(mode):>17}: median {med*1000:7.1f} ms "
                f"({bs/med:6.1f} cap/s, {base/med:0.2f}x {arms[0]})  "
                f"all={[round(t*1000) for t in sorted(times[mode])]}"
            )
        for mode in arms[1:]:
            agree = np.mean([a == b for a, b in zip(sample[mode], sample[arms[0]])])
            print(f"bs={bs} {mode}: caption exact-match vs {arms[0]} = {agree:.2f}")


if __name__ == "__main__":
    main()
