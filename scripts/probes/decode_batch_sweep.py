#!/usr/bin/env python
"""On-chip probe: greedy-decode throughput vs batch size.

Question: is the decode scan dominated by per-step fixed cost (weight reads +
per-layer fusion launch latency), i.e. does doubling the batch ~double
captions/s? If yes, serving/eval should prefer wider buckets and the bench
headline should quote the saturated batch.

Run on the real chip: python scripts/probes/decode_batch_sweep.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/pgica_tpu/xla"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

GPT2_VOCAB = 50257 + 5


def main():
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

    tokenizer = CaptionTokenizer()
    model = PreferenceGuidedCaptioningModel(
        vision_model="openai/clip-vit-base-patch32", text_model="gpt2-medium",
        projection_dim=512, tokenizer=tokenizer, max_caption_length=128,
        dtype=jnp.bfloat16, seed=0, vocab_size=GPT2_VOCAB,
    )
    rng = np.random.default_rng(0)
    results = {}
    for bs in (16, 32, 64, 128):
        images = rng.integers(0, 256, size=(bs, 224, 224, 3), dtype=np.uint8)
        try:
            t0 = time.time()
            model.generate_captions(images, max_length=64)  # compile
            print(f"bs={bs} compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
            times = []
            for _ in range(5):
                t0 = time.time()
                caps = model.generate_captions(images, max_length=64)
                times.append(time.time() - t0)
            dt = sorted(times)[len(times) // 2]
            cps = len(caps) / dt
            results[bs] = (dt, cps)
            print(f"bs={bs}: median {dt*1000:.1f} ms of {[round(t*1000) for t in times]} -> {cps:.1f} captions/s")
        except Exception as e:
            print(f"bs={bs} FAILED: {type(e).__name__}: {e}")
            results[bs] = None
    print("\nsummary (batch: ms/call, captions/s):")
    for bs, r in results.items():
        if r:
            print(f"  {bs}: {r[0]*1000:.1f} ms, {r[1]:.1f} cap/s")


if __name__ == "__main__":
    main()
