#!/usr/bin/env python
"""Host input-pipeline throughput: images/sec by worker mode.

Writes N synthetic JPEGs, then measures full-pipeline (decode -> resize ->
normalize -> tokenize -> collate) throughput for inline / thread / process
fetch. The 10x wall-clock target scenario (25K JPEG/epoch feeding a v5e-8 at
~2.4k imgs/s) needs a many-core host: per-core throughput measured here x
cores is the capacity estimate.

Usage: python scripts/bench_loader.py [--images 512] [--batch 64] [--workers 4]
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_dataset(root: Path, n: int, size: int = 384):
    from PIL import Image

    rng = np.random.default_rng(0)
    records = []
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        path = root / f"img_{i}.jpg"
        Image.fromarray(arr).save(path, quality=85)
        records.append({"image_path": f"img_{i}.jpg", "caption": f"a synthetic test image number {i} with details"})
    import json

    (root / "annotations.json").write_text(json.dumps(records))


def run(root: Path, batch: int, num_workers: int, mode: str, native: str = "off") -> float:
    from pgica_tpu.data.loader import ConceptualCaptionsDataset, DataLoader
    from pgica_tpu.data.preprocessing import ImageProcessor, TextProcessor

    ds = ConceptualCaptionsDataset(
        root, ImageProcessor(image_size=224, native_decode=native),
        TextProcessor(max_length=128),
    )
    loader = DataLoader(ds, batch, shuffle=False, num_workers=num_workers, workers_mode=mode)
    n = 0
    t0 = time.perf_counter()
    for b in loader:
        n += b["image"].shape[0]
    dt = time.perf_counter() - t0
    loader.close()
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--size", type=int, default=384, help="source JPEG side")
    ap.add_argument("--native", default="off", choices=("off", "fast"),
                    help="ImageProcessor native_decode mode (native/image.cpp)")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        make_dataset(root, args.images, size=args.size)
        for label, workers, mode in (
            ("inline", 0, "thread"),
            (f"{args.workers} threads", args.workers, "thread"),
            (f"{args.workers} processes", args.workers, "process"),
            (f"{args.workers} grain", args.workers, "grain"),
        ):
            # warmup epoch (page cache), then timed epoch
            run(root, args.batch, workers, mode, native=args.native)
            rate = run(root, args.batch, workers, mode, native=args.native)
            print(f"{label:>14}: {rate:7.1f} images/s")


if __name__ == "__main__":
    main()
