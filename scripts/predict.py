#!/usr/bin/env python
"""Caption prediction CLI (reference scripts/predict.py surface, bugs fixed).

The reference's predict path decoded `generate_captions`' string output as
token ids and called a nonexistent forward mode (SURVEY §2.4.2); this one
works end-to-end:

    python scripts/predict.py --demo
    python scripts/predict.py --image photo.jpg --model-path checkpoints/best_model_stage2
    python scripts/predict.py --image-dir photos/ --output captions.json
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


class CaptionPredictor:
    """Load a (possibly checkpointed) model and caption images."""

    def __init__(self, config, model_path=None):
        from pgica_tpu.utils.factories import create_model, create_processors, create_tokenizer

        self.config = config
        tokenizer = create_tokenizer(config)
        self.image_processor, self.text_processor = create_processors(config, tokenizer)
        self.model = create_model(config, tokenizer)
        if model_path:
            from pgica_tpu.training.checkpoint import CheckpointManager, effective_params

            import jax.numpy as jnp
            import jax

            path = Path(model_path)
            manager = CheckpointManager(path.parent if path.exists() else ".")
            payload = manager.restore(path)
            self.model.params = jax.tree.map(jnp.asarray, effective_params(payload))

    def _generate(self, images):
        gen = self.config.get("evaluation.generate_config", {})
        return self.model.generate_captions(
            images,
            max_length=int(gen.get("max_length", 128)),
            num_beams=int(gen.get("num_beams", 4)),
            temperature=float(gen.get("temperature", 0.8)),
            do_sample=bool(gen.get("do_sample", True)),
            top_p=float(gen.get("top_p", 0.9)),
            repetition_penalty=float(gen.get("repetition_penalty", 1.1)),
            length_penalty=float(gen.get("length_penalty", 1.0)),
            early_stop=bool(gen.get("early_stop", False)),
        )

    def predict_single(self, image_path) -> dict:
        import numpy as np

        t0 = time.perf_counter()
        image = self.image_processor.process_image(image_path)[None]
        caption = self._generate(np.asarray(image))[0]
        return {
            "image_path": str(image_path),
            "caption": caption,
            "latency_ms": (time.perf_counter() - t0) * 1000.0,
        }

    def predict_directory(self, image_dir, batch_size: int = 8) -> list:
        import numpy as np

        exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
        paths = sorted(p for p in Path(image_dir).rglob("*") if p.suffix.lower() in exts)
        results = []
        for start in range(0, len(paths), batch_size):
            chunk = paths[start : start + batch_size]
            images = np.stack([self.image_processor.process_image(p) for p in chunk])
            captions = self._generate(images)
            results.extend(
                {"image_path": str(p), "caption": c} for p, c in zip(chunk, captions)
            )
        return results

    def demo(self) -> dict:
        """Architecture printout + a synthetic-image caption (reference --demo)."""
        import numpy as np

        counts = self.model.num_parameters()
        rng = np.random.default_rng(0)
        size = self.image_processor.image_size
        image = rng.normal(0, 1, (1, size, size, 3)).astype(np.float32)
        caption = self._generate(image)[0]
        return {
            "vision_model": self.config.get("model.vision_model"),
            "text_model": self.config.get("model.text_model"),
            "projection_dim": self.config.get("model.projection_dim"),
            "parameters_total": counts["total"],
            "parameters_trainable": counts["trainable"],
            "demo_caption": caption,
        }


def main():
    p = argparse.ArgumentParser(description="Caption prediction (TPU-native)")
    p.add_argument("--config", type=str, default="configs/default.yaml")
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--image", type=str, default=None)
    p.add_argument("--image-dir", type=str, default=None)
    p.add_argument("--demo", action="store_true")
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from pgica_tpu.utils.config import Config
    from pgica_tpu.utils.factories import enable_compilation_cache

    enable_compilation_cache()
    from pgica_tpu.utils.factories import setup_logging

    config = Config(args.config)

    from pgica_tpu.utils.factories import apply_hardware_rng

    apply_hardware_rng(config)
    setup_logging(None, config.get("logging.level", "INFO"))
    predictor = CaptionPredictor(config, args.model_path)

    if args.demo:
        result = predictor.demo()
    elif args.image:
        result = predictor.predict_single(args.image)
    elif args.image_dir:
        result = predictor.predict_directory(args.image_dir)
    else:
        p.error("Provide --image, --image-dir, or --demo")
        return 1

    text = json.dumps(result, indent=2)
    print(text)
    if args.output:
        Path(args.output).write_text(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
