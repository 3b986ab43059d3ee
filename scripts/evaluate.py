#!/usr/bin/env python
"""Split evaluation CLI — the working version of the reference's dead
``scripts/evaluate.py`` (SURVEY §2.4.1: the reference's imports a nonexistent
class and miscalls every API; BASELINE names it in the preserved surface).

    python scripts/evaluate.py --config configs/default.yaml --split test
    python scripts/evaluate.py --model-path checkpoints/best_model_stage2 --max-samples 64 --output metrics.json
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


class ModelEvaluator:
    def __init__(self, config, model_path=None, output_dir="./eval_outputs"):
        from pgica_tpu.evaluation.runner import EvaluationRunner
        from pgica_tpu.utils.factories import (
            create_metrics,
            create_model,
            create_processors,
            create_tokenizer,
        )

        self.config = config
        tokenizer = create_tokenizer(config)
        self.image_processor, self.text_processor = create_processors(config, tokenizer)
        self.model = create_model(config, tokenizer)
        if model_path:
            import jax
            import jax.numpy as jnp

            from pgica_tpu.training.checkpoint import CheckpointManager, effective_params

            payload = CheckpointManager(Path(model_path).parent).restore(model_path)
            self.model.params = jax.tree.map(jnp.asarray, effective_params(payload))
        self.runner = EvaluationRunner(
            self.model, config, create_metrics(config, self.model), output_dir
        )

    def evaluate_split(self, split: str = "test", max_samples=None) -> dict:
        from pgica_tpu.utils.factories import create_loaders_with_fallback

        loaders = dict(
            zip(
                ("train", "val", "test"),
                create_loaders_with_fallback(
                    self.config, self.image_processor, self.text_processor, kind="conceptual"
                ),
            )
        )
        loader = loaders[split]
        max_batches = None
        if max_samples:
            max_batches = max(1, max_samples // loader.batch_size)
        return self.runner.run_evaluation(loader, max_batches=max_batches)


def main():
    p = argparse.ArgumentParser(description="Caption model evaluation (TPU-native)")
    p.add_argument("--config", type=str, default="configs/default.yaml")
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--split", type=str, default="test", choices=["train", "val", "test"])
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--output-dir", type=str, default="./eval_outputs")
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

    evaluator = ModelEvaluator(config, args.model_path, args.output_dir)
    result = evaluator.evaluate_split(args.split, args.max_samples)
    text = json.dumps(
        {"num_samples": result["num_samples"],
         "metrics": {k: float(v) for k, v in result["metrics"].items()}},
        indent=2,
    )
    print(text)
    if args.output:
        Path(args.output).write_text(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
