#!/usr/bin/env python
"""Comprehensive evaluation CLI (reference scripts/run_evaluation.py:405-453).

Runs the EvaluationRunner over conceptual and/or preference test data,
compares metrics against config targets (lower-is-better for ``*_ms``),
writes a structured ``evaluation_report.json`` with caption-quality /
preference / diversity / efficiency sections, and logs to MLflow when
available.

    python scripts/run_evaluation.py --checkpoint checkpoints/best_model_stage2 --dataset both
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def compare_with_targets(metrics: dict, targets: dict) -> dict:
    """Target comparison with lower-is-better for latency (reference 284-314)."""
    comparison = {}
    for name, target in targets.items():
        actual = metrics.get(name)
        if actual is None:
            comparison[name] = {"target": target, "actual": None, "met": None}
            continue
        lower_is_better = name.endswith("_ms") or "_ms_" in name or "latency" in name
        met = actual <= target if lower_is_better else actual >= target
        comparison[name] = {
            "target": float(target),
            "actual": float(actual),
            "met": bool(met),
        }
    return comparison


def generate_evaluation_report(results: dict, targets: dict) -> dict:
    """Structured report (reference run_evaluation.py:317-402)."""
    metrics = results["metrics"]

    def section(prefixes):
        return {
            k: float(v)
            for k, v in metrics.items()
            if any(k.startswith(p) or k == p for p in prefixes)
        }

    return {
        "num_samples": results["num_samples"],
        "caption_quality": section(
            ("bleu", "rouge", "meteor", "cider_score", "bert_score", "clip_score")
        ),
        "preference_alignment": section(("preference", "avg_preferred", "avg_rejected", "human_preference")),
        "diversity": section(("distinct", "unique")),
        "efficiency": section(("latency",)),
        "target_comparison": compare_with_targets(metrics, targets),
    }


def run_comprehensive_evaluation(config, model, dataset: str, output_dir: Path, max_samples=None) -> dict:
    from pgica_tpu.evaluation.runner import EvaluationRunner
    from pgica_tpu.utils.factories import (
        create_loaders_with_fallback,
        create_metrics,
        create_processors,
    )

    image_processor, text_processor = create_processors(config, model.tokenizer)
    datasets = ["conceptual", "ultrafeedback"] if dataset == "both" else [dataset]
    reports = {}
    for name in datasets:
        _, _, test_loader = create_loaders_with_fallback(
            config, image_processor, text_processor, kind=name
        )
        runner = EvaluationRunner(
            model, config, create_metrics(config, model), output_dir / name
        )
        max_batches = None
        if max_samples:
            max_batches = max(1, max_samples // test_loader.batch_size)
        results = runner.run_evaluation(test_loader, max_batches=max_batches)
        reports[name] = generate_evaluation_report(results, config.get_targets())

        try:  # optional MLflow logging (reference run_evaluation.py:532-535)
            import mlflow

            with mlflow.start_run(run_name=f"eval_{name}"):
                mlflow.log_metrics(
                    {k: float(v) for k, v in results["metrics"].items() if isinstance(v, (int, float))}
                )
        except Exception:
            pass

    combined = {"datasets": reports}
    if len(reports) > 1:  # combined multi-dataset summary (reference 537-550)
        met_flags = [
            c["met"]
            for r in reports.values()
            for c in r["target_comparison"].values()
            if c["met"] is not None
        ]
        combined["summary"] = {
            "targets_met": sum(met_flags),
            "targets_total": len(met_flags),
        }
    return combined


def main():
    p = argparse.ArgumentParser(description="Comprehensive caption evaluation (TPU-native)")
    p.add_argument("--config", type=str, default="configs/default.yaml")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument(
        "--dataset", type=str, default="conceptual",
        choices=["conceptual", "ultrafeedback", "both"],
    )
    p.add_argument("--output-dir", type=str, default="./eval_outputs")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from pgica_tpu.utils.config import Config
    from pgica_tpu.utils.factories import enable_compilation_cache

    enable_compilation_cache()
    from pgica_tpu.utils.factories import create_model, create_tokenizer, setup_logging

    config = Config(args.config)

    from pgica_tpu.utils.factories import apply_hardware_rng

    apply_hardware_rng(config)
    setup_logging(None, config.get("logging.level", "INFO"))

    tokenizer = create_tokenizer(config)
    model = create_model(config, tokenizer)
    if args.checkpoint:
        import jax
        import jax.numpy as jnp

        from pgica_tpu.training.checkpoint import CheckpointManager, effective_params

        payload = CheckpointManager(Path(args.checkpoint).parent).restore(args.checkpoint)
        model.params = jax.tree.map(jnp.asarray, effective_params(payload))

    output_dir = Path(args.output_dir)
    report = run_comprehensive_evaluation(config, model, args.dataset, output_dir, args.max_samples)
    output_dir.mkdir(parents=True, exist_ok=True)
    report_path = output_dir / "evaluation_report.json"
    report_path.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    print(f"\nReport written to {report_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
