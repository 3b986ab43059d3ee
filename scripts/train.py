#!/usr/bin/env python
"""Two-stage training CLI (reference scripts/train.py:253-294 surface).

Usage:
    python scripts/train.py --config configs/default.yaml --stage 1
    python scripts/train.py --config configs/default.yaml --stage all --output-dir outputs
    python scripts/train.py --config configs/default.yaml --dry-run
    python scripts/train.py --config configs/default.yaml --resume checkpoints/checkpoint_stage1_epoch3

Missing dataset paths fall back to in-memory dummy data (reference parity),
so a smoke run needs no dataset setup.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_args():
    p = argparse.ArgumentParser(description="Preference-guided captioning training (TPU-native)")
    p.add_argument("--config", type=str, default="configs/default.yaml")
    p.add_argument("--stage", type=str, default="all", choices=["1", "2", "all"])
    p.add_argument("--resume", type=str, default=None, help="checkpoint path to resume from")
    p.add_argument("--output-dir", type=str, default=None)
    p.add_argument("--dry-run", action="store_true", help="validate config/model/data then exit")
    p.add_argument("--log-level", type=str, default=None)
    p.add_argument("--platform", type=str, default=None, help="force jax platform (cpu/tpu)")
    p.add_argument("--max-steps", type=int, default=None, help="debug: cap steps per epoch")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler trace of early train steps to this dir")
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from pgica_tpu.utils.config import Config
    from pgica_tpu.utils.factories import enable_compilation_cache

    enable_compilation_cache()
    from pgica_tpu.utils.factories import (
        create_loaders_with_fallback,
        create_mesh,
        create_model,
        create_processors,
        create_tokenizer,
        set_seed,
        setup_logging,
    )

    config = Config(args.config)

    from pgica_tpu.utils.factories import apply_hardware_rng

    apply_hardware_rng(config)
    if args.output_dir:
        config.set("paths.output_dir", args.output_dir)
        config.set("paths.checkpoint_dir", str(Path(args.output_dir) / "checkpoints"))
    if args.log_level:
        config.set("logging.level", args.log_level)
    setup_logging(config.get("paths.log_dir", "./logs"), config.get("logging.level", "INFO"))

    import logging

    logger = logging.getLogger("train")
    seed = config.get("training.seed", 42)
    set_seed(seed)

    tokenizer = create_tokenizer(config)
    image_processor, text_processor = create_processors(config, tokenizer)

    logger.info("Building model (%s + %s)...", config.get("model.vision_model"), config.get("model.text_model"))
    model = create_model(config, tokenizer)
    counts = model.num_parameters()
    logger.info(
        "Model: %.1fM total / %.1fM trainable parameters",
        counts["total"] / 1e6, counts["trainable"] / 1e6,
    )

    need_stage1 = args.stage in ("1", "all")
    need_stage2 = args.stage in ("2", "all") and config.get("training.stage2.num_epochs", 0) > 0
    train_loader = val_loader = pref_train = pref_val = None
    if need_stage1:
        train_loader, val_loader, _ = create_loaders_with_fallback(
            config, image_processor, text_processor, kind="conceptual"
        )
    if need_stage2:
        pref_train, pref_val, _ = create_loaders_with_fallback(
            config, image_processor, text_processor, kind="ultrafeedback"
        )

    if args.dry_run:
        logger.info("Dry run OK: config valid, model built, loaders ready "
                    "(stage1 batches=%s, stage2 batches=%s)",
                    len(train_loader) if train_loader else 0,
                    len(pref_train) if pref_train else 0)
        return 0

    mesh = create_mesh(config)
    from pgica_tpu.training.trainer import PreferenceGuidedTrainer

    trainer = PreferenceGuidedTrainer(
        model,
        config,
        train_loader=train_loader,
        val_loader=val_loader,
        preference_train_loader=pref_train,
        preference_val_loader=pref_val,
        mesh=mesh,
        output_dir=config.get("paths.output_dir", "./outputs"),
        profile_dir=args.profile_dir,
        max_steps_per_epoch=args.max_steps,
    )
    if args.resume:
        trainer.load_checkpoint(args.resume)

    if args.stage == "1":
        results = {"stage1": trainer.train_stage1()}
    elif args.stage == "2":
        results = {"stage2": trainer.train_stage2()}
    else:
        results = trainer.train()

    out_dir = Path(config.get("paths.output_dir", "./outputs"))
    config.save(out_dir / "config_snapshot.yaml")
    logger.info("Training complete: %s", {
        k: v.get("best_val_loss") if isinstance(v, dict) else v for k, v in results.items()
    })
    return 0


if __name__ == "__main__":
    sys.exit(main())
