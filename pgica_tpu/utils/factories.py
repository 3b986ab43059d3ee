"""Shared factories for the CLI scripts (reference scripts/train.py:36-250).

Covers logging setup, seeding, tokenizer/model/processor construction from a
Config, mesh creation, and dataset construction with the reference's
dummy-data fallback (train.py:141-151, 194-250): when a configured data path
does not exist, an in-memory synthetic dataset is substituted so every CLI is
runnable out of the box.
"""

from __future__ import annotations

import logging
import random
import sys
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DUMMY_CAPTION_PARTS = (
    ("a", "the", "one"),
    ("red", "blue", "green", "small", "large", "old", "young"),
    ("bird", "dog", "cat", "car", "house", "tree", "person", "boat"),
    ("sitting on", "standing near", "moving past", "resting under"),
    ("a branch", "the beach", "a table", "the street", "a mountain"),
)


def setup_logging(log_dir: Optional[str] = None, level: str = "INFO", filename: str = "training.log"):
    handlers = [logging.StreamHandler(sys.stdout)]
    if log_dir:
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        handlers.append(logging.FileHandler(Path(log_dir) / filename))
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=handlers,
        force=True,
    )


def set_seed(seed: int = 42):
    random.seed(seed)
    np.random.seed(seed)


def enable_compilation_cache():
    """Persistent XLA compile cache (first TPU compile of the big graphs can
    take minutes over a remote tunnel; later runs start hot)."""
    import os

    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path.home() / ".cache" / "pgica_tpu" / "xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # pragma: no cover
        logger.debug("compilation cache unavailable: %s", e)


def resolve_dtype(config):
    from pgica_tpu.core.precision import compute_dtype

    return compute_dtype(config.get("hardware.mixed_precision", "no"))


def apply_hardware_rng(config):
    """Apply ``hardware.rng`` (rbg = TPU hardware RNG, +13% stage-1 measured)."""
    from pgica_tpu.core.precision import configure_rng

    configure_rng(config.get("hardware.rng", "threefry"))


def create_tokenizer(config):
    """Tokenizer resolution: local HF artifacts > dataset-trained BPE > byte fallback.

    Setting ``data.bpe_vocab_size`` trains a byte-level BPE on the configured
    caption corpus (cached under paths.cache_dir keyed by corpus+size), giving
    from-scratch runs a meaningful subword vocabulary instead of raw bytes.
    """
    from pgica_tpu.data.tokenizer import CaptionTokenizer

    name = config.get("model.text_model", "gpt2-medium")
    if Path(str(name)).is_dir():  # local HF artifacts win
        return CaptionTokenizer.from_pretrained(name)

    vocab_size = config.get("data.bpe_vocab_size")
    data_path = Path(config.get("data.conceptual_captions_path", ""))
    if vocab_size and data_path.exists():
        import hashlib

        cache_root = Path(config.get("paths.cache_dir", "./cache"))
        key = hashlib.sha1(f"{data_path.resolve()}|{vocab_size}".encode()).hexdigest()[:12]
        cache_dir = cache_root / f"bpe_{vocab_size}_{key}"
        if (cache_dir / "vocab.json").exists():
            logger.info("Loading cached dataset BPE from %s", cache_dir)
            return CaptionTokenizer.load(cache_dir)
        corpus = read_caption_corpus(data_path)
        if corpus:
            logger.info(
                "Training %d-entry BPE on %d captions from %s", vocab_size, len(corpus), data_path
            )
            tok = CaptionTokenizer.train_bpe(corpus, vocab_size=int(vocab_size))
            tok.save(cache_dir)
            return tok
    return CaptionTokenizer.from_pretrained(name)


def read_caption_corpus(data_path) -> list:
    """Caption strings from a CSV/TSV/JSON/directory dataset (index only)."""
    from pgica_tpu.data.loader import ConceptualCaptionsDataset

    try:
        ds = ConceptualCaptionsDataset.__new__(ConceptualCaptionsDataset)
        ds.data_path = Path(data_path)
        ds.max_samples = None
        records = ds._load_index()
        return [r["caption"] for r in records]
    except Exception as e:
        logger.warning("Could not read caption corpus from %s: %s", data_path, e)
        return []


def resolve_attn_impl(config) -> str:
    enabled = config.get("pallas.enabled", "auto")
    if enabled in (False, "false", "off", 0):
        return "xla"
    return "auto"  # pallas on TPU when shapes qualify, XLA otherwise


def create_model(config, tokenizer=None, seed: Optional[int] = None):
    from pgica_tpu.models import PreferenceGuidedCaptioningModel
    from pgica_tpu.models.lora import normalize_lora_config

    tokenizer = tokenizer or create_tokenizer(config)
    return PreferenceGuidedCaptioningModel(
        lora_config=normalize_lora_config(config.get("model.lora_config")),
        vocab_size=config.get("model.vocab_size"),
        vision_model=config.get("model.vision_model", "openai/clip-vit-base-patch32"),
        text_model=config.get("model.text_model", "gpt2-medium"),
        projection_dim=config.get("model.projection_dim", 512),
        temperature=config.get("model.temperature", 0.5),
        dropout=config.get("model.dropout", 0.1),
        freeze_vision_backbone=config.get("model.freeze_vision_backbone", True),
        freeze_text_backbone=config.get("model.freeze_text_backbone", False),
        share_text_tower=config.get("model.share_text_tower", False),
        tokenizer=tokenizer,
        max_caption_length=config.get("data.max_caption_length", 128),
        dtype=resolve_dtype(config),
        attn_impl=resolve_attn_impl(config),
        remat=bool(config.get("hardware.gradient_checkpointing", False)),
        seed=seed if seed is not None else config.get("training.seed", 42),
        image_size=config.get("data.image_size", None),
        # stacked-block lax.scan layout; with mesh.fsdp > 1 this is ZeRO-3
        # (per-layer weight gathers inside the scan body; see LMConfig)
        scan_layers=bool(config.get("model.scan_layers", False)),
        # decode-time int8 ("int8" W8A8 | "int8_weight_only"); training
        # precision is unaffected (ops/quant.py — inference-only transform)
        quantization=config.get("inference.quantization") or None,
    )


def create_processors(config, tokenizer=None):
    from pgica_tpu.data.preprocessing import ImageProcessor, TextProcessor

    tokenizer = tokenizer or create_tokenizer(config)
    image_processor = ImageProcessor(
        image_size=config.get("data.image_size", 224),
        # uint8 wire format: loaders ship raw uint8, normalization happens on
        # device (augment.prepare_images) — 4x less host->device transfer.
        # Every consumer (train steps, generate_captions, compute_similarity)
        # accepts either dtype. serve.py forces this on regardless.
        device_side_normalization=bool(
            config.get("data.device_side_normalization", False)
        ),
        # "fast" = one-call libjpeg decode + triangle resize with DCT-domain
        # pre-scaling (native/image.cpp; ~3x on large photos, PIL fallback)
        native_decode=str(config.get("data.native_decode", "off")),
    )
    text_processor = TextProcessor(
        tokenizer=tokenizer, max_length=config.get("data.max_caption_length", 128)
    )
    return image_processor, text_processor


def create_metrics(config, model=None):
    """CaptioningMetrics wired from config:

    * ``evaluation.clip_judge_checkpoint`` — checkpoint dir of an INDEPENDENT
      contrastive model used as the CLIP-Score judge (reference loads a second
      frozen CLIP, metrics.py:380-439). Self-scoring (flagged
      ``clip_score_self_judged``) is the fallback.
    * ``evaluation.bert_score_model_path`` — local HF encoder checkpoint for
      real BERTScore embeddings; proxies (flagged) otherwise.
    * ``evaluation.wordnet_path`` — nltk data directory (real wordnet corpus)
      or JSON synonym table enabling METEOR's synonym stage (reference
      metrics.py:311-338); without it the stage is a flagged no-op.
    """
    from pgica_tpu.evaluation.metrics import CaptioningMetrics

    clip_judge = None
    judge_ckpt = config.get("evaluation.clip_judge_checkpoint")
    if judge_ckpt and Path(str(judge_ckpt)).exists():
        import jax
        import jax.numpy as jnp

        from pgica_tpu.training.checkpoint import CheckpointManager, effective_params

        try:
            clip_judge = create_model(config)
            payload = CheckpointManager(Path(judge_ckpt).parent).restore(judge_ckpt)
            clip_judge.params = jax.tree.map(jnp.asarray, effective_params(payload))
            logger.info("CLIP-Score judge restored from %s", judge_ckpt)
        except Exception as e:
            logger.warning("clip_judge_checkpoint unusable (%s); self-scoring", e)
            clip_judge = None
    bert_path = config.get("evaluation.bert_score_model_path")
    if bert_path and not Path(str(bert_path)).exists():
        logger.warning("bert_score_model_path %s not found; proxy BERTScore", bert_path)
        bert_path = None
    wordnet_path = config.get("evaluation.wordnet_path")
    if wordnet_path and not Path(str(wordnet_path)).exists():
        logger.warning("wordnet_path %s not found; METEOR synonym stage off", wordnet_path)
        wordnet_path = None
    return CaptioningMetrics(
        model=model, clip_judge=clip_judge, bert_model_path=bert_path,
        wordnet_path=wordnet_path,
    )


def create_mesh(config):
    from pgica_tpu.parallel.mesh import MeshContext

    return MeshContext.from_config(config)


# ------------------------------------------------------------------ dummy data


def _dummy_caption(rng: np.random.Generator) -> str:
    return " ".join(rng.choice(part) for part in _DUMMY_CAPTION_PARTS)


def _caption_image(caption: str, size: int, rng: np.random.Generator) -> np.ndarray:
    """Render a caption-CONDITIONED synthetic image.

    Each word deterministically paints a colored block (hash -> color +
    position), so image content is a compositional function of the caption
    and the contrastive image<->text task is genuinely learnable — with pure
    noise images (round-1 behavior) NT-Xent is unlearnable memorization and
    smoke/learning-curve runs sit at ln(B) forever.
    """
    import hashlib

    img = 0.35 * rng.normal(0, 1, (size, size, 3)).astype(np.float32)
    block = max(size // 6, 4)
    for word in caption.split():
        h = int(hashlib.sha1(word.encode()).hexdigest()[:12], 16)
        color = np.array([(h >> 8) & 255, (h >> 16) & 255, (h >> 24) & 255], np.float32)
        color = (color / 127.5) - 1.0  # [-1, 1]
        x = h % max(size - block, 1)
        y = (h >> 5) % max(size - block, 1)
        img[y : y + block, x : x + block] += 2.0 * color
    return img


class DummyConceptualDataset:
    """In-memory synthetic (image, caption) data (reference train.py:194-250).

    Images are rendered FROM the captions (see _caption_image) so contrastive
    training on the fallback data actually converges.
    """

    def __init__(self, image_processor, text_processor, num_samples: int = 64, seed: int = 0):
        rng = np.random.default_rng(seed)
        size = image_processor.image_size
        self.captions = [_dummy_caption(rng) for _ in range(num_samples)]
        self.images = np.stack([_caption_image(c, size, rng) for c in self.captions])
        self.text_processor = text_processor

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, i):
        enc = self.text_processor.encode_caption(self.captions[i])
        return {
            "image": self.images[i],
            "caption_ids": enc["input_ids"],
            "caption_mask": enc["attention_mask"],
            "raw_caption": self.captions[i],
            "image_path": f"dummy_{i}.jpg",
        }


class DummyPreferenceDataset:
    """In-memory synthetic preference pairs."""

    def __init__(self, image_processor, text_processor, num_samples: int = 64, seed: int = 0):
        rng = np.random.default_rng(seed)
        size = image_processor.image_size
        self.preferred = [_dummy_caption(rng) for _ in range(num_samples)]
        self.rejected = [" ".join(_dummy_caption(rng).split()[:2]) for _ in range(num_samples)]
        # image matches the PREFERRED caption (the DPO-favored description)
        self.images = np.stack([_caption_image(c, size, rng) for c in self.preferred])
        self.text_processor = text_processor

    def __len__(self):
        return len(self.preferred)

    def __getitem__(self, i):
        p = self.text_processor.encode_caption(self.preferred[i])
        r = self.text_processor.encode_caption(self.rejected[i])
        return {
            "image": self.images[i],
            "preferred_ids": p["input_ids"],
            "preferred_mask": p["attention_mask"],
            "rejected_ids": r["input_ids"],
            "rejected_mask": r["attention_mask"],
            "preference_score": np.float32(0.9),
            "raw_preferred": self.preferred[i],
            "raw_rejected": self.rejected[i],
            "image_path": f"dummy_{i}.jpg",
        }


def create_loaders_with_fallback(
    config, image_processor, text_processor, kind: str = "conceptual",
    dummy_samples: Optional[int] = None,
) -> Tuple:
    """(train, val, test) loaders from real data, or the dummy fallback."""
    from pgica_tpu.data.loader import (
        ConceptualCaptionsDataset,
        DataLoader,
        UltraFeedbackDataset,
        create_dataloaders,
    )

    if kind == "conceptual":
        data_path = Path(config.get("data.conceptual_captions_path", ""))
        dataset_class = ConceptualCaptionsDataset
        batch_size = config.get("training.stage1.batch_size", 8)
    else:
        data_path = Path(config.get("data.ultrafeedback_path", ""))
        dataset_class = UltraFeedbackDataset
        batch_size = config.get("training.stage2.batch_size", 8)

    seed = config.get("training.seed", 42)
    if data_path and data_path.exists():
        return create_dataloaders(
            dataset_class,
            data_path,
            image_processor,
            text_processor,
            batch_size=batch_size,
            train_split=config.get("data.train_split", 0.8),
            val_split=config.get("data.val_split", 0.1),
            test_split=config.get("data.test_split", 0.1),
            seed=seed,
            num_workers=config.get("data.num_workers", 0),
            workers_mode=config.get("data.workers_mode", "thread"),
        )

    logger.warning("Data path %s not found; using in-memory dummy %s data", data_path, kind)
    if dummy_samples is None:
        dummy_samples = int(config.get("data.dummy_samples", 64))
    dummy_cls = DummyConceptualDataset if kind == "conceptual" else DummyPreferenceDataset
    n_val = max(dummy_samples // 8, batch_size)
    train = dummy_cls(image_processor, text_processor, dummy_samples, seed)
    val = dummy_cls(image_processor, text_processor, n_val, seed + 1)
    test = dummy_cls(image_processor, text_processor, n_val, seed + 2)
    return (
        DataLoader(train, batch_size, shuffle=True, drop_last=True, seed=seed),
        DataLoader(val, batch_size),
        DataLoader(test, batch_size),
    )
