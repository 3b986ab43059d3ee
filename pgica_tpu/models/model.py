"""Top-level preference-guided captioning model (reference C10, model.py:681-954).

Two layers:

* :class:`PreferenceGuidedCaptioningModule` — the pure Flax module composing
  vision encoder + text encoder + caption decoder, with ``mode`` semantics
  matching the reference forward (contrastive / generation / dual).
* :class:`PreferenceGuidedCaptioningModel` — a thin stateful runtime wrapper
  owning (module, params, tokenizer) and exposing the reference's public API
  (callable forward, ``generate_captions``, ``compute_similarity``) over
  jitted apply functions, so CLIs/eval code read like the reference while the
  compute path is pure JAX.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pgica_tpu.data.tokenizer import CaptionTokenizer
from pgica_tpu.models.decoder import CaptionDecoder
from pgica_tpu.models.encoders import TextEncoder
from pgica_tpu.models.presets import LMConfig, ViTConfig, get_text_config, get_vision_config
from pgica_tpu.models.vit import VisionEncoder
from pgica_tpu.ops.losses import caption_cross_entropy, l2_normalize

logger = logging.getLogger(__name__)


def _sampling_key(seed: int) -> jax.Array:
    from pgica_tpu.core import prng

    return prng.purpose_key(prng.root_key(seed), "sampling")


class PreferenceGuidedCaptioningModule(nn.Module):
    """Composed Flax module: vision tower + text tower + caption decoder."""

    vision_config: ViTConfig
    text_config: LMConfig
    decoder_config: LMConfig
    projection_dim: int = 512
    temperature: float = 0.5
    dropout: float = 0.1
    freeze_vision_backbone: bool = False
    freeze_text_backbone: bool = False
    share_text_tower: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    # Context parallelism for the caption decoder's training forward: see
    # CaptionDecoder.ring_axis. Vision/text towers are NOT sequence-sharded
    # (vision seq = image patches; the text tower is unused in stage 2).
    ring_axis: Optional[str] = None
    # Explicit ZeRO-3 axis for BOTH text-family towers (scan_layers only; run
    # inside parallel/zero3.py's shard_map step). The vision tower's unrolled
    # blocks stay replicated — it is frozen and ~2% of the 8B-scale budget.
    fsdp_axis: Optional[str] = None
    # Inference-only int8 decoder-LM matmuls for the decode/serving path
    # ("int8" W8A8 / "int8_weight_only"); see ops/quant.py. Only used by the
    # quantized twin module the runtime wrapper builds — never for training.
    decoder_quant: Optional[str] = None

    def setup(self):
        self.vision_encoder = VisionEncoder(
            self.vision_config, self.projection_dim, self.dropout,
            freeze_backbone=self.freeze_vision_backbone,
            dtype=self.dtype, attn_impl=self.attn_impl, remat=self.remat,
        )
        shared_lm = None
        if self.share_text_tower and self.ring_axis is not None:
            raise ValueError(
                "ring_axis (context parallelism) requires a dedicated decoder "
                "backbone; share_text_tower would sequence-shard the text "
                "encoder's forward too"
            )
        if self.share_text_tower:
            # One transformer serves as text tower AND decoder backbone,
            # halving the reference's duplicated-GPT-2 parameter budget
            # (SURVEY §2.2); opt-in via model.share_text_tower.
            from pgica_tpu.models.lm import TransformerLM

            shared_lm = TransformerLM(
                self.decoder_config, with_lm_head=True, dtype=self.dtype,
                attn_impl=self.attn_impl, remat=self.remat, name="shared_lm",
            )
        self.text_encoder = TextEncoder(
            self.text_config, self.projection_dim, self.dropout,
            freeze_backbone=self.freeze_text_backbone,
            dtype=self.dtype, attn_impl=self.attn_impl, remat=self.remat,
            shared_backbone=shared_lm, fsdp_axis=self.fsdp_axis,
        )
        if self.decoder_quant and shared_lm is not None:
            raise ValueError("decoder_quant with share_text_tower would quantize "
                             "the training text tower; use a dedicated decoder")
        self.caption_decoder = CaptionDecoder(
            self.decoder_config, self.projection_dim, dropout=self.dropout,
            dtype=self.dtype, attn_impl=self.attn_impl,
            remat=False if self.decoder_quant else self.remat,
            shared_lm=shared_lm, ring_axis=self.ring_axis,
            fsdp_axis=self.fsdp_axis, quant=self.decoder_quant,
        )

    # -- encoders -----------------------------------------------------------------

    def encode_image(self, images: jax.Array, deterministic: bool = True) -> dict:
        return self.vision_encoder(images, deterministic)

    def encode_text(
        self, caption_ids: jax.Array, caption_mask: Optional[jax.Array], deterministic: bool = True
    ) -> dict:
        return self.text_encoder(caption_ids, caption_mask, deterministic)

    # -- decoder passthroughs (generation uses these via apply(method=...)) --------

    def decode_train(
        self,
        caption_ids: jax.Array,
        caption_mask: Optional[jax.Array],
        vision_embeddings: jax.Array,
        deterministic: bool = True,
    ) -> dict:
        return self.caption_decoder(caption_ids, caption_mask, vision_embeddings, deterministic)

    def decode_prefix(self, vision_embeddings, caches, attention_mask):
        return self.caption_decoder.decode_prefix(vision_embeddings, caches, attention_mask)

    def decode_step(self, token_ids, position, caches, attention_mask, vision_embeddings=None):
        return self.caption_decoder.decode_step(
            token_ids, position, caches, attention_mask, vision_embeddings
        )

    # -- main forward (reference model.py:794-851) ----------------------------------

    def __call__(
        self,
        images: jax.Array,
        caption_ids: Optional[jax.Array] = None,
        caption_mask: Optional[jax.Array] = None,
        labels: Optional[jax.Array] = None,
        mode: str = "contrastive",
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        if mode not in ("contrastive", "generation", "dual"):
            raise ValueError(f"Unknown mode: {mode!r}")
        outputs: Dict[str, jax.Array] = {}
        vision = self.encode_image(images, deterministic)

        if mode in ("contrastive", "dual"):
            if caption_ids is None:
                raise ValueError("contrastive mode requires caption_ids")
            text = self.encode_text(caption_ids, caption_mask, deterministic)
            outputs["image_embeddings"] = l2_normalize(vision["embeddings"])
            outputs["text_embeddings"] = l2_normalize(text["embeddings"])

        if mode in ("generation", "dual"):
            if caption_ids is None:
                raise ValueError("generation mode requires caption_ids")
            dec = self.decode_train(caption_ids, caption_mask, vision["embeddings"], deterministic)
            outputs["logits"] = dec["logits"]
            if labels is not None:
                mask = caption_mask if caption_mask is not None else jnp.ones_like(labels)
                outputs["loss"] = caption_cross_entropy(dec["logits"], labels, mask)

        outputs["vision_embeddings"] = vision["embeddings"]
        return outputs

    def compute_similarity(
        self, images: jax.Array, caption_ids: jax.Array, caption_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """(B_img, B_txt) cosine similarity / temperature (reference 925-954)."""
        img = l2_normalize(self.encode_image(images)["embeddings"].astype(jnp.float32))
        txt = l2_normalize(self.encode_text(caption_ids, caption_mask)["embeddings"].astype(jnp.float32))
        return img @ txt.T / self.temperature


def build_module(
    vision_model: str = "openai/clip-vit-base-patch32",
    text_model: str = "gpt2-medium",
    projection_dim: int = 512,
    temperature: float = 0.5,
    dropout: float = 0.1,
    vocab_size: int = 50257,
    max_caption_length: int = 128,
    freeze_vision_backbone: bool = False,
    freeze_text_backbone: bool = False,
    share_text_tower: bool = False,
    dtype: Any = jnp.float32,
    attn_impl: str = "auto",
    remat: bool = False,
    scan_layers: bool = False,
    decoder_quant: Optional[str] = None,
) -> PreferenceGuidedCaptioningModule:
    """Resolve presets and construct the composed module.

    The decoder is a second full copy of the text architecture, matching the
    reference's duplicated GPT-2 (SURVEY §2.2: AutoModel + GPT2LMHeadModel).

    ``scan_layers`` switches both text towers to the stacked/lax.scan block
    layout (ZeRO-3 parameter gathering under an fsdp mesh; see LMConfig).
    """
    vision_config = get_vision_config(vision_model)
    base = get_text_config(text_model)
    max_pos = max(base.max_position_embeddings, max_caption_length + 1)
    text_config = get_text_config(
        text_model, vocab_size=vocab_size, dropout=dropout,
        max_position_embeddings=max_pos, scan_layers=scan_layers,
    )
    decoder_config = text_config
    return PreferenceGuidedCaptioningModule(
        vision_config=vision_config,
        text_config=text_config,
        decoder_config=decoder_config,
        projection_dim=projection_dim,
        temperature=temperature,
        dropout=dropout,
        freeze_vision_backbone=freeze_vision_backbone,
        freeze_text_backbone=freeze_text_backbone,
        share_text_tower=share_text_tower,
        dtype=dtype,
        attn_impl=attn_impl,
        remat=remat,
        decoder_quant=decoder_quant,
    )


class PreferenceGuidedCaptioningModel:
    """Stateful runtime wrapper with the reference's public API (reference C10)."""

    def __init__(
        self,
        vision_model: str = "openai/clip-vit-base-patch32",
        text_model: str = "gpt2-medium",
        projection_dim: int = 512,
        temperature: float = 0.5,
        dropout: float = 0.1,
        freeze_vision_backbone: bool = True,
        freeze_text_backbone: bool = False,
        share_text_tower: bool = False,
        tokenizer: Optional[CaptionTokenizer] = None,
        max_caption_length: int = 128,
        dtype: Any = jnp.float32,
        attn_impl: str = "auto",
        remat: bool = False,
        seed: int = 0,
        image_size: Optional[int] = None,
        lora_config: Optional[Dict[str, Any]] = None,
        vocab_size: Optional[int] = None,
        scan_layers: bool = False,
        quantization: Optional[str] = None,
    ):
        self.tokenizer = tokenizer or CaptionTokenizer.from_pretrained(text_model)
        self.vision_model_name = vision_model
        self.text_model_name = text_model
        self.projection_dim = projection_dim
        self.temperature = temperature
        self.freeze_vision_backbone = freeze_vision_backbone
        self.freeze_text_backbone = freeze_text_backbone
        self.max_caption_length = max_caption_length
        self._build_kwargs = dict(
            vision_model=vision_model,
            text_model=text_model,
            projection_dim=projection_dim,
            temperature=temperature,
            dropout=dropout,
            # ``vocab_size`` may pad the embedding beyond the tokenizer (e.g.
            # benchmarking at GPT-2's 50,257-row budget with a smaller
            # tokenizer, or MXU-friendly multiples); never below it.
            vocab_size=max(vocab_size or 0, self.tokenizer.vocab_size),
            max_caption_length=max_caption_length,
            freeze_vision_backbone=freeze_vision_backbone,
            freeze_text_backbone=freeze_text_backbone,
            share_text_tower=share_text_tower,
            dtype=dtype,
            attn_impl=attn_impl,
            remat=remat,
            scan_layers=scan_layers,
        )
        self.module = build_module(**self._build_kwargs)
        # Decode-time int8 quantization ("int8" W8A8 / "int8_weight_only"):
        # decode runs through a twin module whose decoder-LM matmuls are int8
        # (ops/quant.py); training/encode paths keep the full-precision module.
        from pgica_tpu.ops.quant import INT8_MODES

        if quantization and quantization not in INT8_MODES:
            raise ValueError(f"quantization must be one of {INT8_MODES}, got {quantization!r}")
        self.quantization = quantization
        self.image_size = image_size or self.module.vision_config.image_size
        from pgica_tpu.core import prng

        root = prng.root_key(seed)
        self.params = self.init_params(prng.purpose_key(root, "params"))

        # LoRA (reference model.py:352-394, 543-559 via peft): adapter factors
        # live in a separate tiny pytree; see models/lora.py. `lora_config`
        # uses the normalized schema from lora.normalize_lora_config.
        self.lora_config = lora_config
        self.lora = None
        if lora_config:
            from pgica_tpu.models.lora import init_lora

            if lora_config.get("dropout", 0.0):
                logger.info(
                    "lora_dropout=%s active as per-step adapter-input "
                    "DropConnect (peft drops per token; see "
                    "models/lora.py:apply_lora for the documented deviation)",
                    lora_config["dropout"],
                )
            self.lora = init_lora(
                self.params,
                jax.random.fold_in(prng.purpose_key(root, "params"), 1),
                rank=lora_config["rank"],
                targets=lora_config["targets"],
            )
        from pgica_tpu.data.augment import prepare_images

        self._jit_forward = jax.jit(
            lambda params, images, ids, mask, labels, mode: self.module.apply(
                {"params": params}, prepare_images(images), ids, mask, labels, mode=mode
            ),
            static_argnames=("mode",),
        )
        self._jit_similarity = jax.jit(
            lambda params, images, ids, mask: self.module.apply(
                {"params": params}, prepare_images(images), ids, mask,
                method=self.module.compute_similarity,
            )
        )
        self._jit_encode_image = jax.jit(
            lambda params, images: self.module.apply(
                {"params": params}, prepare_images(images), method=self.module.encode_image
            )
        )
        self._generate_fn = None  # built lazily per generate_config

    def init_params(self, rng: jax.Array) -> dict:
        images = jnp.zeros((1, self.image_size, self.image_size, 3), jnp.float32)
        ids = jnp.zeros((1, self.max_caption_length), jnp.int32)
        mask = jnp.ones_like(ids)
        variables = self.module.init(rng, images, ids, mask, mode="dual")
        return variables["params"]

    # -- reference-parity API ------------------------------------------------------

    def __call__(
        self,
        images,
        caption_ids=None,
        caption_mask=None,
        labels=None,
        mode: str = "contrastive",
    ) -> Dict[str, np.ndarray]:
        images = jnp.asarray(images)
        ids = None if caption_ids is None else jnp.asarray(caption_ids)
        mask = None if caption_mask is None else jnp.asarray(caption_mask)
        lab = None if labels is None else jnp.asarray(labels)
        return self._jit_forward(self.params, images, ids, mask, lab, mode)

    def compute_similarity(self, images, caption_ids, caption_mask=None):
        mask = jnp.ones_like(jnp.asarray(caption_ids)) if caption_mask is None else jnp.asarray(caption_mask)
        return self._jit_similarity(self.params, jnp.asarray(images), jnp.asarray(caption_ids), mask)

    def _inference_params(self):
        """Params pre-cast to the compute dtype for decode.

        Training keeps fp32 masters (precision policy, core/precision.py);
        autoregressive decode is weight-bandwidth-bound at one token per
        step, so reading fp32 masters doubles HBM traffic per step. Cast once
        per params object and cache.
        """
        if self.module.dtype == jnp.float32:
            return self.params
        cached = getattr(self, "_inference_params_cache", None)
        if cached is not None and cached[0] is self.params:
            return cached[1]
        from pgica_tpu.core.precision import cast_floating

        cast = cast_floating(self.params, self.module.dtype)
        self._inference_params_cache = (self.params, cast)
        return cast

    def _decode_module_and_params(self):
        """(module, params) for autoregressive decode.

        With ``quantization`` set this is the int8 twin module plus a
        quantized param tree (built once per params object from the f32
        masters and cached); otherwise the plain module + compute-dtype cast.
        """
        if not self.quantization:
            return self.module, self._inference_params()
        cached = getattr(self, "_quant_cache", None)
        if cached is not None and cached[0] is self.params:
            return cached[1], cached[2]
        from pgica_tpu.ops.quant import quantize_like

        twin = build_module(**{**self._build_kwargs, "decoder_quant": self.quantization})
        images = jnp.zeros((1, self.image_size, self.image_size, 3), jnp.float32)
        ids = jnp.zeros((1, self.max_caption_length), jnp.int32)
        template = jax.eval_shape(
            lambda: twin.init(jax.random.PRNGKey(0), images, ids, jnp.ones_like(ids), mode="dual")
        )["params"]
        cast_rest = None if self.module.dtype == jnp.float32 else self.module.dtype
        qparams = quantize_like(template, self.params, cast_rest=cast_rest)
        logger.info("Quantized decoder params (%s) for decode", self.quantization)
        self._quant_cache = (self.params, twin, qparams)
        return twin, qparams

    def generate_captions(
        self,
        images,
        max_length: int = 128,
        num_beams: int = 1,
        temperature: float = 1.0,
        do_sample: bool = False,
        top_p: float = 1.0,
        repetition_penalty: float = 1.0,
        length_penalty: float = 1.0,
        seed: int = 0,
        early_stop: bool = False,
    ) -> List[str]:
        """Encode images, autoregressively decode, detokenize.

        Mirrors the reference surface and its phase-timing logs
        (reference model.py:855-923). ``early_stop=True`` ends the greedy/
        sampling decode loop once every caption in the batch hit EOS
        (token-identical, data-dependent latency — the serving default).
        """
        from pgica_tpu.generation.decode import generate

        params = self._inference_params()
        decode_module, decode_params = self._decode_module_and_params()
        images = jnp.asarray(images)
        t0 = time.perf_counter()
        # No sync between encode and decode: both dispatches chain on device
        # (a host round-trip between them costs ~1 RTT per call; phase times
        # below are enqueue-side, only the total is a true wall-clock).
        vision = self._jit_encode_image(params, images)
        t_encode = time.perf_counter() - t0

        t0 = time.perf_counter()
        token_ids = generate(
            decode_module,
            decode_params,
            vision["embeddings"],
            bos_token_id=self.tokenizer.bos_token_id,
            eos_token_id=self.tokenizer.eos_token_id,
            pad_token_id=self.tokenizer.pad_token_id,
            max_length=max_length,
            num_beams=num_beams,
            temperature=temperature,
            do_sample=do_sample,
            top_p=top_p,
            repetition_penalty=repetition_penalty,
            length_penalty=length_penalty,
            rng=_sampling_key(seed),
            early_stop=early_stop,
        )
        token_ids = np.asarray(token_ids)
        t_generate = time.perf_counter() - t0

        t0 = time.perf_counter()
        captions = [self.tokenizer.decode(row) for row in token_ids]
        t_decode = time.perf_counter() - t0
        logger.info(
            "generate_captions: encode %.3fs generate %.3fs decode %.3fs (%.1f ms/caption)",
            t_encode, t_generate, t_decode,
            1000.0 * (t_encode + t_generate + t_decode) / max(1, len(captions)),
        )
        return captions

    def load_pretrained_towers(
        self, vision_path: Optional[str] = None, text_path: Optional[str] = None,
        decoder_path: Optional[str] = None,
    ) -> None:
        """Import weights from LOCAL HF checkpoints (offline) via models/convert.

        ``vision_path`` -> CLIPVisionModel directory; ``text_path`` -> GPT-2 or
        Llama directory for the text tower; ``decoder_path`` (defaults to
        text_path) -> decoder LM. Projection heads / cross-attention stay at
        their initialization (they have no reference-side pretrained weights).
        """
        from pgica_tpu.models import convert as C

        def _state_dict(path):
            import torch

            p = Path(path)
            for name in ("pytorch_model.bin", "model.safetensors"):
                f = p / name
                if f.exists():
                    if f.suffix == ".bin":
                        return torch.load(f, map_location="cpu", weights_only=True)
                    from safetensors.torch import load_file

                    return load_file(str(f))
            raise FileNotFoundError(f"No torch checkpoint in {path}")

        params = jax.tree.map(lambda x: x, self.params)  # shallow copy of dict tree
        if vision_path:
            converted = C.convert_clip_vision(_state_dict(vision_path), self.module.vision_config)
            C.assert_tree_shapes(converted, params["vision_encoder"]["backbone"], "vision")
            params["vision_encoder"]["backbone"] = jax.tree.map(jnp.asarray, converted)
        if text_path:
            conv = C.convert_llama if self.module.text_config.arch == "llama" else C.convert_gpt2
            converted = conv(_state_dict(text_path), self.module.text_config)
            existing = params["shared_lm"] if "shared_lm" in params else params["text_encoder"]["backbone"]
            converted = C.pad_vocab_rows(converted, existing, "text")
            C.assert_tree_shapes(converted, existing, "text")
            converted = jax.tree.map(jnp.asarray, converted)
            if "shared_lm" in params:
                params["shared_lm"] = converted
            else:
                params["text_encoder"]["backbone"] = converted
        dec_path = decoder_path or text_path
        if dec_path and "shared_lm" not in params:
            conv = C.convert_llama if self.module.decoder_config.arch == "llama" else C.convert_gpt2
            converted = conv(_state_dict(dec_path), self.module.decoder_config)
            converted = C.pad_vocab_rows(converted, params["caption_decoder"]["lm"], "decoder")
            C.assert_tree_shapes(converted, params["caption_decoder"]["lm"], "decoder")
            params["caption_decoder"]["lm"] = jax.tree.map(jnp.asarray, converted)
        self.params = params
        logger.info("Loaded pretrained towers (vision=%s text=%s)", vision_path, text_path)

    # -- introspection ----------------------------------------------------------------

    def num_parameters(self) -> Dict[str, int]:
        def count(tree) -> int:
            return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))

        per = {name: count(sub) for name, sub in self.params.items()}
        per["total"] = count(self.params)
        if self.lora is not None:
            from pgica_tpu.models.lora import count_lora_params

            per["lora"] = count_lora_params(self.lora)
            per["trainable"] = per["lora"]  # base is frozen under LoRA
            return per
        frozen = 0
        if self.freeze_vision_backbone:
            frozen += count(self.params["vision_encoder"].get("backbone", {}))
        if self.freeze_text_backbone:
            frozen += count(
                self.params["text_encoder"].get("backbone", self.params.get("shared_lm", {}))
            )
        per["trainable"] = per["total"] - frozen
        return per
