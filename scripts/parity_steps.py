#!/usr/bin/env python
"""Step-level numerical parity: pgica_tpu training dynamics vs the reference's
torch training math.

Runs N stage-1 (contrastive) and N stage-2 (preference) OPTIMIZER STEPS in two
independent frameworks from IDENTICAL initialization and IDENTICAL synthetic
batches, and compares the per-step loss trajectories:

* **torch side** — a from-scratch re-implementation of the reference's
  training formulas on HF towers: symmetric InfoNCE with temperature
  (reference models/model.py:957-1000), reference-free length-normalized
  preference loss (reference models/model.py:1003-1085), AdamW over
  ``model.parameters()`` with betas (0.9, 0.999) / eps 1e-8 / weight decay
  (reference training/trainer.py:274-281), ``get_cosine_schedule_with_warmup``
  (trainer.py:284-289), and ``clip_grad_norm_`` (trainer.py:510-515). The
  composed architecture mirrors the reference exactly: frozen CLIP vision
  tower + projection head on ``pooler_output`` (model.py:220-243), GPT-2 text
  tower + masked mean pool (clamp-min-1) + projection head (model.py:402-474),
  and a GPT-2-LM caption decoder with Linear-Tanh vision projection, 8-head
  single-KV-token cross-attention, residual + LayerNorm (model.py:505-610).

* **pgica_tpu side** — this framework's real training machinery:
  :func:`pgica_tpu.training.train_step.make_stage1_train_step` /
  ``make_stage2_train_step`` over
  :func:`pgica_tpu.training.optim.create_optimizer`, with the initial weights
  imported from the torch model via :mod:`pgica_tpu.models.convert`.

Matching trajectories prove the TRAINING DYNAMICS are equivalent — init,
forward, loss, gradients, clipping, AdamW, and LR schedule all agree — which
is the strongest caption-quality-parity evidence obtainable without the
pretrained gpt2-medium/CLIP weights (offline; see VERDICT r2 item 1).

Usage:
    python scripts/parity_steps.py [--steps 20] [--out results/PARITY_steps.json]

tests/test_step_parity.py runs the same harness at fewer steps in the fast
test gate.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

# -- geometry of the tiny parity model (both sides) -----------------------------
HIDDEN = 32
LAYERS = 2
HEADS = 2
CROSS_HEADS = 8  # reference model.py:528-533 hardcodes 8
PROJ_DIM = 16
IMAGE = 32
PATCH = 8
SEQ = 12
BATCH = 4
TEMPERATURE = 0.5  # reference configs/default.yaml:21
BETA = 0.1  # reference configs/default.yaml:54
WEIGHT_DECAY = 0.01
CLIP_NORM = 1.0
WARMUP = 2
LR_STAGE1 = 5e-4  # scaled up from the reference's 5e-5 so N steps move losses
LR_STAGE2 = 1e-4  # measurably (pure scale; the math is identical)


# =============================== torch side ====================================


def build_torch_reference(vocab_size: int, seed: int = 0):
    """The reference's composed architecture on HF towers, torch-random init."""
    import torch
    from torch import nn
    from transformers import CLIPVisionConfig, CLIPVisionModel, GPT2Config, GPT2LMHeadModel, GPT2Model

    torch.manual_seed(seed)

    class TorchReference(nn.Module):
        def __init__(self):
            super().__init__()
            self.vision = CLIPVisionModel(
                CLIPVisionConfig(
                    hidden_size=HIDDEN, intermediate_size=4 * HIDDEN,
                    num_hidden_layers=LAYERS, num_attention_heads=HEADS,
                    image_size=IMAGE, patch_size=PATCH, attention_dropout=0.0,
                )
            )
            gpt2_cfg = GPT2Config(
                vocab_size=vocab_size, n_positions=64, n_embd=HIDDEN,
                n_layer=LAYERS, n_head=HEADS,
                resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
            )
            self.text = GPT2Model(gpt2_cfg)  # reference AutoModel (model.py:311)
            self.decoder_lm = GPT2LMHeadModel(gpt2_cfg)  # second full copy (model.py:505)

            def head(in_dim):  # reference model.py:136-142 / 338-344
                return nn.Sequential(
                    nn.Linear(in_dim, PROJ_DIM), nn.ReLU(), nn.Dropout(0.0),
                    nn.Linear(PROJ_DIM, PROJ_DIM), nn.LayerNorm(PROJ_DIM),
                )

            self.vision_projection_head = head(HIDDEN)
            self.text_projection_head = head(HIDDEN)
            # decoder pieces (reference model.py:521-533)
            self.dec_vision_projection = nn.Sequential(
                nn.Linear(PROJ_DIM, HIDDEN), nn.Tanh(), nn.Dropout(0.0)
            )
            self.cross_attention = nn.MultiheadAttention(
                embed_dim=HIDDEN, num_heads=CROSS_HEADS, dropout=0.0, batch_first=True
            )
            self.attention_norm = nn.LayerNorm(HIDDEN)
            # frozen vision backbone (reference model.py:150-164; default.yaml:23)
            self.vision.requires_grad_(False)

        # reference model.py:220-243
        def encode_image(self, pixel_values):
            pooled = self.vision(pixel_values=pixel_values).pooler_output
            return self.vision_projection_head(pooled)

        # reference model.py:402-474
        def encode_text(self, input_ids, attention_mask):
            hidden = self.text(input_ids=input_ids, attention_mask=attention_mask).last_hidden_state
            mask = attention_mask.unsqueeze(-1).to(hidden.dtype)
            pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1)
            return self.text_projection_head(pooled)

        # reference model.py:560-610
        def decoder_logits(self, image_embeddings, input_ids, attention_mask):
            vision_token = self.dec_vision_projection(image_embeddings).unsqueeze(1)
            tok = self.decoder_lm.transformer.wte(input_ids)
            attended, _ = self.cross_attention(query=tok, key=vision_token, value=vision_token)
            fused = self.attention_norm(tok + attended)
            return self.decoder_lm(inputs_embeds=fused, attention_mask=attention_mask).logits

    return TorchReference()


def torch_contrastive_loss(img_emb, txt_emb, temperature):
    """Reference ContrastiveLoss forward (model.py:970-1000)."""
    import torch
    import torch.nn.functional as F

    img = F.normalize(img_emb, p=2, dim=-1)
    txt = F.normalize(txt_emb, p=2, dim=-1)
    sim = img @ txt.t() / temperature
    labels = torch.arange(sim.shape[0])
    return 0.5 * (F.cross_entropy(sim, labels) + F.cross_entropy(sim.t(), labels))


def torch_sequence_logprobs(logits, labels, mask):
    """Reference PreferenceLoss._compute_log_probs (model.py:1068-1084):
    causal shift, gather, mask, MEAN over valid length."""
    import torch.nn.functional as F

    logp = F.log_softmax(logits[:, :-1], dim=-1)
    tok = logp.gather(-1, labels[:, 1:].unsqueeze(-1)).squeeze(-1)
    m = mask[:, 1:].to(tok.dtype)
    return (tok * m).sum(-1) / m.sum(-1)


def torch_preference_loss(pref_logits, rej_logits, pref_ids, rej_ids, pref_mask, rej_mask, beta):
    """Reference PreferenceLoss forward (model.py:1016-1050): reference-free
    DPO on length-normalized logprobs."""
    import torch.nn.functional as F

    lp = torch_sequence_logprobs(pref_logits, pref_ids, pref_mask)
    lr = torch_sequence_logprobs(rej_logits, rej_ids, rej_mask)
    return -F.logsigmoid(beta * (lp - lr)).mean()


def run_torch_stage(tref, batches, stage: int, lr: float):
    """Reference per-step loop (trainer.py:435-652): forward, backward, clip,
    AdamW step, cosine-with-warmup scheduler step."""
    import torch
    from transformers import get_cosine_schedule_with_warmup

    opt = torch.optim.AdamW(
        tref.parameters(), lr=lr, weight_decay=WEIGHT_DECAY, betas=(0.9, 0.999), eps=1e-8
    )
    sched = get_cosine_schedule_with_warmup(opt, WARMUP, len(batches))
    losses = []
    for batch in batches:
        def t(x, dtype=torch.long):
            return torch.tensor(np.asarray(x), dtype=dtype)

        images = t(batch["image"], torch.float32).permute(0, 3, 1, 2)  # NHWC -> NCHW
        if stage == 1:
            img_emb = tref.encode_image(images)
            txt_emb = tref.encode_text(t(batch["caption_ids"]), t(batch["caption_mask"]))
            loss = torch_contrastive_loss(img_emb, txt_emb, TEMPERATURE)
        else:
            img_emb = tref.encode_image(images)
            pi, pm = t(batch["preferred_ids"]), t(batch["preferred_mask"])
            ri, rm = t(batch["rejected_ids"]), t(batch["rejected_mask"])
            # the reference encodes the images twice (once per side, SURVEY
            # §3.2); with a frozen tower + no dropout that equals encoding once
            pref_logits = tref.decoder_logits(img_emb, pi, pm)
            rej_logits = tref.decoder_logits(tref.encode_image(images), ri, rm)
            loss = torch_preference_loss(pref_logits, rej_logits, pi, ri, pm, rm, BETA)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tref.parameters(), CLIP_NORM)
        opt.step()
        sched.step()
        opt.zero_grad()
        losses.append(float(loss.detach()))
    return losses


# =============================== pgica side ====================================


def build_pgica_model():
    from pgica_tpu.data.tokenizer import CaptionTokenizer
    from pgica_tpu.models import PreferenceGuidedCaptioningModel

    return PreferenceGuidedCaptioningModel(
        vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ_DIM,
        temperature=TEMPERATURE, dropout=0.0, freeze_vision_backbone=True,
        tokenizer=CaptionTokenizer(), max_caption_length=SEQ, image_size=IMAGE, seed=0,
    )


def import_torch_weights(tref, model):
    """torch init -> pgica param tree via models/convert (identical weights)."""
    import jax
    import jax.numpy as jnp

    from pgica_tpu.models import convert as C

    module = model.module
    params = {
        "vision_encoder": {
            "backbone": C.convert_clip_vision(tref.vision.state_dict(), module.vision_config),
            "projection": C.convert_projection_head(tref.vision_projection_head.state_dict()),
        },
        "text_encoder": {
            "backbone": C.convert_gpt2(tref.text.state_dict(), module.text_config),
            "projection": C.convert_projection_head(tref.text_projection_head.state_dict()),
        },
        "caption_decoder": {
            "lm": C.convert_gpt2(tref.decoder_lm.state_dict(), module.decoder_config),
            "vision_projection": {
                "layers_0": C.convert_linear(tref.dec_vision_projection.state_dict(), "0")
            },
            "cross_attention": C.convert_mha(tref.cross_attention.state_dict(), "", CROSS_HEADS),
            "cross_ln": {
                "scale": np.asarray(tref.attention_norm.weight.detach()),
                "bias": np.asarray(tref.attention_norm.bias.detach()),
            },
        },
    }
    C.assert_tree_shapes(params, model.params, "parity")
    # np.array(copy=True): convert.py returns zero-copy views of torch storage
    # for un-transposed tensors; without the copy, torch's in-place optimizer
    # updates would silently mutate the jax side mid-comparison.
    return jax.tree.map(lambda x: jnp.array(np.array(x, copy=True)), params)


def run_pgica_stage(model, params, batches, stage: int, lr: float):
    """This framework's real step machinery (training/train_step.py + optim.py)."""
    import jax

    from pgica_tpu.training.optim import create_optimizer
    from pgica_tpu.training.train_step import (
        TrainState,
        make_stage1_train_step,
        make_stage2_train_step,
    )

    frozen = (("caption_decoder",),) if stage == 1 else (("text_encoder",),)
    optimizer = create_optimizer(
        learning_rate=lr, total_steps=len(batches), warmup_steps=WARMUP,
        weight_decay=WEIGHT_DECAY, max_grad_norm=CLIP_NORM,
        params_for_freezing=params, freeze_vision_backbone=True,
        frozen_prefixes=frozen,
    )
    if stage == 1:
        step = jax.jit(make_stage1_train_step(model.module, optimizer, TEMPERATURE, augment=False))
    else:
        step = jax.jit(
            make_stage2_train_step(
                model.module, optimizer, beta=BETA, reference_free=True,
                length_normalized=True, augment=False,
            )
        )
    state = TrainState.create(params, optimizer)
    rng = jax.random.PRNGKey(0)  # dropout 0.0: the stream is never consumed
    losses = []
    for batch in batches:
        if stage == 1:
            state, metrics = step(state, batch, rng)
        else:
            state, metrics = step(state, None, batch, rng)
        losses.append(float(metrics["loss"]))
    return losses


# =============================== harness =======================================


def make_batches(n_steps: int, vocab_size: int, stage: int, seed: int = 0):
    """Identical synthetic batches for both frameworks (normalized images)."""
    rng = np.random.default_rng(seed + stage)
    batches = []
    for _ in range(n_steps):
        images = rng.normal(size=(BATCH, IMAGE, IMAGE, 3)).astype(np.float32)

        def seqs():
            ids = rng.integers(1, vocab_size, (BATCH, SEQ)).astype(np.int32)
            lengths = rng.integers(SEQ // 2, SEQ + 1, (BATCH,))
            mask = (np.arange(SEQ)[None, :] < lengths[:, None]).astype(np.int32)
            return ids, mask

        if stage == 1:
            ids, mask = seqs()
            batches.append({"image": images, "caption_ids": ids, "caption_mask": mask})
        else:
            pi, pm = seqs()
            ri, rm = seqs()
            batches.append(
                {
                    "image": images,
                    "preferred_ids": pi, "preferred_mask": pm,
                    "rejected_ids": ri, "rejected_mask": rm,
                }
            )
    return batches


def run_parity(n_steps: int = 20, seed: int = 0) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    torch.manual_seed(seed)
    model = build_pgica_model()
    vocab = model.tokenizer.vocab_size
    tref = build_torch_reference(vocab, seed=seed)
    params = import_torch_weights(tref, model)

    report = {"n_steps": n_steps, "config": {
        "hidden": HIDDEN, "layers": LAYERS, "projection_dim": PROJ_DIM,
        "vocab": vocab, "batch": BATCH, "seq": SEQ,
        "temperature": TEMPERATURE, "beta": BETA, "weight_decay": WEIGHT_DECAY,
        "clip_norm": CLIP_NORM, "warmup_steps": WARMUP,
        "lr": {"stage1": LR_STAGE1, "stage2": LR_STAGE2},
    }}
    for stage, lr in ((1, LR_STAGE1), (2, LR_STAGE2)):
        batches = make_batches(n_steps, vocab, stage, seed)
        # independent torch copies per stage so stage 2 starts from the same
        # init in both frameworks (the reference runs stage 2 from the stage-1
        # result; for numerical comparison each stage is measured from init)
        t_losses = run_torch_stage(
            build_torch_reference(vocab, seed=seed) if stage == 2 else tref,
            batches, stage, lr,
        )
        p_losses = run_pgica_stage(model, params, batches, stage, lr)
        diffs = [abs(a - b) for a, b in zip(t_losses, p_losses)]
        rel = [d / max(abs(a), 1e-8) for d, a in zip(diffs, t_losses)]
        report[f"stage{stage}"] = {
            "torch_reference_losses": t_losses,
            "pgica_tpu_losses": p_losses,
            "max_abs_diff": max(diffs),
            "max_rel_diff": max(rel),
            "loss_moved": abs(t_losses[-1] - t_losses[0]),
        }
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="results/PARITY_steps.json")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    report = run_parity(args.steps, args.seed)
    for stage in (1, 2):
        s = report[f"stage{stage}"]
        print(
            f"stage {stage}: max_abs_diff={s['max_abs_diff']:.3e} "
            f"max_rel_diff={s['max_rel_diff']:.3e} "
            f"loss {s['torch_reference_losses'][0]:.4f} -> {s['torch_reference_losses'][-1]:.4f}"
        )
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
