"""HF-weight-import parity: our towers vs HF torch models, same weights.

HF models are built OFFLINE from configs (random init), converted via
pgica_tpu.models.convert, and outputs compared to float tolerance — proving
the architectures are exact re-implementations (SURVEY §7.3 'HF-weight
parity' requirement).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from pgica_tpu.models.convert import convert_clip_vision, convert_gpt2, convert_llama
from pgica_tpu.models.lm import TransformerLM
from pgica_tpu.models.presets import LMConfig, ViTConfig
from pgica_tpu.models.vit import VisionTransformer


class TestGPT2Parity:
    @pytest.fixture(scope="class")
    def hf_gpt2(self):
        from transformers import GPT2Config, GPT2LMHeadModel

        cfg = GPT2Config(
            vocab_size=64, n_positions=32, n_embd=32, n_layer=2, n_head=2,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )
        torch.manual_seed(0)
        model = GPT2LMHeadModel(cfg).eval()
        return model, cfg

    def test_hidden_states_and_logits_match(self, hf_gpt2):
        model, cfg = hf_gpt2
        ours_cfg = LMConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
            max_position_embeddings=32, dropout=0.0, arch="gpt2",
        )
        params = convert_gpt2(model.state_dict(), ours_cfg)
        ours = TransformerLM(ours_cfg, with_lm_head=True, attn_impl="xla")

        ids = np.random.default_rng(0).integers(0, 64, (2, 16)).astype(np.int64)
        with torch.no_grad():
            hf_out = model(torch.tensor(ids), output_hidden_states=True)
        out = ours.apply(
            {"params": params}, input_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.ones((2, 16), jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(out["hidden_states"]),
            hf_out.hidden_states[-1].numpy(),
            atol=2e-4,
            err_msg="final hidden states diverge",
        )
        np.testing.assert_allclose(
            np.asarray(out["logits"]), hf_out.logits.numpy(), atol=2e-4,
            err_msg="lm logits diverge",
        )

    def test_padding_mask_matches(self, hf_gpt2):
        model, _ = hf_gpt2
        ours_cfg = LMConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
            max_position_embeddings=32, dropout=0.0,
        )
        params = convert_gpt2(model.state_dict(), ours_cfg)
        ours = TransformerLM(ours_cfg, with_lm_head=True, attn_impl="xla")
        ids = np.random.default_rng(1).integers(0, 64, (2, 12)).astype(np.int64)
        mask = np.ones((2, 12), np.int64)
        mask[:, 8:] = 0
        with torch.no_grad():
            hf_logits = model(torch.tensor(ids), attention_mask=torch.tensor(mask)).logits
        out = ours.apply(
            {"params": params}, input_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.asarray(mask.astype(np.int32)),
        )
        # only unmasked positions are comparable
        np.testing.assert_allclose(
            np.asarray(out["logits"])[:, :8], hf_logits.numpy()[:, :8], atol=2e-4
        )


class TestCLIPVisionParity:
    def test_pooled_and_hidden_match(self):
        from transformers import CLIPVisionConfig, CLIPVisionModel

        hf_cfg = CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8,
            attention_dropout=0.0,
        )
        torch.manual_seed(0)
        model = CLIPVisionModel(hf_cfg).eval()
        ours_cfg = ViTConfig(
            image_size=32, patch_size=8, hidden_size=32, num_layers=2,
            num_heads=2, mlp_ratio=2.0, hidden_act="quick_gelu",
        )
        params = convert_clip_vision(model.state_dict(), ours_cfg)
        ours = VisionTransformer(ours_cfg, attn_impl="xla")

        images = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            hf_out = model(torch.tensor(images))
        out = ours.apply({"params": params}, jnp.asarray(images.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out["features"]),
            hf_out.last_hidden_state.numpy(),
            atol=3e-4,
            err_msg="ViT token features diverge",
        )
        np.testing.assert_allclose(
            np.asarray(out["pooled_output"]), hf_out.pooler_output.numpy(), atol=3e-4,
            err_msg="pooled CLS output diverges",
        )


class TestLlamaParity:
    def test_hidden_states_match(self):
        from transformers import LlamaConfig, LlamaModel

        hf_cfg = LlamaConfig(
            vocab_size=64, hidden_size=32, intermediate_size=56,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-5,
            attention_dropout=0.0,
        )
        torch.manual_seed(0)
        model = LlamaModel(hf_cfg).eval()
        ours_cfg = LMConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            num_kv_heads=2, max_position_embeddings=64, mlp_ratio=56 / 32,
            dropout=0.0, arch="llama", rope_theta=10000.0, norm_eps=1e-5,
        )
        params = convert_llama(model.state_dict(), ours_cfg)
        ours = TransformerLM(ours_cfg, with_lm_head=False, attn_impl="xla")

        ids = np.random.default_rng(0).integers(0, 64, (2, 10)).astype(np.int64)
        with torch.no_grad():
            hf_out = model(torch.tensor(ids)).last_hidden_state
        out = ours.apply(
            {"params": params}, input_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.ones((2, 10), jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(out["hidden_states"]), hf_out.numpy(), atol=3e-4,
            err_msg="llama hidden states diverge",
        )


class TestLoadPretrainedTowers:
    def test_end_to_end_local_checkpoint_import(self, tmp_path):
        """save_pretrained tiny HF models locally, import via the wrapper, and
        verify the text tower's pooled features reflect the HF weights."""
        import jax.numpy as jnp

        from transformers import CLIPVisionConfig, CLIPVisionModel, GPT2Config, GPT2LMHeadModel

        from pgica_tpu.data.tokenizer import CaptionTokenizer
        from pgica_tpu.models import PreferenceGuidedCaptioningModel
        from pgica_tpu.models.lm import TransformerLM
        from pgica_tpu.models.presets import LMConfig

        torch.manual_seed(0)
        tok = CaptionTokenizer()
        gpt2 = GPT2LMHeadModel(
            GPT2Config(
                vocab_size=tok.vocab_size, n_positions=64, n_embd=32, n_layer=2,
                n_head=2, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
            )
        ).eval()
        clip = CLIPVisionModel(
            CLIPVisionConfig(
                hidden_size=32, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=2, image_size=32, patch_size=8, attention_dropout=0.0,
            )
        ).eval()
        gpt2.save_pretrained(tmp_path / "gpt2", safe_serialization=False)
        clip.save_pretrained(tmp_path / "clip", safe_serialization=False)

        model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
            tokenizer=tok, max_caption_length=10, image_size=32, seed=0,
        )
        model.load_pretrained_towers(
            vision_path=tmp_path / "clip", text_path=tmp_path / "gpt2"
        )

        # text tower hidden states must now match HF exactly
        ids = np.random.default_rng(0).integers(0, 64, (2, 10)).astype(np.int64)
        with torch.no_grad():
            hf_hidden = gpt2.transformer(torch.tensor(ids)).last_hidden_state
        ours_cfg = model.module.text_config
        lm = TransformerLM(ours_cfg, with_lm_head=False, attn_impl="xla")
        out = lm.apply(
            {"params": model.params["text_encoder"]["backbone"]},
            input_ids=jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.ones((2, 10), jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(out["hidden_states"]), hf_hidden.numpy(), atol=3e-4
        )
