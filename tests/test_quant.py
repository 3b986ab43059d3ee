"""Int8 decode quantization (ops/quant.py).

Beyond-reference serving feature: the reference decodes at full precision via
HF generate(); pgica_tpu adds an inference-only int8 path for the decoder LM
(W8A8 on the MXU, or weight-only). These tests pin the numerics (quantization
error bounds vs the f32 path) and the end-to-end wiring (quantized twin module
+ quantize_like param conversion + generate_captions dispatch).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from pgica_tpu.data.tokenizer import CaptionTokenizer
from pgica_tpu.models import PreferenceGuidedCaptioningModel
from pgica_tpu.ops.quant import (
    QuantDenseGeneral,
    q8_matmul,
    quantize_like,
    quantize_weight,
)

B, IMG, SEQ, PROJ = 2, 32, 10, 16


class TestQuantizeWeight:
    def test_roundtrip_error_bound(self, rng):
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        q, scale = quantize_weight(w, n_feature_dims=1)
        assert q.dtype == jnp.int8 and scale.shape == (32,)
        deq = q.astype(jnp.float32) * scale[None, :]
        # per-channel symmetric int8: max error is scale/2 per element
        assert float(jnp.max(jnp.abs(deq - w) / scale[None, :])) <= 0.5 + 1e-6

    def test_multi_feature_dims(self, rng):
        w = jnp.asarray(rng.normal(size=(48, 4, 8)).astype(np.float32))
        q, scale = quantize_weight(w, n_feature_dims=2)
        assert scale.shape == (4, 8)
        deq = q.astype(jnp.float32) * scale[None]
        assert float(jnp.max(jnp.abs(deq - w))) <= float(jnp.max(scale)) * 0.5 + 1e-6

    def test_zero_column_safe(self):
        w = jnp.zeros((16, 4), jnp.float32)
        q, scale = quantize_weight(w, 1)
        assert np.all(np.asarray(q) == 0) and np.all(np.isfinite(np.asarray(scale)))


class TestQ8Matmul:
    @pytest.mark.parametrize("weight_only", [False, True])
    def test_matches_f32_matmul(self, rng, weight_only):
        x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        q, scale = quantize_weight(w, 1)
        got = q8_matmul(x, q, scale, weight_only=weight_only, out_dtype=jnp.float32)
        want = x @ w
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        # W8A8 carries activation quantization error too; W8 only weight error
        assert rel < (0.02 if not weight_only else 0.01)


class TestQuantDenseGeneral:
    def test_matches_dense_general_qkv_pattern(self, rng):
        """(B,S,hidden) -> (B,S,heads,head_dim), the q/k/v projection shape."""
        x = jnp.asarray(rng.normal(size=(2, 5, 64)).astype(np.float32))
        ref = nn.DenseGeneral(features=(4, 16), param_dtype=jnp.float32)
        ref_params = ref.init(jax.random.PRNGKey(0), x)["params"]
        qmod = QuantDenseGeneral(features=(4, 16), dtype=jnp.float32)
        template = jax.eval_shape(lambda: qmod.init(jax.random.PRNGKey(0), x))["params"]
        qparams = quantize_like(template, ref_params)
        got = qmod.apply({"params": qparams}, x)
        want = ref.apply({"params": ref_params}, x)
        assert got.shape == want.shape == (2, 5, 4, 16)
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert rel < 0.02

    def test_matches_dense_general_outproj_pattern(self, rng):
        """(B,S,H,D) -> (B,S,hidden) with axis=(-2,-1), the out_proj shape."""
        x = jnp.asarray(rng.normal(size=(2, 5, 4, 16)).astype(np.float32))
        ref = nn.DenseGeneral(features=64, axis=(-2, -1), param_dtype=jnp.float32)
        ref_params = ref.init(jax.random.PRNGKey(0), x)["params"]
        qmod = QuantDenseGeneral(features=64, axis=(-2, -1), dtype=jnp.float32)
        template = jax.eval_shape(lambda: qmod.init(jax.random.PRNGKey(0), x))["params"]
        qparams = quantize_like(template, ref_params)
        got = qmod.apply({"params": qparams}, x)
        want = ref.apply({"params": ref_params}, x)
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert rel < 0.02

    def test_standalone_init_runs(self, rng):
        x = jnp.asarray(rng.normal(size=(3, 32)).astype(np.float32))
        mod = QuantDenseGeneral(features=8)
        params = mod.init(jax.random.PRNGKey(1), x)["params"]
        assert params["kernel_q"].dtype == jnp.int8
        out = mod.apply({"params": params}, x)
        assert out.shape == (3, 8) and bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


@pytest.fixture(scope="module")
def qmodel():
    return PreferenceGuidedCaptioningModel(
        vision_model="tiny-vit",
        text_model="tiny-gpt2",
        projection_dim=PROJ,
        tokenizer=CaptionTokenizer(),
        max_caption_length=SEQ,
        image_size=IMG,
        seed=0,
        quantization="int8",
    )


class TestQuantizedDecodeEndToEnd:
    def test_generate_captions_returns_strings(self, qmodel, rng):
        images = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
        caps = qmodel.generate_captions(images, max_length=6)
        assert len(caps) == B and all(isinstance(c, str) for c in caps)

    def test_quant_cache_reused_and_invalidated(self, qmodel, rng):
        images = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
        qmodel.generate_captions(images, max_length=6)
        twin1, qp1 = qmodel._decode_module_and_params()
        twin2, qp2 = qmodel._decode_module_and_params()
        assert twin1 is twin2 and qp1 is qp2
        qmodel.params = jax.tree.map(lambda x: x, qmodel.params)  # new object
        _, qp3 = qmodel._decode_module_and_params()
        assert qp3 is not qp1

    def test_decode_prefix_logits_close_to_f32(self, qmodel, rng):
        """Quantized decode_prefix tracks the full-precision logits."""
        from pgica_tpu.models.lm import init_kv_cache

        twin, qparams = qmodel._decode_module_and_params()
        vis = jnp.asarray(rng.normal(size=(B, PROJ)).astype(np.float32))
        cache_len = 8
        mask = (jnp.arange(cache_len)[None, :] <= 0).astype(jnp.int32).repeat(B, 0)

        def prefix(module, params):
            caches = init_kv_cache(module.decoder_config, B, cache_len, module.dtype)
            logits, _ = module.apply(
                {"params": params}, vis, caches, mask, method="decode_prefix"
            )
            return logits.astype(jnp.float32)

        got = prefix(twin, qparams)
        want = prefix(qmodel.module, qmodel.params)
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert rel < 0.05, f"quantized logits diverge: rel={rel}"

    def test_weight_only_mode_wires(self, rng):
        model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ,
            tokenizer=CaptionTokenizer(), max_caption_length=SEQ, image_size=IMG,
            seed=0, quantization="int8_weight_only",
        )
        images = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
        caps = model.generate_captions(images, max_length=6)
        assert len(caps) == B

    def test_bad_mode_rejected(self):
        with pytest.raises(ValueError, match="quantization"):
            PreferenceGuidedCaptioningModel(
                vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ,
                tokenizer=CaptionTokenizer(), max_caption_length=SEQ, image_size=IMG,
                seed=0, quantization="int4",
            )

    def test_training_params_untouched(self, qmodel):
        """The training tree keeps plain f32 kernels (quant is decode-only)."""
        block = qmodel.params["caption_decoder"]["lm"]["block_0"]["attn"]["q_proj"]
        assert "kernel" in block and block["kernel"].dtype == jnp.float32
