"""Mesh + sharding tests on the virtual 8-device CPU mesh (SURVEY §4.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pgica_tpu.parallel.mesh import MeshContext
from pgica_tpu.parallel.sharding import infer_param_spec, make_param_shardings, shard_params


class TestMeshContext:
    def test_auto_data_axis(self):
        mesh = MeshContext(data=-1)
        assert mesh.shape == {"data": 8, "fsdp": 1, "model": 1}
        assert mesh.num_devices == 8

    def test_tp_mesh(self):
        mesh = MeshContext(data=-1, model=2)
        assert mesh.shape == {"data": 4, "fsdp": 1, "model": 2}

    def test_fsdp_mesh(self):
        mesh = MeshContext(data=2, fsdp=4, model=1)
        assert mesh.data_parallel_size == 8

    def test_invalid_shape_raises(self):
        with pytest.raises(ValueError):
            MeshContext(data=3, fsdp=1, model=1)

    def test_batch_sharding(self):
        mesh = MeshContext(data=-1)
        batch = {"x": np.zeros((16, 4), np.float32)}
        sharded = mesh.shard_batch(batch)
        assert sharded["x"].sharding.spec == P(("data", "fsdp"))

    def test_from_config(self, config):
        mesh = MeshContext.from_config(config)
        assert mesh.num_devices == 8


class TestShardingRules:
    def _mesh(self, model=2, fsdp=1):
        return MeshContext(data=-1, fsdp=fsdp, model=model).mesh

    def test_attention_kernels_tp(self):
        mesh = self._mesh(model=2)
        spec = infer_param_spec("text_encoder/backbone/block_0/attn/q_proj/kernel", (32, 4, 8), mesh)
        assert spec == P(None, "model", None)  # heads=4 not divisible check passes (4%2==0)

    def test_out_proj_tp(self):
        mesh = self._mesh(model=2)
        spec = infer_param_spec("x/attn/out_proj/kernel", (4, 8, 32), mesh)
        assert spec == P("model", None, None)

    def test_mlp_tp(self):
        mesh = self._mesh(model=2)
        assert infer_param_spec("x/mlp/fc_in/kernel", (32, 128), mesh) == P(None, "model")
        assert infer_param_spec("x/mlp/fc_out/kernel", (128, 32), mesh) == P("model", None)

    def test_indivisible_dim_replicated(self):
        mesh = self._mesh(model=2)
        # heads=3 not divisible by 2 -> that axis dropped
        spec = infer_param_spec("x/attn/q_proj/kernel", (32, 3, 8), mesh)
        assert spec == P(None, None, None)

    def test_norms_replicated(self):
        mesh = self._mesh(model=2)
        assert infer_param_spec("x/ln_f/scale", (32,), mesh) == P()

    def test_fsdp_embed_sharding(self):
        mesh = self._mesh(model=1, fsdp=2)
        spec = infer_param_spec("x/mlp/fc_in/kernel", (32, 128), mesh)
        assert spec == P("fsdp", None)


class TestShardedTraining:
    def test_tp_forward_matches_replicated(self):
        """Same params, same batch: TP-sharded forward == replicated forward."""
        from pgica_tpu.data.tokenizer import CaptionTokenizer
        from pgica_tpu.models import PreferenceGuidedCaptioningModel

        tok = CaptionTokenizer()
        model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
            tokenizer=tok, max_caption_length=8, image_size=32, seed=0,
        )
        rng = np.random.default_rng(0)
        images = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
        ids, mask = tok.encode_batch([f"cap {i}" for i in range(8)], 8)

        base = model(images, ids, mask, mode="contrastive")

        mesh = MeshContext(data=4, fsdp=1, model=2)
        sharded_params = shard_params(model.params, mesh.mesh)
        batch = mesh.shard_batch({"image": images, "ids": ids, "mask": mask})
        out = jax.jit(
            lambda p, b: model.module.apply(
                {"params": p}, b["image"], b["ids"], b["mask"], mode="contrastive"
            )
        )(sharded_params, batch)
        np.testing.assert_allclose(
            np.asarray(out["image_embeddings"]),
            np.asarray(base["image_embeddings"]),
            atol=2e-4,
        )

    def test_sharded_train_step_runs(self):
        """End-to-end jitted train step on dp=4 x tp=2 with param sharding."""
        import optax

        from pgica_tpu.data.tokenizer import CaptionTokenizer
        from pgica_tpu.models import PreferenceGuidedCaptioningModel
        from pgica_tpu.training.optim import create_optimizer
        from pgica_tpu.training.train_step import TrainState, make_stage1_train_step

        tok = CaptionTokenizer()
        model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
            tokenizer=tok, max_caption_length=8, image_size=32, seed=0,
        )
        mesh = MeshContext(data=4, fsdp=1, model=2)
        params = shard_params(model.params, mesh.mesh)
        opt = create_optimizer(1e-3, total_steps=4, warmup_steps=1)
        state = TrainState.create(params, opt)
        step = jax.jit(make_stage1_train_step(model.module, opt, 0.5, augment=False))

        rng = np.random.default_rng(0)
        ids, mask = tok.encode_batch([f"c {i}" for i in range(8)], 8)
        batch = mesh.shard_batch(
            {
                "image": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
                "caption_ids": ids,
                "caption_mask": mask,
            }
        )
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # params keep their shardings through the update
        q_kernel = state.params["text_encoder"]["backbone"]["block_0"]["attn"]["q_proj"]["kernel"]
        assert "model" in str(q_kernel.sharding.spec)


class TestScaledConfigShapes:
    def test_llama_dpo_step_on_fsdp_tp_mesh(self):
        """Tiny-llama DPO (frozen reference) on a data=2 x fsdp=2 x model=2 mesh —
        the sharding layout of configs/siglip_llama8b.yaml at toy size."""
        import jax.numpy as jnp

        from pgica_tpu.data.tokenizer import CaptionTokenizer
        from pgica_tpu.models import PreferenceGuidedCaptioningModel
        from pgica_tpu.training.optim import create_optimizer
        from pgica_tpu.training.train_step import TrainState, make_stage2_train_step

        tok = CaptionTokenizer()
        model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-llama", projection_dim=16,
            tokenizer=tok, max_caption_length=8, image_size=32, seed=0,
        )
        mesh = MeshContext(data=2, fsdp=2, model=2)
        params = shard_params(model.params, mesh.mesh)
        ref_params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        opt = create_optimizer(1e-3, total_steps=2, warmup_steps=1)
        state = TrainState.create(params, opt)
        step = jax.jit(
            make_stage2_train_step(model.module, opt, beta=0.1, augment=False),
            donate_argnums=(0,),
        )
        rng = np.random.default_rng(0)
        p_ids, p_mask = tok.encode_batch([f"good caption {i}" for i in range(8)], 8)
        r_ids, r_mask = tok.encode_batch([f"bad {i}" for i in range(8)], 8)
        batch = mesh.shard_batch(
            {
                "image": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
                "preferred_ids": p_ids, "preferred_mask": p_mask,
                "rejected_ids": r_ids, "rejected_mask": r_mask,
            }
        )
        state, metrics = step(state, ref_params, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert 0.0 <= float(metrics["reward_accuracy"]) <= 1.0
