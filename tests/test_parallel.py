"""Mesh + sharding tests on the virtual 8-device CPU mesh (SURVEY §4.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pgica_tpu.parallel.mesh import MeshContext
from pgica_tpu.parallel.sharding import infer_param_spec, make_param_shardings, shard_params


class TestMeshContext:
    def test_auto_data_axis(self):
        mesh = MeshContext(data=-1)
        assert mesh.shape == {"dcn": 1, "data": 8, "fsdp": 1, "model": 1, "seq": 1}
        assert mesh.num_devices == 8

    def test_tp_mesh(self):
        mesh = MeshContext(data=-1, model=2)
        assert mesh.shape == {"dcn": 1, "data": 4, "fsdp": 1, "model": 2, "seq": 1}

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
        assert sharded["x"].sharding.spec == P(("dcn", "data", "fsdp"))

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

    def test_wte_mesh_conditional(self):
        # model axis present: vocab over model, emb dim replicated (the fsdp
        # sharding there caused involuntary SPMD remat — sharding.py comment).
        mesh_tp = self._mesh(model=2, fsdp=2)
        assert infer_param_spec("x/lm/wte/embedding", (64, 32), mesh_tp) == P("model", None)
        # pure-FSDP mesh: the gather conflict can't arise; keep memory sharded.
        mesh_fsdp = self._mesh(model=1, fsdp=2)
        assert infer_param_spec("x/lm/wte/embedding", (64, 32), mesh_fsdp) == P(None, "fsdp")


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


class TestVocabParallelFusedCE:
    """Megatron-style vocab-parallel fused linear-CE (VERDICT item 5): the
    model-axis-sharded wte is never gathered; values and grads must match the
    unsharded reference."""

    def _mesh(self, model=4):
        devs = np.asarray(jax.devices()[:8]).reshape(8 // model, model)
        return Mesh(devs, ("data", "model"))

    def test_values_match_unsharded(self, rng):
        from jax import shard_map

        from pgica_tpu.ops.fused_ce import fused_token_logprobs, fused_token_logprobs_tp

        rows, d, vocab = 16, 8, 64
        h = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(vocab, d)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, vocab, (rows,)).astype(np.int32))
        ref = fused_token_logprobs(h, w, y, impl="xla")
        mesh = self._mesh()
        out = shard_map(
            lambda h_, w_, y_: fused_token_logprobs_tp(h_, w_, y_, "model", impl="xla"),
            mesh=mesh,
            in_specs=(P("data", None), P("model", None), P("data",)),
            out_specs=P("data"),
            check_vma=False,
        )(h, w, y)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_pallas_target_in_neighbor_shards_padded_window(self, rng):
        """Regression: with vloc not divisible by block_vocab, a NEIGHBOR
        shard's target id lands in this shard's padded-column range; the
        kernel's target gather must not pick up the padded NEG_INF score
        (it used to add -1e30 to ~ (vocab_p - vloc)/V of all token logprobs)."""
        from jax import shard_map

        from pgica_tpu.ops.fused_ce import fused_token_logprobs, fused_token_logprobs_tp

        rows, d, vocab = 16, 8, 48  # model=2 -> vloc=24; block_vocab=16 -> padded to 32
        h = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(vocab, d)).astype(np.float32))
        # every target inside [24, 32): shard 1's tokens, inside shard 0's pad window
        y = jnp.asarray(rng.integers(24, 32, (rows,)).astype(np.int32))
        ref = fused_token_logprobs(h, w, y, impl="xla")
        mesh = self._mesh(model=2)
        out = shard_map(
            lambda h_, w_, y_: fused_token_logprobs_tp(
                h_, w_, y_, "model", block_rows=8, block_vocab=16, impl="pallas"
            ),
            mesh=mesh,
            in_specs=(P("data", None), P("model", None), P("data",)),
            out_specs=P("data"),
            check_vma=False,
        )(h, w, y)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_values_match_pallas_interpret(self, rng):
        from jax import shard_map

        from pgica_tpu.ops.fused_ce import fused_token_logprobs, fused_token_logprobs_tp

        rows, d, vocab = 16, 8, 64
        h = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(vocab, d)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, vocab, (rows,)).astype(np.int32))
        ref = fused_token_logprobs(h, w, y, impl="xla")
        mesh = self._mesh(model=2)
        out = shard_map(
            lambda h_, w_, y_: fused_token_logprobs_tp(
                h_, w_, y_, "model", block_rows=8, block_vocab=16, impl="pallas"
            ),
            mesh=mesh,
            in_specs=(P("data", None), P("model", None), P("data",)),
            out_specs=P("data"),
            check_vma=False,
        )(h, w, y)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grads_match_unsharded(self, rng):
        from jax import shard_map

        from pgica_tpu.ops.fused_ce import fused_token_logprobs, fused_token_logprobs_tp

        rows, d, vocab = 16, 8, 64
        h = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(vocab, d)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, vocab, (rows,)).astype(np.int32))
        g = jnp.asarray(rng.normal(size=(rows,)).astype(np.float32))
        mesh = self._mesh()

        def loss_sharded(h_, w_):
            fn = shard_map(
                lambda hh, ww, yy: fused_token_logprobs_tp(hh, ww, yy, "model", impl="xla"),
                mesh=mesh,
                in_specs=(P("data", None), P("model", None), P("data",)),
                out_specs=P("data"),
                check_vma=False,
            )
            return jnp.sum(fn(h_, w_, y) * g)

        def loss_ref(h_, w_):
            return jnp.sum(fused_token_logprobs(h_, w_, y, impl="xla") * g)

        gs = jax.grad(loss_sharded, argnums=(0, 1))(h, w)
        gr = jax.grad(loss_ref, argnums=(0, 1))(h, w)
        np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gr[0]), atol=1e-4, err_msg="dh")
        np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gr[1]), atol=1e-4, err_msg="dW")

    def test_stage2_step_under_tp_mesh_fused_matches_xla(self, rng):
        """Scaled-down gpt2-large-shaped stage-2 DPO step under fsdp x model
        sharding: the fused vocab-parallel path must agree with plain XLA
        logprobs computed from the same hidden states."""
        from pgica_tpu.data.tokenizer import CaptionTokenizer
        from pgica_tpu.models import PreferenceGuidedCaptioningModel
        from pgica_tpu.ops.losses import sequence_logprobs, sequence_logprobs_from_hidden
        from pgica_tpu.parallel.mesh import MeshContext
        from pgica_tpu.parallel.sharding import shard_params
        from pgica_tpu.training.train_step import decoder_embedding

        tok = CaptionTokenizer()
        model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
            tokenizer=tok, max_caption_length=12, image_size=32, seed=0,
        )
        mesh_ctx = MeshContext(data=2, fsdp=2, model=2, devices=jax.devices()[:8])
        params = shard_params(model.params, mesh_ctx.mesh)
        ids, mask = tok.encode_batch([f"a colorful caption {i}" for i in range(4)], 12)
        images = mesh_ctx.shard_batch(
            {"image": rng.normal(size=(4, 32, 32, 3)).astype(np.float32)}
        )["image"]
        ids = jnp.asarray(ids)
        mask = jnp.asarray(mask)

        @jax.jit
        def run(params, images, ids, mask):
            vision = model.module.apply(
                {"params": params}, images, method="encode_image"
            )
            dec = model.module.apply(
                {"params": params}, ids, mask, vision["embeddings"], True,
                method="decode_train",
            )
            emb = decoder_embedding(params)
            fused = sequence_logprobs_from_hidden(
                dec["hidden_states"], emb, ids, mask, mesh=mesh_ctx.mesh
            )
            plain = sequence_logprobs(dec["logits"], ids, mask)
            return fused, plain

        fused, plain = run(params, images, ids, mask)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), atol=1e-3, rtol=1e-4)

    def test_grads_with_padded_vocab(self, rng):
        """Non-divisible vocab: padded zero rows must not perturb values/grads."""
        from jax import shard_map

        from pgica_tpu.ops.fused_ce import fused_token_logprobs, fused_token_logprobs_tp

        rows, d, vocab, n_model = 16, 8, 67, 4  # 67 % 4 != 0
        h = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(vocab, d)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, vocab, (rows,)).astype(np.int32))
        g = jnp.asarray(rng.normal(size=(rows,)).astype(np.float32))
        mesh = self._mesh(model=n_model)
        vocab_p = ((vocab + n_model - 1) // n_model) * n_model

        def loss_sharded(h_, w_):
            w_pad = jnp.pad(w_, ((0, vocab_p - vocab), (0, 0)))
            fn = shard_map(
                lambda hh, ww, yy: fused_token_logprobs_tp(
                    hh, ww, yy, "model", impl="xla", true_vocab=vocab
                ),
                mesh=mesh,
                in_specs=(P("data", None), P("model", None), P("data",)),
                out_specs=P("data"),
                check_vma=False,
            )
            return jnp.sum(fn(h_, w_pad, y) * g)

        def loss_ref(h_, w_):
            return jnp.sum(fused_token_logprobs(h_, w_, y, impl="xla") * g)

        v_s = loss_sharded(h, w)
        v_r = loss_ref(h, w)
        np.testing.assert_allclose(float(v_s), float(v_r), rtol=1e-5)
        gs = jax.grad(loss_sharded, argnums=(0, 1))(h, w)
        gr = jax.grad(loss_ref, argnums=(0, 1))(h, w)
        np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gr[0]), atol=1e-4, err_msg="dh")
        np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gr[1]), atol=1e-4, err_msg="dW")


class TestDCNAxis:
    """Outer multi-slice (DCN) mesh axis (SURVEY §2.5 growth path)."""

    def test_mesh_shapes_and_batch_sharding(self):
        ctx = MeshContext(dcn=2, data=2, fsdp=1, model=2, devices=jax.devices()[:8])
        assert ctx.shape == {"dcn": 2, "data": 2, "fsdp": 1, "model": 2, "seq": 1}
        assert ctx.data_parallel_size == 4
        batch = ctx.shard_batch({"x": np.zeros((8, 4), np.float32)})
        assert batch["x"].sharding.spec == P(("dcn", "data", "fsdp"))

    def test_data_axis_inference_with_dcn(self):
        ctx = MeshContext(dcn=2, data=-1, fsdp=1, model=2, devices=jax.devices()[:8])
        assert ctx.shape["data"] == 2

    def test_stage1_and_stage2_step_on_dcn_mesh(self, rng):
        """One step of each stage on a (dcn=2, data=2, model=2) mesh — the
        VERDICT item 8 acceptance shape — must compile and stay finite."""
        from pgica_tpu.data.tokenizer import CaptionTokenizer
        from pgica_tpu.models import PreferenceGuidedCaptioningModel
        from pgica_tpu.training.optim import create_optimizer
        from pgica_tpu.training.train_step import (
            TrainState,
            make_stage1_train_step,
            make_stage2_train_step,
        )

        tok = CaptionTokenizer()
        model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
            tokenizer=tok, max_caption_length=12, image_size=32, seed=0,
        )
        ctx = MeshContext(dcn=2, data=2, fsdp=1, model=2, devices=jax.devices()[:8])
        params = shard_params(model.params, ctx.mesh)

        ids, mask = tok.encode_batch([f"caption {i}" for i in range(8)], 12)
        opt = create_optimizer(1e-3, total_steps=4, warmup_steps=1)
        state = TrainState.create(params, opt)
        step1 = jax.jit(make_stage1_train_step(model.module, opt, 0.5, augment=False),
                        donate_argnums=(0,))
        batch1 = ctx.shard_batch({
            "image": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
            "caption_ids": ids, "caption_mask": mask,
        })
        state, m1 = step1(state, batch1, jax.random.PRNGKey(0))
        assert np.isfinite(float(m1["loss"]))

        r_ids, r_mask = tok.encode_batch([f"bad {i}" for i in range(8)], 12)
        ref = jax.tree.map(lambda x: jnp.array(x, copy=True), state.params)
        opt2 = create_optimizer(1e-4, total_steps=4, warmup_steps=1)
        state2 = TrainState.create(state.params, opt2)
        step2 = jax.jit(
            make_stage2_train_step(model.module, opt2, beta=0.1, augment=False, mesh=ctx.mesh),
            donate_argnums=(0,),
        )
        batch2 = ctx.shard_batch({
            "image": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
            "preferred_ids": ids, "preferred_mask": mask,
            "rejected_ids": r_ids, "rejected_mask": r_mask,
        })
        state2, m2 = step2(state2, ref, batch2, jax.random.PRNGKey(1))
        assert np.isfinite(float(m2["loss"]))


class TestRingAttention:
    """Context-parallel ring attention over a mesh axis (SURVEY §5 growth
    path): numerics and grads must match single-device attention."""

    def _mesh(self):
        return Mesh(np.asarray(jax.devices()[:4]), ("seq",))

    def _qkv(self, rng, b=2, h=4, s=32, d=8):
        mk = lambda: jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        return mk(), mk(), mk()

    @staticmethod
    def _reference(q, k, v, causal):
        from pgica_tpu.ops.attention import _xla_attention

        return _xla_attention(q, k, v, None, causal)

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_single_device(self, rng, causal):
        from jax import shard_map

        from pgica_tpu.ops.ring_attention import ring_attention

        q, k, v = self._qkv(rng)
        ref = self._reference(q, k, v, causal)
        mesh = self._mesh()
        out = shard_map(
            lambda a, b_, c: ring_attention(a, b_, c, "seq", causal=causal),
            mesh=mesh,
            in_specs=(P(None, None, "seq", None),) * 3,
            out_specs=P(None, None, "seq", None),
            check_vma=False,
        )(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_grads_match_single_device(self, rng):
        from jax import shard_map

        from pgica_tpu.ops.ring_attention import ring_attention

        q, k, v = self._qkv(rng, s=16)
        g = jnp.asarray(np.random.default_rng(1).normal(size=q.shape).astype(np.float32))
        mesh = self._mesh()

        def loss_ring(q_, k_, v_):
            fn = shard_map(
                lambda a, b_, c: ring_attention(a, b_, c, "seq", causal=True),
                mesh=mesh,
                in_specs=(P(None, None, "seq", None),) * 3,
                out_specs=P(None, None, "seq", None),
                check_vma=False,
            )
            return jnp.sum(fn(q_, k_, v_) * g)

        def loss_ref(q_, k_, v_):
            return jnp.sum(self._reference(q_, k_, v_, True) * g)

        gr_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        gr_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(gr_ring, gr_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-5, err_msg=f"d{name}"
            )


class TestContextParallelLM:
    """End-to-end context parallelism: the full TransformerLM forward runs
    inside shard_map with the sequence dim sharded over a mesh axis
    (ring attention + global position offsets) and matches the unsharded
    forward exactly."""

    @pytest.mark.parametrize("arch", ["gpt2", "llama"])
    def test_lm_forward_matches_unsharded(self, rng, arch):
        from jax import shard_map

        from pgica_tpu.models.lm import TransformerLM
        from pgica_tpu.models.presets import get_text_config

        cfg = get_text_config("tiny-gpt2" if arch == "gpt2" else "tiny-llama", vocab_size=64)
        if cfg is None:
            pytest.skip("preset unavailable")
        plain = TransformerLM(cfg, with_lm_head=True)
        ring = TransformerLM(cfg, with_lm_head=True, ring_axis="seq")

        b, s = 2, 32
        ids = jnp.asarray(rng.integers(0, 64, (b, s)).astype(np.int32))
        mask = jnp.asarray((rng.random((b, s)) > 0.1).astype(np.int32))
        params = plain.init(jax.random.PRNGKey(0), input_ids=ids, attention_mask=mask)["params"]
        ref = plain.apply({"params": params}, input_ids=ids, attention_mask=mask)["logits"]

        mesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))
        out = shard_map(
            lambda p, i, m: ring.apply({"params": p}, input_ids=i, attention_mask=m)["logits"],
            mesh=mesh,
            in_specs=(P(), P(None, "seq"), P(None, "seq")),
            out_specs=P(None, "seq", None),
            check_vma=False,
        )(params, ids, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


class TestContextParallelStage2:
    """Sequence-sharded (shard_map) stage-2 training step: decoder
    activations stay context-parallel through the DPO loss (BACKLOG
    "shard_map training-step variant"); loss, logprobs, and the parameter
    UPDATE must match the unsharded step to float tolerance."""

    def _model(self):
        from pgica_tpu.data.tokenizer import CaptionTokenizer
        from pgica_tpu.models import PreferenceGuidedCaptioningModel

        tok = CaptionTokenizer()
        model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
            tokenizer=tok, max_caption_length=8, image_size=32, seed=0,
            dropout=0.0,  # CP repeats dropout masks per shard; compare clean
        )
        return tok, model

    def _batch(self, tok, b=4):
        rng = np.random.default_rng(0)
        p_ids, p_mask = tok.encode_batch([f"good caption {i}" for i in range(b)], 8)
        r_ids, r_mask = tok.encode_batch([f"bad {i}" for i in range(b)], 8)
        return {
            "image": jnp.asarray(rng.normal(size=(b, 32, 32, 3)).astype(np.float32)),
            "preferred_ids": jnp.asarray(p_ids), "preferred_mask": jnp.asarray(p_mask),
            "rejected_ids": jnp.asarray(r_ids), "rejected_mask": jnp.asarray(r_mask),
        }

    def _mesh(self):
        return Mesh(np.asarray(jax.devices()[:4]), ("seq",))

    @pytest.mark.parametrize("length_norm", [False, True])
    def test_loss_and_grads_match_unsharded(self, length_norm):
        from pgica_tpu.training.cp_step import make_cp_module, make_stage2_cp_loss_fn
        from pgica_tpu.training.train_step import stage2_loss_fn

        tok, model = self._model()
        batch = self._batch(tok)
        ref_params = jax.tree.map(lambda x: jnp.array(x, copy=True), model.params)
        key = jax.random.PRNGKey(3)
        mesh = self._mesh()

        def plain(params):
            return stage2_loss_fn(
                params, ref_params, batch, key, model.module, 0.1,
                False, length_norm, 0.0, False,
            )

        cp_loss = make_stage2_cp_loss_fn(
            make_cp_module(model.module, "seq"), mesh, "seq", beta=0.1,
            length_normalized=length_norm, augment=False,
        )

        (l_ref, m_ref), g_ref = jax.value_and_grad(plain, has_aux=True)(model.params)
        (l_cp, m_cp), g_cp = jax.value_and_grad(cp_loss, has_aux=True)(
            model.params, ref_params, batch, key
        )
        np.testing.assert_allclose(float(l_cp), float(l_ref), rtol=1e-5)
        np.testing.assert_allclose(
            float(m_cp["policy_chosen_logp"]), float(m_ref["policy_chosen_logp"]), rtol=1e-5
        )
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_cp = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_cp)}
        for k, v_ref in flat_ref:
            v_cp = flat_cp[jax.tree_util.keystr(k)]
            np.testing.assert_allclose(
                np.asarray(v_cp), np.asarray(v_ref), atol=2e-5,
                err_msg=jax.tree_util.keystr(k),
            )

    def test_train_step_matches_unsharded(self):
        import optax

        from pgica_tpu.training.cp_step import make_stage2_cp_train_step
        from pgica_tpu.training.optim import create_optimizer
        from pgica_tpu.training.train_step import TrainState, make_stage2_train_step

        tok, model = self._model()
        batch = self._batch(tok)
        ref_params = jax.tree.map(lambda x: jnp.array(x, copy=True), model.params)
        opt = create_optimizer(1e-3, total_steps=2, warmup_steps=1)
        key = jax.random.PRNGKey(7)
        mesh = self._mesh()

        plain = jax.jit(make_stage2_train_step(model.module, opt, beta=0.1, augment=False))
        cp = jax.jit(make_stage2_cp_train_step(
            model.module, opt, mesh, "seq", beta=0.1, augment=False
        ))

        s_ref, m_ref = plain(TrainState.create(model.params, opt), ref_params, batch, key)
        s_cp, m_cp = cp(TrainState.create(model.params, opt), ref_params, batch, key)
        np.testing.assert_allclose(float(m_cp["loss"]), float(m_ref["loss"]), rtol=1e-5)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5),
            s_cp.params, s_ref.params,
        )

    def test_fused_ce_path_matches(self):
        """CP with the fused linear-CE kernel (interpret mode on CPU)."""
        from pgica_tpu.training.cp_step import make_cp_module, make_stage2_cp_loss_fn

        tok, model = self._model()
        batch = self._batch(tok, b=2)
        key = jax.random.PRNGKey(1)
        mesh = self._mesh()
        cp_plain = make_stage2_cp_loss_fn(
            make_cp_module(model.module, "seq"), mesh, "seq", beta=0.1,
            reference_free=True, augment=False, use_fused_ce=False,
        )
        cp_fused = make_stage2_cp_loss_fn(
            make_cp_module(model.module, "seq"), mesh, "seq", beta=0.1,
            reference_free=True, augment=False, use_fused_ce=True,
        )
        l0, _ = cp_plain(model.params, None, batch, key)
        l1, _ = cp_fused(model.params, None, batch, key)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)

    def test_cp_composed_with_data_parallelism(self):
        """2-axis mesh: batch over 'data', sequence over 'seq'."""
        from pgica_tpu.training.cp_step import make_cp_module, make_stage2_cp_loss_fn
        from pgica_tpu.training.train_step import stage2_loss_fn

        tok, model = self._model()
        batch = self._batch(tok, b=4)
        key = jax.random.PRNGKey(5)
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
        cp_loss = make_stage2_cp_loss_fn(
            make_cp_module(model.module, "seq"), mesh, "seq", beta=0.1,
            reference_free=True, augment=False, data_axis="data",
        )
        l_cp, _ = cp_loss(model.params, None, batch, key)
        l_ref, _ = stage2_loss_fn(
            model.params, None, batch, key, model.module, 0.1, True, False, 0.0, False,
        )
        np.testing.assert_allclose(float(l_cp), float(l_ref), rtol=1e-5)

    def test_tp_cp_composition_matches_unsharded(self):
        """DP x TP x CP (data=2, model=2, seq=2): the seq/data axes run
        manual (ring attention, causal-shift ppermute) while the model axis
        stays auto — GSPMD partitions the decoder per the Megatron rules
        inside the shard_map body. Loss AND parameter gradients must match
        the unsharded step (VERDICT r2 item 7)."""
        from pgica_tpu.parallel.sharding import shard_params
        from pgica_tpu.training.cp_step import make_cp_module, make_stage2_cp_loss_fn
        from pgica_tpu.training.train_step import stage2_loss_fn

        tok, model = self._model()
        batch = self._batch(tok, b=4)
        ref_params = jax.tree.map(lambda x: jnp.array(x, copy=True), model.params)
        key = jax.random.PRNGKey(11)
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2), ("data", "model", "seq"))

        def plain(params):
            return stage2_loss_fn(
                params, ref_params, batch, key, model.module, 0.1,
                False, False, 0.0, False,
            )

        cp_loss = make_stage2_cp_loss_fn(
            make_cp_module(model.module, "seq"), mesh, "seq", beta=0.1,
            augment=False, data_axis="data", tp_axis="model", use_fused_ce=True,
        )
        sharded = shard_params(model.params, mesh)
        (l_ref, m_ref), g_ref = jax.value_and_grad(plain, has_aux=True)(model.params)
        (l_cp, m_cp), g_cp = jax.jit(jax.value_and_grad(cp_loss, has_aux=True))(
            sharded, ref_params, batch, key
        )
        np.testing.assert_allclose(float(l_cp), float(l_ref), rtol=1e-5)
        np.testing.assert_allclose(
            float(m_cp["policy_chosen_logp"]), float(m_ref["policy_chosen_logp"]), rtol=1e-5
        )
        flat_cp = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(g_cp)
        }
        for k, v_ref in jax.tree_util.tree_leaves_with_path(g_ref):
            np.testing.assert_allclose(
                np.asarray(flat_cp[jax.tree_util.keystr(k)]), np.asarray(v_ref),
                atol=3e-5, err_msg=jax.tree_util.keystr(k),
            )


class TestZero1:
    """Explicit reduce-scatter data parallelism (ZeRO-1): flat-sharded Adam
    state, psum_scatter'ed grads. The gathered parameters after each step
    must match the plain jit step (GSPMD, replicated optimizer) exactly."""

    def _setup(self):
        import functools

        from pgica_tpu.data.tokenizer import CaptionTokenizer
        from pgica_tpu.models import PreferenceGuidedCaptioningModel
        from pgica_tpu.training.train_step import stage1_loss_fn

        tok = CaptionTokenizer()
        model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
            tokenizer=tok, max_caption_length=8, image_size=32, seed=0,
            dropout=0.0,
        )
        rng = np.random.default_rng(0)
        ids, mask = tok.encode_batch([f"caption number {i}" for i in range(8)], 8)
        batch = {
            "image": jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32)),
            "caption_ids": jnp.asarray(ids),
            "caption_mask": jnp.asarray(mask),
        }
        loss_fn = functools.partial(
            stage1_loss_fn, module=model.module, temperature=0.5,
            augment=False, axis_name="data",
        )
        return model, batch, loss_fn

    def test_two_steps_match_jit_step(self):
        import optax

        from pgica_tpu.parallel.zero1 import make_zero1_train_step
        from pgica_tpu.training.optim import warmup_cosine_schedule
        from pgica_tpu.training.train_step import TrainState, make_stage1_train_step

        model, batch, loss_fn = self._setup()
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        sched = warmup_cosine_schedule(1e-3, warmup_steps=1, total_steps=4)
        key = jax.random.PRNGKey(0)

        # reference: plain jit step, replicated params/opt, full batch.
        # eps=1e-3 in BOTH paths: params with mathematically-zero gradients
        # (e.g. k_proj bias — softmax shift invariance) otherwise amplify
        # cross-path float noise into lr-scale junk updates under Adam.
        tx_ref = optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(sched, weight_decay=0.01, eps=1e-3)
        )
        ref_step = jax.jit(make_stage1_train_step(model.module, tx_ref, 0.5, augment=False))
        ref_state = TrainState.create(model.params, tx_ref)

        init_fn, step_fn = make_zero1_train_step(
            loss_fn, mesh, "data", learning_rate=sched,
            weight_decay=0.01, max_grad_norm=1.0, eps=1e-3,
        )
        z_state = init_fn(model.params)
        # optimizer state is genuinely sharded: moments are 1/8 per device
        mu = jax.tree_util.tree_leaves(z_state.opt_state)
        assert any(
            getattr(l, "sharding", None) is not None
            and "data" in str(getattr(l.sharding, "spec", ""))
            for l in mu if hasattr(l, "ndim") and l.ndim >= 1
        )

        jit_step = jax.jit(step_fn)
        for _ in range(2):
            ref_state, ref_metrics = ref_step(ref_state, batch, key)
            z_state, z_metrics = jit_step(z_state, batch, key)
            np.testing.assert_allclose(
                float(z_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
            )

        gathered = step_fn.gather_params(z_state)
        flat_ref = {jax.tree_util.keystr(k): v
                    for k, v in jax.tree_util.tree_leaves_with_path(ref_state.params)}
        for k, v in jax.tree_util.tree_leaves_with_path(gathered):
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(flat_ref[jax.tree_util.keystr(k)]),
                atol=2e-6, err_msg=jax.tree_util.keystr(k),
            )

    def test_frozen_mask_keeps_params(self):
        from pgica_tpu.parallel.zero1 import make_zero1_train_step
        from pgica_tpu.training.optim import freeze_labels

        model, batch, loss_fn = self._setup()
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        labels = freeze_labels(model.params, True, False)
        mask = jax.tree.map(lambda lab: lab == "train", labels)
        init_fn, step_fn = make_zero1_train_step(
            loss_fn, mesh, "data", learning_rate=1e-2,
            weight_decay=0.01, max_grad_norm=1.0, trainable_mask=mask,
        )
        z_state = init_fn(model.params)
        z_state, _ = jax.jit(step_fn)(z_state, batch, jax.random.PRNGKey(0))
        gathered = step_fn.gather_params(z_state)
        before_vis = model.params["vision_encoder"]["backbone"]
        after_vis = gathered["vision_encoder"]["backbone"]
        jax.tree.map(
            lambda a, b_: np.testing.assert_array_equal(np.asarray(a), np.asarray(b_)),
            after_vis, before_vis,
        )
        # trainable params did move
        before_q = np.asarray(
            model.params["text_encoder"]["backbone"]["block_0"]["attn"]["q_proj"]["kernel"]
        )
        after_q = np.asarray(
            gathered["text_encoder"]["backbone"]["block_0"]["attn"]["q_proj"]["kernel"]
        )
        assert not np.allclose(after_q, before_q)
