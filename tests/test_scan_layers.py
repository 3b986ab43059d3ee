"""scan-over-layers (stacked-block lax.scan) layout + ZeRO-3 FSDP semantics.

``LMConfig.scan_layers`` stacks the homogeneous transformer blocks and scans
one compiled block body over them. Under an ``fsdp``-sharded mesh this is the
canonical JAX ZeRO-3 recipe (scaling-book): parameters live sharded, each scan
iteration all-gathers ONE layer's weights inside the loop body, and remat
re-gathers on the backward pass — per-device parameter residency is
params/fsdp + one layer, which is what makes the Llama-3-8B budget of
configs/siglip_llama8b.yaml fit a v5e-8 (VERDICT r2 item 4; reference scale
target: SURVEY §7.3 "Two GPT-2 copies + a frozen reference").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pgica_tpu.models.convert import stack_scan_params, unstack_scan_params
from pgica_tpu.models.lm import TransformerLM, init_kv_cache
from pgica_tpu.models.presets import LMConfig
from pgica_tpu.parallel.mesh import MeshContext
from pgica_tpu.parallel.sharding import make_param_shardings, shard_params


def _cfg(arch: str, scan: bool) -> LMConfig:
    return LMConfig(
        vocab_size=64, hidden_size=32, num_layers=3, num_heads=4,
        num_kv_heads=2 if arch == "llama" else None,
        max_position_embeddings=32, dropout=0.0, arch=arch, scan_layers=scan,
    )


@pytest.fixture(params=["gpt2", "llama"])
def arch(request):
    return request.param


class TestScanParity:
    """Scanned and unrolled layouts are the same function of the same weights."""

    def _models(self, arch):
        un = TransformerLM(_cfg(arch, False), with_lm_head=True)
        sc = TransformerLM(_cfg(arch, True), with_lm_head=True)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 8)), jnp.int32)
        mask = jnp.asarray((np.arange(8)[None, :] < [6, 8][0:1]).repeat(2, 0), jnp.int32)
        mask = mask.at[1].set(1)
        p_un = un.init(jax.random.PRNGKey(0), ids, attention_mask=mask)["params"]
        return un, sc, ids, mask, p_un

    def test_forward_matches_unrolled(self, arch):
        un, sc, ids, mask, p_un = self._models(arch)
        p_sc = stack_scan_params(p_un)
        # stacked tree has the same treedef/shapes as a scanned-module init
        p_ref = sc.init(jax.random.PRNGKey(0), ids, attention_mask=mask)["params"]
        jax.tree.map(lambda a, b: np.testing.assert_equal(a.shape, b.shape), p_sc, p_ref)
        o_un = un.apply({"params": p_un}, ids, attention_mask=mask)
        o_sc = sc.apply({"params": p_sc}, ids, attention_mask=mask)
        np.testing.assert_allclose(o_un["logits"], o_sc["logits"], atol=1e-5)
        np.testing.assert_allclose(
            o_un["hidden_states"], o_sc["hidden_states"], atol=1e-5
        )

    def test_unstack_roundtrip(self, arch):
        _, _, _, _, p_un = self._models(arch)
        rt = unstack_scan_params(stack_scan_params(p_un))
        jax.tree.map(np.testing.assert_array_equal, rt, p_un)

    def test_decode_cache_matches_unrolled(self, arch):
        un, sc, ids, mask, p_un = self._models(arch)
        p_sc = stack_scan_params(p_un)
        caches_u = init_kv_cache(_cfg(arch, False), 2, 8)
        caches_s = init_kv_cache(_cfg(arch, True), 2, 8)
        pos = jnp.zeros((), jnp.int32)
        dm = jnp.asarray((np.arange(8)[None, :] < 1).repeat(2, 0), jnp.int32)
        ou = un.apply(
            {"params": p_un}, ids[:, :1], attention_mask=dm, caches=caches_u, position=pos
        )
        os_ = sc.apply(
            {"params": p_sc}, ids[:, :1], attention_mask=dm, caches=caches_s, position=pos
        )
        np.testing.assert_allclose(ou["logits"], os_["logits"], atol=1e-5)
        stacked_k = jnp.stack([c[0] for c in ou["caches"]])
        np.testing.assert_allclose(stacked_k, os_["caches"][0], atol=1e-5)

    def test_remat_matches(self, arch):
        """remat wraps the scanned body; values must be unchanged."""
        _, _, ids, mask, p_un = self._models(arch)
        p_sc = stack_scan_params(p_un)
        sc = TransformerLM(_cfg(arch, True), with_lm_head=True, remat=True)
        sc0 = TransformerLM(_cfg(arch, True), with_lm_head=True)
        a = sc0.apply({"params": p_sc}, ids, attention_mask=mask)["logits"]
        b = sc.apply({"params": p_sc}, ids, attention_mask=mask)["logits"]
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestScanFSDP:
    """Sharding rules + training steps on an fsdp mesh (8 virtual devices)."""

    def test_stacked_param_specs(self):
        """fsdp shards the layer dim when divisible (ZeRO-3 whole-layer
        ownership); otherwise it falls back to the inner weight dims."""
        ids = jnp.zeros((2, 8), jnp.int32)
        mesh = MeshContext(data=2, fsdp=2, model=2)
        P = jax.sharding.PartitionSpec

        # num_layers=4 % fsdp=2 == 0 -> layer-dim fsdp
        cfg4 = LMConfig(
            vocab_size=64, hidden_size=32, num_layers=4, num_heads=4,
            num_kv_heads=2, max_position_embeddings=32, dropout=0.0,
            arch="llama", scan_layers=True,
        )
        lm4 = TransformerLM(cfg4, with_lm_head=True)
        p4 = lm4.init(jax.random.PRNGKey(0), ids)["params"]
        blocks4 = make_param_shardings(p4, mesh.mesh)["blocks"]
        assert blocks4["attn"]["q_proj"]["kernel"].spec == P("fsdp", None, "model", None)
        assert blocks4["mlp"]["gate_proj"]["kernel"].spec == P("fsdp", None, "model")

        # num_layers=3 % fsdp=2 != 0 -> inner-dim fallback, layer replicated
        cfg3 = _cfg("llama", True)
        lm3 = TransformerLM(cfg3, with_lm_head=True)
        p3 = lm3.init(jax.random.PRNGKey(0), ids)["params"]
        blocks3 = make_param_shardings(p3, mesh.mesh)["blocks"]
        assert blocks3["attn"]["q_proj"]["kernel"].spec == P(None, "fsdp", "model", None)
        assert blocks3["mlp"]["gate_proj"]["kernel"].spec == P(None, "fsdp", "model")

    def test_stage1_and_stage2_steps_on_fsdp_mesh(self):
        """Composed tiny-llama with scan_layers through both real train steps
        on the siglip_llama8b layout (data x fsdp=2 x model=2)."""
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
            vision_model="tiny-vit", text_model="tiny-llama", projection_dim=16,
            tokenizer=tok, max_caption_length=8, image_size=32, seed=0,
            scan_layers=True, remat=True,
        )
        assert model.module.text_config.scan_layers
        mesh = MeshContext(data=2, fsdp=2, model=2)
        params = shard_params(model.params, mesh.mesh)
        opt = create_optimizer(
            1e-3, total_steps=2, warmup_steps=1,
            params_for_freezing=model.params, freeze_vision_backbone=True,
        )
        state = TrainState.create(params, opt)
        step = jax.jit(
            make_stage1_train_step(model.module, opt, 0.5, augment=False),
            donate_argnums=(0,),
        )
        rng = np.random.default_rng(0)
        ids, mask = tok.encode_batch([f"caption {i}" for i in range(8)], 8)
        batch = mesh.shard_batch(
            {
                "image": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
                "caption_ids": ids,
                "caption_mask": mask,
            }
        )
        state, m1 = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m1["loss"]))

        ref = jax.tree.map(lambda x: jnp.array(x, copy=True), state.params)
        opt2 = create_optimizer(1e-4, total_steps=2, warmup_steps=1)
        st2 = TrainState.create(state.params, opt2)
        step2 = jax.jit(
            make_stage2_train_step(
                model.module, opt2, beta=0.1, augment=False, mesh=mesh.mesh
            ),
            donate_argnums=(0,),
        )
        r_ids, r_mask = tok.encode_batch([f"bad {i}" for i in range(8)], 8)
        b2 = mesh.shard_batch(
            {
                "image": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
                "preferred_ids": ids, "preferred_mask": mask,
                "rejected_ids": r_ids, "rejected_mask": r_mask,
            }
        )
        _, m2 = step2(st2, ref, b2, jax.random.PRNGKey(1))
        assert np.isfinite(float(m2["loss"]))

    def test_gspmd_params_sharded_at_rest(self):
        """GSPMD scan_layers path: per-device argument bytes shrink by the
        fsdp factor (parameters genuinely sharded AT REST). Whether the
        partitioner keeps the per-layer gathers inside the loop is its cost
        model's call — on the CPU backend it provably hoists them to the
        entry (full transient residency), which is why the GUARANTEED
        ZeRO-3 path is the explicit one (parallel/zero3.py, TestZero3
        below)."""
        cfg = LMConfig(
            vocab_size=512, hidden_size=256, num_layers=4, num_heads=8,
            num_kv_heads=4, max_position_embeddings=64, dropout=0.0,
            arch="llama", scan_layers=True,
        )
        lm = TransformerLM(cfg, with_lm_head=True, remat=True)
        ids = jnp.zeros((8, 32), jnp.int32)
        mask = jnp.ones((8, 32), jnp.int32)
        params = lm.init(jax.random.PRNGKey(0), ids, attention_mask=mask)["params"]
        total_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
        mesh = MeshContext(data=2, fsdp=4)
        sharded = shard_params(params, mesh.mesh)

        def loss(p, ids, mask):
            out = lm.apply({"params": p}, ids, attention_mask=mask)
            return out["logits"].astype(jnp.float32).mean()

        comp = (
            jax.jit(jax.value_and_grad(loss))
            .lower(sharded, mesh.shard_batch({"x": np.zeros((8, 32), np.int32)})["x"], mask)
            .compile()
        )
        # per-device params ≈ total/fsdp (block weights dominate; wte/norms replicate)
        arg_bytes = comp.memory_analysis().argument_size_in_bytes
        assert arg_bytes < 0.55 * total_bytes, (arg_bytes, total_bytes)


class TestZero3:
    """Explicit per-layer-gather FSDP (parallel/zero3.py): block params live
    last-dim-sharded, gathered ONE LAYER AT A TIME inside the scan body; the
    gather's AD transpose reduce-scatters gradients. Gathered params after
    each step must match the plain jit step exactly."""

    def _setup(self, axis=("data", "fsdp"), shape=(2, 4)):
        import functools

        from pgica_tpu.data.tokenizer import CaptionTokenizer
        from pgica_tpu.models import PreferenceGuidedCaptioningModel
        from pgica_tpu.parallel.zero3 import make_zero3_module
        from pgica_tpu.training.train_step import stage1_loss_fn

        tok = CaptionTokenizer()
        model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
            tokenizer=tok, max_caption_length=8, image_size=32, seed=0,
            dropout=0.0, scan_layers=True,
        )
        mesh = jax.sharding.Mesh(
            np.asarray(jax.devices()[:8]).reshape(shape), ("data", "fsdp")
        )
        mod_z3 = make_zero3_module(model.module, axis)
        rng = np.random.default_rng(0)
        ids, mask = tok.encode_batch([f"caption number {i}" for i in range(8)], 8)
        batch = {
            "image": jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32)),
            "caption_ids": jnp.asarray(ids),
            "caption_mask": jnp.asarray(mask),
        }
        loss_fn = functools.partial(
            stage1_loss_fn, module=mod_z3, temperature=0.5,
            augment=False, axis_name=axis,
        )
        return model, mesh, batch, loss_fn

    def test_three_steps_match_jit_step(self):
        import optax

        from pgica_tpu.parallel.zero3 import make_zero3_train_step
        from pgica_tpu.training.optim import warmup_cosine_schedule
        from pgica_tpu.training.train_step import TrainState, make_stage1_train_step

        model, mesh, batch, loss_fn = self._setup()
        axis = ("data", "fsdp")
        sched = warmup_cosine_schedule(1e-3, warmup_steps=1, total_steps=4)
        key = jax.random.PRNGKey(0)

        # eps=1e-3 in BOTH paths (see TestZero1: zero-gradient params
        # otherwise amplify cross-path float noise under Adam)
        tx_ref = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(sched, weight_decay=0.01, eps=1e-3),
        )
        ref_step = jax.jit(
            make_stage1_train_step(model.module, tx_ref, 0.5, augment=False)
        )
        ref_state = TrainState.create(model.params, tx_ref)

        init_fn, step_fn = make_zero3_train_step(
            loss_fn, mesh, axis, learning_rate=sched,
            weight_decay=0.01, max_grad_norm=1.0, eps=1e-3,
        )
        z = init_fn(model.params)
        # block params genuinely sharded at rest: last dim split over the axes
        sh = z.blocks[0].sharding
        assert "fsdp" in str(sh.spec), sh.spec
        jstep = jax.jit(step_fn)
        for _ in range(3):
            ref_state, rm = ref_step(ref_state, batch, key)
            z, zm = jstep(z, batch, key)
            np.testing.assert_allclose(
                float(zm["loss"]), float(rm["loss"]), rtol=1e-5
            )
        gathered = step_fn.gather_params(z)
        flat_ref = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(ref_state.params)
        }
        for k, v in jax.tree_util.tree_leaves_with_path(gathered):
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(flat_ref[jax.tree_util.keystr(k)]),
                atol=2e-6, err_msg=jax.tree_util.keystr(k),
            )

    def test_gather_inside_loop_body(self):
        """The guaranteed ZeRO-3 dataflow: the compiled step carries block
        weight all-gathers INSIDE loop computations (one layer per scan
        iteration) — by construction, on every backend."""
        import re

        from pgica_tpu.parallel.zero3 import make_zero3_train_step

        model, mesh, batch, loss_fn = self._setup()
        init_fn, step_fn = make_zero3_train_step(
            loss_fn, mesh, ("data", "fsdp"), learning_rate=1e-3
        )
        z = init_fn(model.params)
        comp = jax.jit(step_fn).lower(z, batch, jax.random.PRNGKey(0)).compile()
        txt = comp.as_text()
        blocks = [b for b in re.split(r"\n(?=\S)", txt) if "all-gather" in b]
        non_entry = [b for b in blocks if not b.lstrip().startswith("ENTRY")]
        assert non_entry, "no all-gathers inside loop computations"

    def test_stage2_dpo_with_sharded_reference(self):
        """with_ref: the frozen DPO reference is sharded and gathered the
        same way; loss matches the unsharded stage-2 step."""
        import functools

        import optax

        from pgica_tpu.parallel.zero3 import make_zero3_module, make_zero3_train_step
        from pgica_tpu.training.train_step import (
            TrainState,
            make_stage2_train_step,
            stage2_loss_fn,
        )

        model, mesh, batch, _ = self._setup()
        axis = ("data", "fsdp")
        tok_batch = {
            "image": batch["image"],
            "preferred_ids": batch["caption_ids"],
            "preferred_mask": batch["caption_mask"],
            "rejected_ids": jnp.roll(batch["caption_ids"], 1, axis=0),
            "rejected_mask": jnp.roll(batch["caption_mask"], 1, axis=0),
        }
        mod_z3 = make_zero3_module(model.module, axis)
        loss_fn = functools.partial(
            stage2_loss_fn, module=mod_z3, beta=0.1, reference_free=False,
            length_normalized=False, label_smoothing=0.0, augment=False,
        )
        init_fn, step_fn = make_zero3_train_step(
            loss_fn, mesh, axis, learning_rate=1e-3, eps=1e-3, with_ref=True,
        )
        z = init_fn(model.params)
        ref_shards = init_fn.shard_ref(model.params)

        tx = optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(1e-3, eps=1e-3)
        )
        base_step = jax.jit(
            make_stage2_train_step(model.module, tx, beta=0.1, augment=False)
        )
        base_state = TrainState.create(model.params, tx)

        key = jax.random.PRNGKey(0)
        base_state, bm = base_step(base_state, model.params, tok_batch, key)
        z, zm = jax.jit(step_fn)(z, tok_batch, key, ref=ref_shards)
        np.testing.assert_allclose(float(zm["loss"]), float(bm["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            float(zm["reward_margin"]), float(bm["reward_margin"]), rtol=1e-4, atol=1e-7
        )

    def test_frozen_mask_keeps_params(self):
        from pgica_tpu.parallel.zero3 import make_zero3_train_step
        from pgica_tpu.training.optim import freeze_labels

        model, mesh, batch, loss_fn = self._setup()
        labels = freeze_labels(model.params, True, False)
        mask = jax.tree.map(lambda lab: lab == "train", labels)
        init_fn, step_fn = make_zero3_train_step(
            loss_fn, mesh, ("data", "fsdp"), learning_rate=1e-2,
            weight_decay=0.01, max_grad_norm=1.0, trainable_mask=mask,
        )
        z = init_fn(model.params)
        z, _ = jax.jit(step_fn)(z, batch, jax.random.PRNGKey(0))
        gathered = step_fn.gather_params(z)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            gathered["vision_encoder"]["backbone"],
            model.params["vision_encoder"]["backbone"],
        )
        before = np.asarray(
            model.params["text_encoder"]["backbone"]["blocks"]["attn"]["q_proj"]["kernel"]
        )
        after = np.asarray(
            gathered["text_encoder"]["backbone"]["blocks"]["attn"]["q_proj"]["kernel"]
        )
        assert not np.allclose(after, before)


class TestFactoryConfigSurface:
    def test_model_scan_layers_config_key(self):
        from pgica_tpu.utils.config import Config
        from pgica_tpu.utils.factories import create_model

        cfg = Config("configs/smoke.yaml")
        cfg.set("model.scan_layers", True)
        cfg.set("model.text_model", "tiny-llama")
        model = create_model(cfg)
        assert model.module.text_config.scan_layers
        assert "blocks" in model.params["text_encoder"]["backbone"]
