"""SPMD tests on the virtual 8-device CPU mesh: DP equivalence with
single-device training, TP sharding of wide layers, collective execution."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dmf_tpu.config import default_parameters
from dmf_tpu.losses import soft_weighted_focal_loss
from dmf_tpu.models import Encoder
from dmf_tpu.parallel import (
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    make_spmd_step,
    param_spec,
    shard_state,
    state_shardings,
)
from dmf_tpu.train import (
    SingleModelOptController,
    TrainState,
    build_group_spec,
    make_single_train_step,
)


def tiny_cfg():
    cfg = default_parameters(batch_size=8)
    mc = dataclasses.replace(
        cfg.dwi_model, channels=(8, 16, 32), input_size=16,
        use_backbone=False, proj_dim=4, dropout=0.0,
        mask=dataclasses.replace(cfg.dwi_model.mask, mask_target_size=(16, 16)),
    )
    return cfg.replace(dwi_model=mc)


def build(cfg):
    model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=3,
                    num_classes=4)
    x = jnp.zeros((8, 16, 16, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    return model, TrainState.create(variables)


class TestMesh:
    def test_eight_devices(self):
        assert len(jax.devices()) == 8

    def test_mesh_shapes(self):
        mesh = make_mesh(4, 2)
        assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


class TestDPEquivalence:
    def test_sharded_step_matches_single_device(self):
        cfg = tiny_cfg()
        model, state = build(cfg)
        clf = lambda lo, t: soft_weighted_focal_loss(lo, t, 1.5, None)
        from dmf_tpu.losses import soft_dice_loss

        spec = build_group_spec(state.params, False, True)
        raw_step = make_single_train_step(
            cfg, "dwi", model, clf, soft_dice_loss, spec, jit_compile=False
        )
        controller = SingleModelOptController(cfg, "dwi")
        hp = controller.hyperparams()

        rng = jax.random.PRNGKey(5)
        batch = {
            "imgs": jax.random.uniform(rng, (8, 16, 16, 3)),
            "masks": (jax.random.uniform(rng, (8, 16, 16, 1)) > 0.5).astype(
                jnp.float32
            ),
            "labels": jnp.asarray(np.arange(8) % 4, jnp.int32),
            "aux_w": jnp.asarray(1.0),
        }

        # single-device reference
        s1, m1 = jax.jit(raw_step)(state, batch, rng, hp)

        # 8-way data parallel
        mesh = make_mesh(8, 1)
        state_sh = state_shardings(state, mesh)
        sharded = shard_state(state, mesh)
        step, place = make_spmd_step(raw_step, mesh, state_sh, donate=False)
        s8, m8 = step(sharded, place(batch), rng, hp)

        assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4
        l1 = jax.tree.leaves(s1.params)
        l8 = jax.tree.leaves(s8.params)
        for a, b in zip(l1, l8):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestTPSharding:
    def test_transformer_kernels_get_model_axis(self):
        path = (jax.tree_util.DictKey("transformer"),
                jax.tree_util.DictKey("block0"),
                jax.tree_util.DictKey("attn"),
                jax.tree_util.DictKey("qkv"),
                jax.tree_util.DictKey("kernel"))
        spec = param_spec(path, jnp.zeros((64, 192)), model_size=2)
        assert spec == P(None, MODEL_AXIS)
        path2 = (jax.tree_util.DictKey("transformer"),
                 jax.tree_util.DictKey("block0"),
                 jax.tree_util.DictKey("attn"),
                 jax.tree_util.DictKey("proj"),
                 jax.tree_util.DictKey("kernel"))
        spec2 = param_spec(path2, jnp.zeros((64, 64)), model_size=2)
        assert spec2 == P(MODEL_AXIS, None)

    def test_tp_forward_matches_replicated(self):
        cfg = tiny_cfg()
        mc = dataclasses.replace(
            cfg.dwi_model, use_hybrid_transformer=True,
            transformer_embed_dim=32, transformer_depth=1, transformer_heads=2,
        )
        cfg = cfg.replace(dwi_model=mc)
        model, state = build(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(2), (8, 16, 16, 3))

        ref_logits, _, _ = model.apply(state.variables, x, train=False)

        mesh = make_mesh(4, 2)
        sharded = shard_state(state, mesh)
        xb = jax.device_put(x, batch_sharding(mesh))
        fwd = jax.jit(lambda v, xx: model.apply(v, xx, train=False)[0])
        tp_logits = fwd(sharded.variables, xb)
        assert np.allclose(np.asarray(ref_logits), np.asarray(tp_logits),
                           atol=1e-4)


class TestCollectives:
    def test_psum_over_mesh(self):
        from jax import shard_map

        mesh = make_mesh(8, 1)
        x = jnp.arange(8.0)

        @jax.jit
        def summed(x):
            return shard_map(
                lambda v: jax.lax.psum(v, "data"),
                mesh=mesh, in_specs=P("data"), out_specs=P("data"),
            )(x)

        out = summed(x)
        assert np.allclose(np.asarray(out), np.full(8, 28.0))
