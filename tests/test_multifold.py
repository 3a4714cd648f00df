"""Fold-parallel (vmapped) training equals K sequential fold runs.

The reference trains folds strictly sequentially (run.py:59-76);
``parallel/multifold.py`` runs them as one vmapped program.  These tests
pin bit-level semantics: per-fold losses, metrics, BN stats, and final
params must match independent runs given the same per-fold rngs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dmf_tpu.config import default_parameters
from dmf_tpu.losses import get_classification_loss_fn, get_mask_loss_fn
from dmf_tpu.models import Encoder
from dmf_tpu.parallel import (
    index_fold_state,
    make_multifold_step,
    stack_fold_batches,
    stack_fold_states,
)
from dmf_tpu.train import (
    SingleModelOptController,
    TrainState,
    build_group_spec,
    make_single_train_step,
)

K, B, S, STEPS = 3, 4, 32, 3


def tiny_cfg():
    cfg = default_parameters()
    mc = dataclasses.replace(
        cfg.dwi_model, channels=(8, 16, 32), input_size=S,
        use_backbone=False, proj_dim=4, dropout=0.2, use_se=True,
    )
    return cfg.replace(dwi_model=mc, dce_model=mc)


def build_fold(cfg, model, seed):
    C = cfg.dwi_channel_num
    variables = model.init(
        {"params": jax.random.PRNGKey(seed),
         "dropout": jax.random.PRNGKey(seed + 100)},
        jnp.zeros((2, S, S, C)), train=False,
    )
    state = TrainState.create(variables)
    rng = np.random.RandomState(seed)
    batches = [
        {
            "imgs": jnp.asarray(rng.rand(B, S, S, C).astype(np.float32)),
            "masks": jnp.asarray(
                (rng.rand(B, S, S, 1) > 0.7).astype(np.float32)),
            "labels": jnp.asarray(rng.permutation(B) % cfg.class_num,
                                  jnp.int32),
            "aux_w": jnp.asarray(1.0, jnp.float32),
        }
        for _ in range(STEPS)
    ]
    return state, batches


def test_vmapped_folds_equal_sequential_runs():
    cfg = tiny_cfg()
    C = cfg.dwi_channel_num
    model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C,
                    num_classes=cfg.class_num)
    labels = np.arange(K * B) % cfg.class_num
    clf = get_classification_loss_fn(cfg, labels, "dwi")
    mask_fn = get_mask_loss_fn(cfg, "dwi")
    hp = SingleModelOptController(cfg, "dwi").hyperparams()

    folds = [build_fold(cfg, model, seed=s) for s in range(K)]
    fold_rngs = [jax.random.PRNGKey(1000 + s) for s in range(K)]

    # --- sequential reference: K independent jitted runs ---
    seq_losses = np.zeros((STEPS, K))
    seq_states = []
    for f, (state, batches) in enumerate(folds):
        spec = build_group_spec(state.params, cfg.dwi_model.use_backbone,
                                cfg.reference_compat)
        step = make_single_train_step(cfg, "dwi", model, clf, mask_fn, spec,
                                      donate=False)
        rng = fold_rngs[f]
        for i, b in enumerate(batches):
            rng, drop = jax.random.split(rng)
            state, metrics = step(state, b, drop, hp)
            seq_losses[i, f] = float(metrics["loss"])
        seq_states.append(state)

    # --- vmapped: one program over the stacked fold axis ---
    spec = build_group_spec(folds[0][0].params, cfg.dwi_model.use_backbone,
                            cfg.reference_compat)
    raw = make_single_train_step(cfg, "dwi", model, clf, mask_fn, spec,
                                 jit_compile=False)
    vstep = make_multifold_step(raw, donate=False)
    stacked = stack_fold_states([f[0] for f in folds])
    rngs = [fold_rngs[f] for f in range(K)]
    for i in range(STEPS):
        batch = stack_fold_batches([folds[f][1][i] for f in range(K)])
        split = [jax.random.split(r) for r in rngs]
        rngs = [s[0] for s in split]
        drops = jnp.stack([s[1] for s in split])
        stacked, metrics = vstep(stacked, batch, drops, hp)
        np.testing.assert_allclose(np.asarray(metrics["loss"]),
                                   seq_losses[i], rtol=1e-5, atol=1e-6,
                                   err_msg=f"step {i}")

    for f in range(K):
        ours = index_fold_state(stacked, f)
        flat_v, _ = jax.tree.flatten(ours.params)
        flat_s, _ = jax.tree.flatten(seq_states[f].params)
        for a, b in zip(flat_v, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)
        bs_v, _ = jax.tree.flatten(ours.batch_stats)
        bs_s, _ = jax.tree.flatten(seq_states[f].batch_stats)
        for a, b in zip(bs_v, bs_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)


def test_multifold_predictor_equals_per_fold():
    """The K-fold TTA x MC test phase as one vmapped program equals
    per-fold sequential prediction."""
    from dmf_tpu.evals import make_single_predictor
    from dmf_tpu.parallel import make_multifold_predictor

    cfg = tiny_cfg().replace(mc_passes=3)
    C = cfg.dwi_channel_num
    model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C,
                    num_classes=cfg.class_num)
    folds = [build_fold(cfg, model, seed=s) for s in range(2)]
    variables = [
        {"params": f[0].params, "batch_stats": f[0].batch_stats}
        for f in folds
    ]
    imgs = [f[1][0]["imgs"] for f in folds]
    keys = jax.random.split(jax.random.PRNGKey(0), 2)

    pred = make_single_predictor(cfg, model, mode="tta_mc")
    seq = [pred(variables[f], imgs[f], keys[f]) for f in range(2)]

    vpred = make_multifold_predictor(pred)
    m, s, _ = vpred(stack_fold_states(variables), jnp.stack(imgs), keys)
    for f in range(2):
        np.testing.assert_allclose(np.asarray(m[f]), np.asarray(seq[f][0]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s[f]), np.asarray(seq[f][1]),
                                   rtol=1e-4, atol=1e-6)


def test_per_fold_hyperparams():
    """per_fold_hp=True lets each fold run its own schedule (e.g. one
    fold's plateau fired): fold 1 with lr x10 must diverge from fold 0,
    and fold 0 must match the shared-hp result exactly."""
    cfg = tiny_cfg()
    C = cfg.dwi_channel_num
    model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C,
                    num_classes=cfg.class_num)
    labels = np.arange(2 * B) % cfg.class_num
    clf = get_classification_loss_fn(cfg, labels, "dwi")
    mask_fn = get_mask_loss_fn(cfg, "dwi")
    hp = SingleModelOptController(cfg, "dwi").hyperparams()

    folds = [build_fold(cfg, model, seed=5) for _ in range(2)]  # same init
    spec = build_group_spec(folds[0][0].params, cfg.dwi_model.use_backbone,
                            cfg.reference_compat)
    raw = make_single_train_step(cfg, "dwi", model, clf, mask_fn, spec,
                                 jit_compile=False)
    stacked = stack_fold_states([f[0] for f in folds])
    batch = stack_fold_batches([folds[0][1][0]] * 2)  # same data
    drops = jnp.stack([jax.random.PRNGKey(3)] * 2)  # same dropout

    shared = make_multifold_step(raw, donate=False)
    s_shared, _ = shared(stacked, batch, drops, hp)

    hp2 = jax.tree.map(lambda v: jnp.stack([v, v * 10.0]), hp)
    per = make_multifold_step(raw, donate=False, per_fold_hp=True)
    s_per, _ = per(stacked, batch, drops, hp2)

    p0_shared = jax.tree.leaves(index_fold_state(s_shared, 0).params)
    p0_per = jax.tree.leaves(index_fold_state(s_per, 0).params)
    for a, b in zip(p0_per, p0_shared):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    p1_per = jax.tree.leaves(index_fold_state(s_per, 1).params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)
        for a, b in zip(p1_per, p0_per)
    )


def test_fold_axis_shards_over_mesh():
    """Fold parallelism splits over the mesh data axis via shard_map (each
    device group trains its folds locally, zero collectives) and matches
    the unsharded vmapped step exactly."""
    from dmf_tpu.parallel import make_mesh

    cfg = tiny_cfg()
    C = cfg.dwi_channel_num
    model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C,
                    num_classes=cfg.class_num)
    labels = np.arange(4 * B) % cfg.class_num
    clf = get_classification_loss_fn(cfg, labels, "dwi")
    mask_fn = get_mask_loss_fn(cfg, "dwi")
    hp = SingleModelOptController(cfg, "dwi").hyperparams()

    folds = [build_fold(cfg, model, seed=s) for s in range(4)]
    spec = build_group_spec(folds[0][0].params, cfg.dwi_model.use_backbone,
                            cfg.reference_compat)
    raw = make_single_train_step(cfg, "dwi", model, clf, mask_fn, spec,
                                 jit_compile=False)
    vstep = make_multifold_step(raw, donate=False)

    stacked = stack_fold_states([f[0] for f in folds])
    batch = stack_fold_batches([folds[f][1][0] for f in range(4)])
    drops = jnp.stack([jax.random.PRNGKey(7 + f) for f in range(4)])

    _, plain_metrics = vstep(stacked, batch, drops, hp)

    mesh = make_mesh(4, 2, devices=jax.devices())
    mstep = make_multifold_step(raw, donate=False, mesh=mesh)
    out_state, metrics = mstep(stacked, batch, drops, hp)
    np.testing.assert_allclose(np.asarray(metrics["loss"]),
                               np.asarray(plain_metrics["loss"]),
                               rtol=1e-5, atol=1e-6)
    # the fold axis really is distributed
    leaf = jax.tree.leaves(out_state.params)[0]
    assert len(leaf.sharding.device_set) > 1
