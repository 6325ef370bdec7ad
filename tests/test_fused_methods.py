"""Method-dispatched fused kernels (moe / poe / jsd / joint_elbo).

Each method's split-param forward must reproduce the general path's loss,
metric families and gradients exactly (explicit noise makes both sides
deterministic); the epoch kernel must match the generic autodiff-in-Pallas
kernel step-for-step (identical noise layout); and the trainer must select
the method kernel for non-flagship methods.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.models import build_model, make_modalities
from multivae_tpu.ops import fused_methods as fm
from multivae_tpu.ops.fused_step import (
    FusedConsts,
    dims_from,
    flatten_params,
    join_params,
    split_params,
    unflatten_grads,
)
from multivae_tpu.train import Config
from multivae_tpu.train.losses import total_loss
from multivae_tpu.train.train_step import init_train_state

pytestmark = pytest.mark.driver  # Pallas method-kernel parity

B = 48
METHODS = ("joint_elbo", "moe", "jsd", "poe")


_SETUP_CACHE = {}


def make_setup(method, dropout_rate=0.0):
    """Built setups are cached per (method, dropout) — model init is a
    multi-second trace+compile and several test classes share it. Callers
    must NOT mutate the returned cfg/model."""
    key = (method, dropout_rate)
    if key in _SETUP_CACHE:
        return _SETUP_CACHE[key]
    rng = np.random.default_rng(0)
    cfg = Config(method=method, input_dim=[7, 36], style_dim=[3, 5],
                 class_dim=6, hidden_dim=32, num_hidden_layer_encoder=1,
                 num_hidden_layer_decoder=0, beta=1.3, beta_style=0.7,
                 beta_content=1.9, learn_output_scale=True,
                 dropout_rate=dropout_rate, batch_size=B).derive()
    model = build_model(cfg, make_modalities(cfg.input_dim, cfg.style_dim,
                                             cfg.likelihood))
    batch = {
        "clinical": jnp.asarray(rng.normal(size=(B, 7)).astype(np.float32)),
        "rois": jnp.asarray(rng.normal(size=(B, 36)).astype(np.float32)),
    }
    params, opt_state = init_train_state(cfg, model, batch)
    noise = jnp.asarray(rng.normal(size=(B, fm.noise_width(cfg)))
                        .astype(np.float32))
    _SETUP_CACHE[key] = (cfg, model, batch, params, opt_state, noise)
    return _SETUP_CACHE[key]


def general_loss(cfg, model, params, batch, noise):
    cd, (s1, s2) = cfg.class_dim, cfg.style_dim
    main_w = cd + s1 + s2
    noise_uni = None
    if cfg.method == "poe":
        noise_uni = {"clinical": noise[:, main_w:main_w + cd + s1],
                     "rois": noise[:, main_w + cd + s1:]}
    out = model.apply({"params": params}, batch, train=True,
                      noise=noise[:, :main_w])
    return total_loss(cfg, model, {"params": params}, batch, out, None,
                      train=True, noise_uni=noise_uni)


class TestSplitForwardParity:
    @pytest.mark.parametrize("method", [
        "joint_elbo",
        # the grads test below re-derives each method's loss value on the
        # same split forward; the metric-family comparison for the other
        # methods stays in the slow suite
        pytest.param("moe", marks=pytest.mark.slow),
        pytest.param("poe", marks=pytest.mark.slow),
        pytest.param("jsd", marks=pytest.mark.slow),
    ])
    def test_loss_metrics_match_general_path(self, method):
        cfg, model, batch, params, _, noise = make_setup(method)
        # jit both sides: eager op-by-op dispatch is ~4x slower on this
        # 1-core host and jitted is what production runs anyway
        loss_ref, metrics_ref = jax.jit(
            lambda p: general_loss(cfg, model, p, batch, noise))(params)
        dims = dims_from(cfg, B)
        consts = FusedConsts(cfg.beta, cfg.beta_style, cfg.beta_content)
        sp = split_params(flatten_params(params, model), dims)
        loss_sp, mlist = jax.jit(lambda s: fm.method_loss_split(
            method, dims, consts, True, False, s, batch["clinical"],
            batch["rois"], noise))(sp)
        np.testing.assert_allclose(float(loss_sp), float(loss_ref),
                                   rtol=1e-5)
        mnames = fm.method_metric_names(model, method)
        assert set(mnames) == set(metrics_ref)
        for j, name in enumerate(mnames):
            np.testing.assert_allclose(float(mlist[j]),
                                       float(metrics_ref[name]),
                                       rtol=2e-4, atol=1e-5)

    @pytest.mark.parametrize("method", METHODS)
    def test_grads_match_general_path(self, method):
        cfg, model, batch, params, _, noise = make_setup(method)
        dims = dims_from(cfg, B)
        consts = FusedConsts(cfg.beta, cfg.beta_style, cfg.beta_content)

        g_ref = jax.jit(jax.grad(lambda p: general_loss(
            cfg, model, p, batch, noise)[0]))(params)
        sp = split_params(flatten_params(params, model), dims)
        g_sp = jax.jit(jax.grad(lambda s: fm.method_loss_split(
            cfg.method, dims, consts, True, False, s, batch["clinical"],
            batch["rois"], noise)[0]))(sp)
        g_sp_tree = unflatten_grads(join_params(g_sp, dims), params, model)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_sp_tree)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestMethodEpochKernel:
    @pytest.mark.parametrize("method", [
        # poe is the trickiest epoch plumbing (unimodal ELBO re-runs);
        # the others exercise the same scan wiring and their exactness
        # stays covered in the slow suite
        "poe",
        pytest.param("joint_elbo", marks=pytest.mark.slow),
        pytest.param("moe", marks=pytest.mark.slow),
        pytest.param("jsd", marks=pytest.mark.slow),
    ])
    def test_matches_generic_fused_epoch(self, method):
        """Same noise column layout as the generic kernel -> step-for-step
        agreement of losses and trained params."""
        from multivae_tpu.ops.fused_generic import make_generic_fused_epoch

        cfg, model, batch, params, opt_state, _ = make_setup(method)
        n_steps = 3
        batches = {k: jnp.stack([v] * n_steps) for k, v in batch.items()}
        rngs = jax.random.split(jax.random.PRNGKey(0), n_steps)
        p_g, o_g, l_g, m_g = make_generic_fused_epoch(
            cfg, model, interpret=True)(params, opt_state, batches, rngs)
        p_m, o_m, l_m, m_m = fm.make_method_fused_epoch(
            cfg, model, interpret=True)(params, opt_state, batches, rngs)
        np.testing.assert_allclose(np.asarray(l_m), np.asarray(l_g),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p_g),
                        jax.tree_util.tree_leaves(p_m)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
        assert set(m_g) == set(m_m)
        assert int(o_m.count) == n_steps


class TestSupport:
    def test_supported_methods(self):
        for method in METHODS:
            cfg, model, batch, *_ = make_setup(method)
            assert fm.supports_method_fused(cfg, model, batch)

    def test_unsupported(self):
        cfg, model, batch, *_ = make_setup("moe")
        assert not fm.supports_method_fused(
            cfg, model, {"clinical": batch["clinical"]})
        cfg2 = Config(method="moe", input_dim=[7, 36], style_dim=[3, 5],
                      class_dim=6, hidden_dim=32,
                      num_hidden_layer_encoder=2,
                      num_hidden_layer_decoder=0, batch_size=B).derive()
        model2 = build_model(cfg2, make_modalities(
            cfg2.input_dim, cfg2.style_dim, cfg2.likelihood))
        assert not fm.supports_method_fused(cfg2, model2, batch)


class TestDropout:
    """dropout_rate > 0 trains on the fused kernel (VERDICT Weak #5):
    streamed pre-scaled keep masks reproduce flax Dropout's law."""

    def test_supported_with_dropout(self):
        cfg, model, batch, *_ = make_setup("moe", dropout_rate=0.3)
        assert fm.supports_method_fused(cfg, model, batch)

    @pytest.mark.slow
    @pytest.mark.parametrize("method", ["joint_elbo", "poe"])
    def test_statistical_parity_with_general_path(self, method):
        """Initial-loss distribution over dropout draws matches the general
        path's (same params, fresh masks each side). Slow: 25 independent
        interpret-mode kernel dispatches per method; the fast suite keeps
        the dropout smoke (``test_dropout_training_progresses``)."""

        cfg, model, batch, params, opt_state, _ = make_setup(
            method, dropout_rate=0.4)
        fn = fm.make_method_fused_epoch(cfg, model, interpret=True)
        batches = {k: v[None] for k, v in batch.items()}
        k_losses = []
        for seed in range(25):
            _, _, losses, _ = fn(params, opt_state, batches,
                                 jax.random.PRNGKey(seed)[None])
            k_losses.append(float(losses[0]))

        def gen_loss(seed):
            rng_model, rng_loss, rng_drop = jax.random.split(
                jax.random.PRNGKey(1000 + seed), 3)
            out = model.apply({"params": params}, batch, train=True,
                              rngs={"sample": rng_model,
                                    "dropout": rng_drop})
            return float(total_loss(cfg, model, {"params": params}, batch,
                                    out, rng_loss, train=True)[0])

        g_losses = [gen_loss(s) for s in range(25)]
        km, gm = np.mean(k_losses), np.mean(g_losses)
        sem = np.sqrt(np.var(k_losses) / 25 + np.var(g_losses) / 25)
        assert abs(km - gm) < max(4 * sem, 0.02 * abs(gm)), (km, gm, sem)

    def test_dropout_training_progresses(self):
        cfg, model, batch, params, opt_state, _ = make_setup(
            "moe", dropout_rate=0.2)
        n_steps = 30
        batches = {k: jnp.stack([v] * n_steps) for k, v in batch.items()}
        rngs = jax.random.split(jax.random.PRNGKey(0), n_steps)
        fn = fm.make_method_fused_epoch(cfg, model, interpret=True)
        _, _, losses, _ = fn(params, opt_state, batches, rngs)
        losses = np.asarray(losses)
        assert np.isfinite(losses).all()
        assert losses[-5:].mean() < losses[:5].mean()


@pytest.mark.slow
class TestTrainerSelectsMethodKernel:
    @pytest.mark.parametrize("method", ["moe", "poe"])
    def test_selection(self, tmp_path, monkeypatch, method):
        import multivae_tpu.ops.fused_methods as fmod
        from multivae_tpu.data import make_synthetic_cohort
        from multivae_tpu.workflows import train_exp

        calls = []
        orig = fmod.make_method_fused_epoch

        def spy(cfg, model, **kw):
            calls.append(cfg.method)
            return orig(cfg, model, **kw)

        monkeypatch.setattr(fmod, "make_method_fused_epoch", spy)
        datasetdir = str(tmp_path / "data")
        import os
        os.makedirs(str(tmp_path / "out"), exist_ok=True)
        make_synthetic_cohort(datasetdir, n_subjects=64, n_scores=4,
                              n_rois=16, missing_rate=0.0, seed=3)
        train_exp(dataset="synthetic", datasetdir=datasetdir,
                  outdir=str(tmp_path / "out"), input_dims=[4, 16],
                  latent_dim=4, style_dim=[2, 3], num_epochs=2,
                  batch_size=16, method=method, learning_rate=0.01,
                  use_tensorboard=False)
        assert calls and calls[0] == method
