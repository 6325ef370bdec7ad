"""Presence-specialized fused kernels (missing-modality batches).

The single-present split-param forward must reproduce the general path's
loss, metric families and gradients exactly on a one-modality batch
(explicit noise makes both sides deterministic); the epoch kernel must
match a step-by-step general-path epoch (same noise law, flat-Adam
updates); and the shared group factory must route eligible groups to the
kernel in both drivers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.models import build_model, make_modalities
from multivae_tpu.ops import fused_presence as fp
from multivae_tpu.ops.fused_step import (
    FusedConsts,
    dims_from,
    flatten_params,
    split_params,
)
from multivae_tpu.train import Config
from multivae_tpu.train.losses import total_loss
from multivae_tpu.train.train_step import init_train_state, make_optimizer

pytestmark = pytest.mark.driver  # Pallas presence-kernel parity

B = 48
METHODS = ("joint_elbo", "moe", "jsd", "poe")
MODS = ("clinical", "rois")


_SETUP_CACHE = {}


def make_setup(method, dropout_rate=0.0):
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
    full_batch = {
        "clinical": jnp.asarray(rng.normal(size=(B, 7)).astype(np.float32)),
        "rois": jnp.asarray(rng.normal(size=(B, 36)).astype(np.float32)),
    }
    params, opt_state = init_train_state(cfg, model, full_batch)
    _SETUP_CACHE[key] = (cfg, model, full_batch, params, opt_state)
    return _SETUP_CACHE[key]


def general_loss_single(cfg, model, params, batch, mod_idx, noise):
    """General-path loss on a single-modality batch with explicit noise
    (same layout as the presence kernel: main cd|s, poe appends cd|s)."""
    name = MODS[mod_idx]
    cd, s = cfg.class_dim, cfg.style_dim[mod_idx]
    main_w = cd + s
    noise_uni = None
    if cfg.method == "poe":
        noise_uni = {name: noise[:, main_w:]}
    out = model.apply({"params": params}, batch, train=True,
                      noise=noise[:, :main_w])
    return total_loss(cfg, model, {"params": params}, batch, out, None,
                      train=True, noise_uni=noise_uni)


class TestPresenceForwardParity:
    @pytest.mark.parametrize("method", METHODS)
    @pytest.mark.parametrize("mod_idx", [0, 1])
    def test_loss_metrics_match_general_path(self, method, mod_idx):
        cfg, model, full_batch, params, _ = make_setup(method)
        name = MODS[mod_idx]
        batch = {name: full_batch[name]}
        rng = np.random.default_rng(3 + mod_idx)
        noise = jnp.asarray(rng.normal(
            size=(B, fp.presence_noise_width(cfg, mod_idx))).astype(np.float32))
        loss_ref, metrics_ref = jax.jit(
            lambda p: general_loss_single(cfg, model, p, batch, mod_idx,
                                          noise))(params)
        dims = dims_from(cfg, B)
        consts = FusedConsts(cfg.beta, cfg.beta_style, cfg.beta_content)
        sp = split_params(flatten_params(params, model), dims)
        loss_sp, mlist = jax.jit(lambda s: fp.presence_loss_split(
            method, dims, consts, True, False, mod_idx, s,
            batch[name], noise))(sp)
        np.testing.assert_allclose(float(loss_sp), float(loss_ref),
                                   rtol=1e-5)
        mnames = fp.presence_metric_names(model, method, mod_idx)
        assert set(mnames) == set(metrics_ref)
        for j, mname in enumerate(mnames):
            np.testing.assert_allclose(float(mlist[j]),
                                       float(metrics_ref[mname]),
                                       rtol=2e-4, atol=1e-5)

    @pytest.mark.parametrize("method", METHODS)
    @pytest.mark.parametrize("mod_idx", [0, pytest.param(1, marks=pytest.mark.slow)])
    def test_grads_match_general_path(self, method, mod_idx):
        cfg, model, full_batch, params, _ = make_setup(method)
        name = MODS[mod_idx]
        batch = {name: full_batch[name]}
        rng = np.random.default_rng(11)
        noise = jnp.asarray(rng.normal(
            size=(B, fp.presence_noise_width(cfg, mod_idx))).astype(np.float32))
        dims = dims_from(cfg, B)
        consts = FusedConsts(cfg.beta, cfg.beta_style, cfg.beta_content)

        g_ref = jax.jit(jax.grad(lambda p: general_loss_single(
            cfg, model, p, batch, mod_idx, noise)[0]))(params)
        sp = split_params(flatten_params(params, model), dims)
        g_sp = jax.jit(jax.grad(lambda s: fp.presence_loss_split(
            method, dims, consts, True, False, mod_idx, s, batch[name],
            noise)[0]))(sp)
        from multivae_tpu.ops.fused_step import join_params, unflatten_grads
        g_sp_tree = unflatten_grads(join_params(g_sp, dims), params, model)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_sp = jax.tree_util.tree_leaves_with_path(g_sp_tree)
        other = MODS[1 - mod_idx]
        for (path_r, a), (path_s, b) in zip(flat_ref, flat_sp):
            assert path_r == path_s
            label = jax.tree_util.keystr(path_r)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=label)
            if other in label:
                # absent-modality params: exactly zero on both sides
                assert not np.any(np.asarray(b)), label


class TestPresenceEpochKernel:
    @pytest.mark.parametrize("method", [
        "joint_elbo",
        pytest.param("moe", marks=pytest.mark.slow),
        pytest.param("jsd", marks=pytest.mark.slow),
        "poe",
    ])
    def test_epoch_matches_general_steps(self, method):
        """The interpret-mode epoch kernel over n_steps one-modality batches
        equals a step-by-step general-path epoch with the same noise draws
        and the flat-Adam update law."""
        cfg, model, full_batch, params, opt_state = make_setup(method)
        mod_idx = 1
        name = MODS[mod_idx]
        n_steps = 3
        rng = np.random.default_rng(21)
        xs = jnp.asarray(rng.normal(
            size=(n_steps, B, cfg.input_dim[mod_idx])).astype(np.float32))
        rngs = jax.random.split(jax.random.PRNGKey(5), n_steps)

        scan_fn = fp.make_presence_fused_epoch(cfg, model, mod_idx,
                                               interpret=True)
        p_k, o_k, losses_k, metrics_k = scan_fn(params, opt_state,
                                                {name: xs}, rngs)

        # reference: general path + flat-Adam, one step at a time, drawing
        # the same noise from the same keys
        opt = make_optimizer(cfg)
        w = fp.presence_noise_width(cfg, mod_idx)
        p_ref, o_ref = params, opt_state
        losses_ref = []
        import optax
        for i in range(n_steps):
            noise = jax.random.normal(rngs[i], (B, w), jnp.float32)
            batch = {name: xs[i]}
            (loss, _), grads = jax.value_and_grad(
                lambda p: general_loss_single(cfg, model, p, batch, mod_idx,
                                              noise), has_aux=True)(p_ref)
            updates, o_ref = opt.update(grads, o_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, updates)
            losses_ref.append(float(loss))

        np.testing.assert_allclose(np.asarray(losses_k),
                                   np.asarray(losses_ref), rtol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p_k),
                        jax.tree_util.tree_leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-6)
        assert int(o_k.count) == int(o_ref.count)
        np.testing.assert_allclose(np.asarray(o_k.mu), np.asarray(o_ref.mu),
                                   rtol=2e-3, atol=1e-7)

    def test_dropout_masks_flow(self):
        """With dropout on, the kernel still runs and poe re-runs use a
        distinct mask stream (loss differs from the dropout-off kernel)."""
        cfg, model, full_batch, params, opt_state = make_setup(
            "poe", dropout_rate=0.3)
        mod_idx = 0
        name = MODS[mod_idx]
        xs = full_batch[name][None]
        rngs = jax.random.split(jax.random.PRNGKey(9), 1)
        scan_fn = fp.make_presence_fused_epoch(cfg, model, mod_idx,
                                               interpret=True)
        _, _, losses_d, _ = scan_fn(params, opt_state, {name: xs}, rngs)
        cfg0, model0, _, params0, opt0 = make_setup("poe")
        scan0 = fp.make_presence_fused_epoch(cfg0, model0, mod_idx,
                                             interpret=True)
        _, _, losses_0, _ = scan0(params0, opt0, {name: xs}, rngs)
        assert np.isfinite(float(losses_d[0]))
        assert abs(float(losses_d[0]) - float(losses_0[0])) > 1e-6


class TestGroupFactoryRouting:
    def test_presence_groups_route_to_kernel(self):
        from multivae_tpu.train.trainer import make_group_fused_epoch

        cfg, model, _, _, _ = make_setup("joint_elbo")
        # single-present groups: kernel for any row count
        assert make_group_fused_epoch(cfg, model, (("rois",), 48)) is not None
        assert make_group_fused_epoch(cfg, model, (("clinical",), 13)) is not None
        # complete partial-size groups: method kernel
        assert make_group_fused_epoch(
            cfg, model, (("clinical", "rois"), 17)) is not None

    def test_unsupported_config_falls_back(self):
        from multivae_tpu.train.trainer import make_group_fused_epoch

        rng = np.random.default_rng(0)
        cfg = Config(method="joint_elbo", input_dim=[7, 36],
                     style_dim=[3, 5], class_dim=6, hidden_dim=32,
                     num_hidden_layer_encoder=2,  # unsupported depth
                     num_hidden_layer_decoder=0, batch_size=B).derive()
        model = build_model(cfg, make_modalities(cfg.input_dim,
                                                 cfg.style_dim,
                                                 cfg.likelihood))
        assert make_group_fused_epoch(cfg, model, (("rois",), 48)) is None
        cfg2 = Config(method="joint_elbo", input_dim=[7, 36],
                      style_dim=[3, 5], class_dim=6, hidden_dim=32,
                      fused_training=False, batch_size=B).derive()
        model2 = build_model(cfg2, make_modalities(cfg2.input_dim,
                                                   cfg2.style_dim,
                                                   cfg2.likelihood))
        assert make_group_fused_epoch(cfg2, model2, (("rois",), 48)) is None

    def test_supports_predicate(self):
        cfg, model, _, _, _ = make_setup("moe")
        assert fp.supports_presence_fused(cfg, model, {"rois": None})
        assert fp.supports_presence_fused(cfg, model, {"clinical": None})
        assert not fp.supports_presence_fused(
            cfg, model, {"clinical": None, "rois": None})
        assert not fp.supports_presence_fused(cfg, model, {})
