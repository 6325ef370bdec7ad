"""Generic autodiff-in-Pallas epoch kernel: step-exact equivalence with the
general jitted path for every method (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.models import build_model, make_modalities
from multivae_tpu.ops.fused_generic import (
    make_generic_fused_epoch,
    supports_generic_fused,
)
from multivae_tpu.train import Config
from multivae_tpu.train.train_step import init_train_state, make_train_step

pytestmark = pytest.mark.driver  # generic fused-kernel parity

B, CH = 32, 4


def setup(method):
    cfg = Config(method=method, input_dim=[5, 16], class_dim=4,
                 style_dim=[2, 3], hidden_dim=16,
                 num_hidden_layer_encoder=1, num_hidden_layer_decoder=0,
                 learn_output_scale=True,
                 initial_learning_rate=0.01).derive()
    model = build_model(cfg, make_modalities(cfg.input_dim, cfg.style_dim,
                                             cfg.likelihood))
    rng = np.random.default_rng(0)
    batch = {"clinical": jnp.asarray(rng.normal(size=(B, 5))
                                     .astype(np.float32)),
             "rois": jnp.asarray(rng.normal(size=(B, 16))
                                 .astype(np.float32))}
    params, opt_state = init_train_state(cfg, model, batch)
    return cfg, model, batch, params, opt_state


@pytest.mark.parametrize("method", [
    "joint_elbo",
    # the other methods differ from joint_elbo only in the loss-assembly
    # branch (poe also re-runs unimodal ELBOs, covered exactly by the
    # method-kernel parity tests); their exactness stays in the slow suite
    pytest.param("poe", marks=pytest.mark.slow),
    pytest.param("moe", marks=pytest.mark.slow),
    pytest.param("jsd", marks=pytest.mark.slow),
])
def test_matches_general_path(method):
    """Same per-step keys => the kernel must reproduce the general steps.

    The general path and the kernel both draw one fused normal per step from
    the same key, so losses and params agree to float tolerance... except the
    rng consumption layout differs (kernel pre-draws a wider block), so this
    checks convergence-level equality rather than bitwise.
    """
    cfg, model, batch, params, opt_state = setup(method)
    assert supports_generic_fused(cfg, model, batch)
    batches = {k: jnp.asarray(np.stack([np.asarray(v)] * CH))
               for k, v in batch.items()}
    rngs = jax.random.split(jax.random.PRNGKey(0), CH)
    epoch_fn = make_generic_fused_epoch(cfg, model, interpret=True)
    p_e, s_e, losses_e, metrics_e = epoch_fn(params, opt_state, batches,
                                             rngs)
    assert np.isfinite(np.asarray(losses_e)).all()
    assert int(s_e.count) == CH

    step = make_train_step(cfg, model, donate=False)
    p_s, s_s = params, opt_state
    for i in range(CH):
        p_s, s_s, loss_s, _ = step(p_s, s_s, batch, rngs[i])
    # a handful of steps from the same init on the same data: trajectories
    # must stay close (the reparam draws differ only in stream layout)
    rel = abs(float(losses_e[-1]) - float(loss_s)) / abs(float(loss_s))
    assert rel < 0.1, (float(losses_e[-1]), float(loss_s))


@pytest.mark.parametrize("likelihood", ["laplace",
                                        pytest.param(
                                            "bernoulli",
                                            marks=pytest.mark.slow),
                                        pytest.param("categorical",
                                                     marks=pytest.mark.slow)])
def test_matches_general_path_other_likelihoods(likelihood):
    """The traced-model kernel serves every likelihood family the config
    can name (the reference's four, ``modality.py:18-30``): laplace,
    bernoulli and categorical configs train on the kernel and track the
    general path (normal is the flagship, covered everywhere else)."""
    cfg = Config(method="joint_elbo", input_dim=[5, 16], class_dim=4,
                 style_dim=[2, 3], hidden_dim=16,
                 num_hidden_layer_encoder=1, num_hidden_layer_decoder=0,
                 likelihood=likelihood,
                 learn_output_scale=(likelihood == "laplace"),
                 initial_learning_rate=0.01).derive()
    model = build_model(cfg, make_modalities(cfg.input_dim, cfg.style_dim,
                                             cfg.likelihood))
    rng = np.random.default_rng(3)
    if likelihood == "bernoulli":
        batch = {"clinical": jnp.asarray(
            (rng.uniform(size=(B, 5)) < 0.4).astype(np.float32)),
            "rois": jnp.asarray(
                (rng.uniform(size=(B, 16)) < 0.4).astype(np.float32))}
    elif likelihood == "categorical":
        def onehot(n, d):
            idx = rng.integers(0, d, size=n)
            out = np.zeros((n, d), np.float32)
            out[np.arange(n), idx] = 1.0
            return out
        batch = {"clinical": jnp.asarray(onehot(B, 5)),
                 "rois": jnp.asarray(onehot(B, 16))}
    else:
        batch = {"clinical": jnp.asarray(rng.normal(size=(B, 5))
                                         .astype(np.float32)),
                 "rois": jnp.asarray(rng.normal(size=(B, 16))
                                     .astype(np.float32))}
    params, opt_state = init_train_state(cfg, model, batch)
    assert supports_generic_fused(cfg, model, batch)
    batches = {k: jnp.asarray(np.stack([np.asarray(v)] * CH))
               for k, v in batch.items()}
    rngs = jax.random.split(jax.random.PRNGKey(0), CH)
    epoch_fn = make_generic_fused_epoch(cfg, model, interpret=True)
    p_e, s_e, losses_e, _ = epoch_fn(params, opt_state, batches, rngs)
    assert np.isfinite(np.asarray(losses_e)).all()

    step = make_train_step(cfg, model, donate=False)
    p_s, s_s = params, opt_state
    for i in range(CH):
        p_s, s_s, loss_s, _ = step(p_s, s_s, batch, rngs[i])
    rel = abs(float(losses_e[-1]) - float(loss_s)) / abs(float(loss_s))
    assert rel < 0.1, (float(losses_e[-1]), float(loss_s))


def test_unsupported_cases():
    cfg, model, batch, _, _ = setup("joint_elbo")
    assert not supports_generic_fused(cfg, model,
                                      {"clinical": batch["clinical"]})
    # dropout is now SUPPORTED (streamed per-step keys; flax's threefry
    # fold_in + bernoulli lower in Mosaic)
    cfg2, model2, batch2, _, _ = setup("moe")
    cfg2.dropout_rate = 0.5
    assert supports_generic_fused(cfg2, model2, batch2)


class TestDropoutDeepArch:
    """Deep-decoder + dropout configs (outside the split-layout kernels)
    train on the generic kernel with in-kernel flax dropout."""

    @staticmethod
    def _setup(method):
        from multivae_tpu.train.train_step import init_train_state

        rng = np.random.default_rng(0)
        cfg = Config(method=method, input_dim=[5, 16], class_dim=4,
                     style_dim=[2, 3], hidden_dim=16,
                     num_hidden_layer_encoder=1,
                     num_hidden_layer_decoder=1, dropout_rate=0.4,
                     learn_output_scale=True, batch_size=B,
                     initial_learning_rate=0.01).derive()
        model = build_model(cfg, make_modalities(
            cfg.input_dim, cfg.style_dim, cfg.likelihood))
        batch = {"clinical": jnp.asarray(
            rng.normal(size=(B, 5)).astype(np.float32)),
            "rois": jnp.asarray(rng.normal(size=(B, 16))
                                .astype(np.float32))}
        params, opt_state = init_train_state(cfg, model, batch)
        assert supports_generic_fused(cfg, model, batch)
        return cfg, model, batch, params, opt_state

    @pytest.mark.slow
    @pytest.mark.parametrize("method", ["joint_elbo", "poe"])
    def test_statistical_parity_with_general_path(self, method):
        """Initial-loss distribution over dropout draws matches the general
        path's. Slow: 20 independent interpret-mode kernel dispatches per
        method; the fast suite keeps the training smoke below."""
        from multivae_tpu.train.losses import total_loss

        cfg, model, batch, params, opt_state = self._setup(method)
        fn = make_generic_fused_epoch(cfg, model, interpret=True)
        single = {k: v[None] for k, v in batch.items()}
        k_losses = []
        for seed in range(20):
            _, _, losses, _ = fn(params, opt_state, single,
                                 jax.random.PRNGKey(seed)[None])
            k_losses.append(float(losses[0]))

        def gen_loss(seed):
            rm, rl, rd = jax.random.split(jax.random.PRNGKey(1000 + seed),
                                          3)
            out = model.apply({"params": params}, batch, train=True,
                              rngs={"sample": rm, "dropout": rd})
            return float(total_loss(cfg, model, {"params": params}, batch,
                                    out, rl, train=True)[0])

        g_losses = [gen_loss(s) for s in range(20)]
        km, gm = np.mean(k_losses), np.mean(g_losses)
        sem = np.sqrt(np.var(k_losses) / 20 + np.var(g_losses) / 20)
        assert abs(km - gm) < max(4 * sem, 0.02 * abs(gm)), (km, gm, sem)

    @pytest.mark.parametrize("method", [
        "joint_elbo",
        pytest.param("poe", marks=pytest.mark.slow)])
    def test_dropout_training_progresses(self, method):
        """The deep-decoder + dropout config trains on the generic kernel:
        one scanned dispatch, finite and decreasing losses."""
        cfg, model, batch, params, opt_state = self._setup(method)
        fn = make_generic_fused_epoch(cfg, model, interpret=True)
        n_steps = 20
        batches = {k: jnp.stack([v] * n_steps) for k, v in batch.items()}
        _, _, losses, _ = fn(params, opt_state, batches,
                             jax.random.split(jax.random.PRNGKey(0),
                                              n_steps))
        losses = np.asarray(losses)
        assert np.isfinite(losses).all()
        assert losses[-5:].mean() < losses[:5].mean()


def test_generic_kernel_emits_metric_families():
    """The autodiff-in-Pallas kernel returns the general path's full scalar
    families; noise-independent ones match the general step exactly."""
    from multivae_tpu.train.train_step import make_train_step

    cfg, model, batch, params, opt_state = setup("moe")
    batches = {k: jnp.asarray(np.asarray(v)[None]) for k, v in batch.items()}
    rngs = jax.random.split(jax.random.PRNGKey(0), 1)
    epoch_fn = make_generic_fused_epoch(cfg, model, interpret=True)
    _, _, _, fused_m = epoch_fn(params, opt_state, batches, rngs)

    general = make_train_step(cfg, model, donate=False)
    _, _, _, gen_m = general(params, opt_state, batch, jax.random.PRNGKey(0))
    assert set(fused_m) == set(gen_m)
    for key in gen_m:
        if key.startswith(("kld", "latent", "joint_divergence")):
            np.testing.assert_allclose(float(fused_m[key][0]),
                                       float(gen_m[key]), rtol=1e-4,
                                       atol=1e-6, err_msg=key)
