"""Multi-device fused training: the Pallas kernels composed with shard_map.

Closes VERDICT round-2 Missing #2 — multi-device training must keep kernel
speed. Checks: the data-parallel per-step-kernel + grad-psum path matches
the single-device fused epoch numerically; the ensemble path (grid kernel
per member over the ``model`` axis) matches it bit-for-bit; and the trainer
actually SELECTS the fused paths when a mesh is active.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.driver  # mesh-composition contract

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multivae_tpu.models import build_model, make_modalities
from multivae_tpu.ops.fused_sharded import (
    make_fused_dp_scan_train_step,
    make_fused_ensemble_epoch,
)
from multivae_tpu.ops.fused_step import make_fused_scan_train_step
from multivae_tpu.parallel import data_mesh
from multivae_tpu.train import Config
from multivae_tpu.train.train_step import init_train_state

B = 48
N_STEPS = 3


def make_cfg(method="joint_elbo", **kw):
    kw.setdefault("input_dim", [7, 36])
    kw.setdefault("style_dim", [3, 5])
    kw.setdefault("beta", 1.3)
    kw.setdefault("beta_style", 0.7)
    kw.setdefault("beta_content", 1.9)
    kw.setdefault("learn_output_scale", True)
    kw.setdefault("batch_size", B)
    cfg = Config(method=method, class_dim=6, hidden_dim=32,
                 num_hidden_layer_encoder=1, num_hidden_layer_decoder=0,
                 **kw)
    return cfg.derive()


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    cfg = make_cfg()
    model = build_model(cfg, make_modalities(cfg.input_dim, cfg.style_dim,
                                             cfg.likelihood))
    batch = {
        "clinical": jnp.asarray(rng.normal(size=(B, cfg.input_dim[0]))
                                .astype(np.float32)),
        "rois": jnp.asarray(rng.normal(size=(B, cfg.input_dim[1]))
                            .astype(np.float32)),
    }
    params, opt_state = init_train_state(cfg, model, batch)
    batches = {k: jnp.stack([v] * N_STEPS) for k, v in batch.items()}
    rngs = jax.random.split(jax.random.PRNGKey(0), N_STEPS)
    ref_fn = make_fused_scan_train_step(cfg, model, interpret=True)
    ref = ref_fn(params, opt_state, batches, rngs)
    return cfg, model, params, opt_state, batches, rngs, ref


def _max_diff(a, b):
    return max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


class TestDataParallelKernel:
    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_matches_single_device_fused(self, setup, n_dev):
        cfg, model, params, opt_state, batches, rngs, ref = setup
        p_ref, o_ref, l_ref, m_ref = ref
        mesh = data_mesh(n_dev)
        fn = make_fused_dp_scan_train_step(cfg, model, mesh, interpret=True)
        p, o, losses, metrics = fn(params, opt_state, batches, rngs)
        # same math, different reduction order across devices
        np.testing.assert_allclose(np.asarray(losses), np.asarray(l_ref),
                                   rtol=2e-5)
        assert _max_diff(p, p_ref) < 1e-5
        assert _max_diff(o.mu, o_ref.mu) < 1e-5
        assert int(o.count) == int(o_ref.count)
        assert set(metrics) == set(m_ref)
        for k in m_ref:
            np.testing.assert_allclose(np.asarray(metrics[k]),
                                       np.asarray(m_ref[k]),
                                       rtol=5e-4, atol=5e-4)


class TestEnsembleEpochKernel:
    def test_members_match_single_device_fused(self, setup):
        cfg, model, params, opt_state, batches, rngs, ref = setup
        p_ref, o_ref, l_ref, m_ref = ref
        n_model = 2
        mesh = Mesh(np.array(jax.devices()[:n_model]), ("model",))
        fn = make_fused_ensemble_epoch(cfg, model, mesh, interpret=True)
        stack = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * n_model), t)
        grid = {k: jnp.stack([v] * n_model) for k, v in batches.items()}
        rgrid = jnp.stack([rngs] * n_model)
        p, o, losses, metrics = fn(stack(params), stack(opt_state), grid,
                                   rgrid)
        # identical per-member streams -> members equal; each member runs
        # the exact same grid kernel as the single-device path -> bitwise
        for m in range(n_model):
            member = jax.tree_util.tree_map(lambda x: x[m], p)
            assert _max_diff(member, p_ref) == 0.0
            np.testing.assert_array_equal(np.asarray(losses[m]),
                                          np.asarray(l_ref))
        assert set(metrics) == set(m_ref)

    def test_rejects_wrong_member_count(self, setup):
        cfg, model, params, opt_state, batches, rngs, ref = setup
        mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
        fn = make_fused_ensemble_epoch(cfg, model, mesh, interpret=True)
        stack3 = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * 3), t)
        grid = {k: jnp.stack([v] * 3) for k, v in batches.items()}
        with pytest.raises(ValueError, match="mesh model axis|divisible"):
            fn(stack3(params), stack3(opt_state), grid,
               jnp.stack([rngs] * 3))


class TestMethodKernelsOnMesh:
    """moe/poe/jsd (and dropout) keep kernel speed on meshes too: the
    method kernel composes with the DP per-step psum path and runs
    per-member on the ensemble axis."""

    @pytest.mark.parametrize("method,drop", [("moe", 0.0)])
    def test_dp_and_ensemble_match_single_device(self, method, drop):
        self._check(method, drop)

    @pytest.mark.slow
    @pytest.mark.parametrize("method,drop", [("poe", 0.0), ("jsd", 0.0),
                                             ("moe", 0.3)])
    def test_dp_and_ensemble_match_single_device_slow(self, method, drop):
        self._check(method, drop)

    def _check(self, method, drop):
        from multivae_tpu.ops.fused_methods import make_method_fused_epoch

        rng = np.random.default_rng(0)
        cfg = make_cfg(method=method, dropout_rate=drop)
        model = build_model(cfg, make_modalities(
            cfg.input_dim, cfg.style_dim, cfg.likelihood))
        batch = {
            "clinical": jnp.asarray(rng.normal(size=(B, cfg.input_dim[0]))
                                    .astype(np.float32)),
            "rois": jnp.asarray(rng.normal(size=(B, cfg.input_dim[1]))
                                .astype(np.float32)),
        }
        params, opt_state = init_train_state(cfg, model, batch)
        batches = {k: jnp.stack([v] * N_STEPS) for k, v in batch.items()}
        rngs = jax.random.split(jax.random.PRNGKey(0), N_STEPS)
        ref_fn = make_method_fused_epoch(cfg, model, interpret=True)
        p_ref, _, l_ref, m_ref = ref_fn(params, opt_state, batches, rngs)

        dp_fn = make_fused_dp_scan_train_step(cfg, model, data_mesh(4),
                                              interpret=True)
        p_dp, _, l_dp, m_dp = dp_fn(params, opt_state, batches, rngs)
        np.testing.assert_allclose(np.asarray(l_dp), np.asarray(l_ref),
                                   rtol=2e-5)
        assert _max_diff(p_dp, p_ref) < 1e-5
        assert set(m_dp) == set(m_ref)

        mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
        ens_fn = make_fused_ensemble_epoch(cfg, model, mesh, interpret=True)
        stack = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * 2), t)
        grid = {k: jnp.stack([v] * 2) for k, v in batches.items()}
        p_e, _, l_e, m_e = ens_fn(stack(params), stack(opt_state), grid,
                                  jnp.stack([rngs] * 2))
        member = jax.tree_util.tree_map(lambda x: x[0], p_e)
        assert _max_diff(member, p_ref) == 0.0
        assert set(m_e) == set(m_ref)


@pytest.mark.slow
class TestTrainerSelection:
    """The trainer must pick the fused shard_map paths when a mesh is
    active (VERDICT: 'stop forcing the general path when mesh is not
    None')."""

    def _mini_experiment(self, tmp_path, monkeypatch, **flags):
        from multivae_tpu.data import make_synthetic_cohort
        from multivae_tpu.workflows import train_exp

        datasetdir = str(tmp_path / "data")
        outdir = str(tmp_path / "out")
        import os
        os.makedirs(outdir, exist_ok=True)
        make_synthetic_cohort(datasetdir, n_subjects=96, n_scores=4,
                              n_rois=16, missing_rate=0.0, seed=3)
        return train_exp(
            dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
            input_dims=[4, 16], latent_dim=4, style_dim=[2, 3],
            num_epochs=2, batch_size=16, method="joint_elbo",
            learning_rate=0.01, use_tensorboard=False, **flags)

    def test_data_parallel_selects_fused_dp(self, tmp_path, monkeypatch):
        import multivae_tpu.ops.fused_sharded as fsh

        calls = []
        orig = fsh.make_fused_dp_scan_train_step

        def spy(cfg, model, mesh, **kw):
            calls.append(mesh.shape["data"])
            return orig(cfg, model, mesh, **kw)

        monkeypatch.setattr(fsh, "make_fused_dp_scan_train_step", spy)
        self._mini_experiment(tmp_path, monkeypatch, data_parallel=2)
        assert calls == [2]

    def test_ensemble_mesh_selects_fused_epoch(self, tmp_path, monkeypatch):
        import multivae_tpu.ops.fused_sharded as fsh

        calls = []
        orig = fsh.make_fused_ensemble_epoch

        def spy(cfg, model, mesh, **kw):
            calls.append(mesh.shape["model"])
            return orig(cfg, model, mesh, **kw)

        monkeypatch.setattr(fsh, "make_fused_ensemble_epoch", spy)
        self._mini_experiment(tmp_path, monkeypatch, num_models=2,
                              ensemble_parallel=True)
        assert calls == [2]
