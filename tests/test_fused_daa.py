"""Fused DAA kernels: exact deterministic equality with the general path,
statistical equality for sampled latents, analytic M-averaging."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.analysis.daa import (
    analytic_reconstruction_stats,
    avatar_sweep,
    reconstruction_stats,
)
from multivae_tpu.models import build_model, make_modalities
from multivae_tpu.ops.fused_daa import fused_avatar_sweep
from multivae_tpu.train import Config
from multivae_tpu.train.train_step import init_train_state

pytestmark = pytest.mark.driver  # fused DAA-kernel parity

B = 30
RNG = np.random.default_rng(4)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(method="joint_elbo", input_dim=[5, 24], class_dim=6,
                 style_dim=[2, 4], hidden_dim=32,
                 num_hidden_layer_encoder=1, num_hidden_layer_decoder=0,
                 learn_output_scale=True).derive()
    model = build_model(cfg, make_modalities(cfg.input_dim, cfg.style_dim,
                                             cfg.likelihood))
    data = {
        "clinical": jnp.asarray(RNG.normal(size=(B, 5)).astype(np.float32)),
        "rois": jnp.asarray(RNG.normal(size=(B, 24)).astype(np.float32)),
    }
    params, _ = init_train_state(cfg, model, data)
    scores = jnp.asarray(RNG.normal(size=(8, B, 5)).astype(np.float32))
    return cfg, model, params, data, scores


class TestMethodDispatchedSweep:
    """The cell kernel fuses for ALL FOUR methods (the method only selects
    the joint-fusion block); deterministic outputs must match the general
    per-cell model calls exactly."""

    @staticmethod
    def _method_setup(method):
        from multivae_tpu.ops.fused_daa import supports_fused_sweep

        cfg = Config(method=method, input_dim=[5, 24], class_dim=6,
                     style_dim=[2, 4], hidden_dim=32,
                     num_hidden_layer_encoder=1,
                     num_hidden_layer_decoder=0,
                     learn_output_scale=True).derive()
        model = build_model(cfg, make_modalities(
            cfg.input_dim, cfg.style_dim, cfg.likelihood))
        data = {
            "clinical": jnp.asarray(RNG.normal(size=(B, 5))
                                    .astype(np.float32)),
            "rois": jnp.asarray(RNG.normal(size=(B, 24))
                                .astype(np.float32)),
        }
        params, _ = init_train_state(cfg, model, data)
        assert supports_fused_sweep(cfg, model, data)
        return cfg, model, params, data

    @pytest.mark.parametrize("method", ["moe", "jsd", "poe"])
    def test_deterministic_matches_general(self, method):
        cfg, model, params, data = self._method_setup(method)
        scores = jnp.asarray(RNG.normal(size=(4, B, 5)).astype(np.float32))
        # general path WITHOUT cfg so it cannot itself take the fused route
        general = avatar_sweep(model, params, data, scores,
                               sample_latents=False,
                               rng=jax.random.PRNGKey(0))
        fused = fused_avatar_sweep(model, params, data, scores,
                                   sample_latents=False,
                                   rng=jax.random.PRNGKey(0), cfg=cfg,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(general),
                                   rtol=2e-4, atol=1e-5)

    @pytest.mark.slow
    @pytest.mark.parametrize("method", ["moe", "jsd", "poe"])
    def test_sampled_means_match_statistically(self, method):
        """``sample_latents=True`` is run_daa's production default: the
        fused sampled branches (mixture-partition masks, raw-expert
        logvars, jsd's unit-expert row) must agree with the general path
        in expectation over latent draws."""
        cfg, model, params, data = self._method_setup(method)
        scores = jnp.tile(data["clinical"][None, :, :], (64, 1, 1))
        general = avatar_sweep(model, params, data, scores,
                               sample_latents=True,
                               rng=jax.random.PRNGKey(1))
        fused = fused_avatar_sweep(model, params, data, scores,
                                   sample_latents=True,
                                   rng=jax.random.PRNGKey(2), cfg=cfg,
                                   interpret=True)
        gm = np.asarray(general).mean(axis=2)
        fm = np.asarray(fused).mean(axis=2)
        resid = np.abs(gm - fm)
        scale = np.abs(gm).mean() + 1.0
        assert resid.mean() / scale < 0.1


class TestFusedAvatarSweep:
    def test_deterministic_matches_general_exactly(self, setup):
        cfg, model, params, data, scores = setup
        general = avatar_sweep(model, params, data, scores,
                               sample_latents=False,
                               rng=jax.random.PRNGKey(0))
        fused = fused_avatar_sweep(model, params, data, scores,
                                   sample_latents=False,
                                   rng=jax.random.PRNGKey(0), cfg=cfg,
                                   interpret=True)
        assert fused.shape == general.shape == (B, 5, 8, 24)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(general),
                                   rtol=2e-4, atol=1e-5)

    def test_sampled_means_match_statistically(self, setup):
        cfg, model, params, data, _ = setup
        # many samples of the SAME perturbation: per-cell means converge to
        # the deterministic-ish decode so both paths agree in expectation
        scores = jnp.tile(data["clinical"][None, :, :], (64, 1, 1))
        general = avatar_sweep(model, params, data, scores,
                               sample_latents=True,
                               rng=jax.random.PRNGKey(1))
        fused = fused_avatar_sweep(model, params, data, scores,
                                   sample_latents=True,
                                   rng=jax.random.PRNGKey(2), cfg=cfg,
                                   interpret=True)
        gm = np.asarray(general).mean(axis=2)
        fm = np.asarray(fused).mean(axis=2)
        resid = np.abs(gm - fm)
        scale = np.abs(gm).mean() + 1.0
        assert resid.mean() / scale < 0.1

    def test_dispatch_via_cfg(self, setup):
        cfg, model, params, data, scores = setup
        via_dispatch = avatar_sweep(model, params, data, scores,
                                    sample_latents=False,
                                    rng=jax.random.PRNGKey(0), cfg=cfg)
        direct = fused_avatar_sweep(model, params, data, scores,
                                    sample_latents=False,
                                    rng=jax.random.PRNGKey(0), cfg=cfg,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(via_dispatch),
                                   np.asarray(direct), rtol=1e-5)


class TestAnalyticReconstruction:
    def test_matches_monte_carlo_limit(self, setup):
        cfg, model, params, data, _ = setup
        c_loc_a, c_scale_a, r_loc_a = analytic_reconstruction_stats(
            model, params, data)
        c_loc_m, c_scale_m, r_loc_m = reconstruction_stats(
            model, params, data, M=512, rng=jax.random.PRNGKey(3))
        # MC converges to the analytic expectation at O(1/sqrt(M))
        np.testing.assert_allclose(np.asarray(c_loc_m),
                                   np.asarray(c_loc_a), atol=0.2)
        np.testing.assert_allclose(np.asarray(r_loc_m),
                                   np.asarray(r_loc_a), atol=0.2)
        # per-feature scale is deterministic for learned-scale decoders
        np.testing.assert_allclose(np.asarray(c_scale_m),
                                   np.asarray(c_scale_a), rtol=1e-4)

    def test_cfg_dispatch_uses_analytic(self, setup):
        cfg, model, params, data, _ = setup
        got = reconstruction_stats(model, params, data, M=4,
                                   rng=jax.random.PRNGKey(0), cfg=cfg)
        want = analytic_reconstruction_stats(model, params, data)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-6)


class TestShardedSweep:
    def test_matches_general_on_mesh(self, setup):
        """The device-sharded cell grid must reproduce the sequential sweep
        (deterministic path) on the 8-device CPU mesh."""
        from multivae_tpu.analysis.daa import avatar_sweep_sharded
        from multivae_tpu.parallel import data_mesh
        cfg, model, params, data, scores = setup
        mesh = data_mesh(8)
        general = avatar_sweep(model, params, data, scores,
                               sample_latents=False,
                               rng=jax.random.PRNGKey(0))
        sharded = avatar_sweep_sharded(model, params, data, scores,
                                       sample_latents=False,
                                       rng=jax.random.PRNGKey(0), mesh=mesh)
        np.testing.assert_allclose(np.asarray(sharded),
                                   np.asarray(general), rtol=2e-4,
                                   atol=1e-5)

    def test_nondivisible_cell_count(self, setup):
        from multivae_tpu.analysis.daa import avatar_sweep_sharded
        from multivae_tpu.parallel import data_mesh
        cfg, model, params, data, _ = setup
        mesh = data_mesh(8)
        scores = jnp.asarray(np.random.default_rng(0).normal(
            size=(3, 30, 5)).astype(np.float32))  # 15 cells, pad to 16
        out = avatar_sweep_sharded(model, params, data, scores,
                                   sample_latents=False,
                                   rng=jax.random.PRNGKey(0), mesh=mesh)
        assert out.shape == (30, 5, 3, 24)
        assert np.isfinite(np.asarray(out)).all()

    def test_sharded_fused_matches_single_device(self, setup):
        """shard_map'd Pallas sweep == single-device fused sweep, bit-for-bit
        per cell (same eps stream), deterministic AND sampled."""
        from multivae_tpu.analysis.daa import avatar_sweep_sharded
        from multivae_tpu.parallel import data_mesh
        cfg, model, params, data, scores = setup
        mesh = data_mesh(8)
        for sample_latents in (False, True):
            single = fused_avatar_sweep(model, params, data, scores,
                                        sample_latents=sample_latents,
                                        rng=jax.random.PRNGKey(7), cfg=cfg,
                                        interpret=True)
            sharded = avatar_sweep_sharded(model, params, data, scores,
                                           sample_latents=sample_latents,
                                           rng=jax.random.PRNGKey(7),
                                           mesh=mesh, cfg=cfg)
            np.testing.assert_allclose(np.asarray(sharded),
                                       np.asarray(single), rtol=1e-6,
                                       atol=1e-6)


class TestExactReconstructionFlag:
    def test_exact_false_forces_monte_carlo(self, setup):
        """exact=False keeps the reference's MC estimator on fused configs:
        the result carries MC noise but converges to the closed form."""
        cfg, model, params, data, _ = setup
        mc = reconstruction_stats(model, params, data, M=512,
                                  rng=jax.random.PRNGKey(3), cfg=cfg,
                                  exact=False)
        exact = reconstruction_stats(model, params, data, M=4,
                                     rng=jax.random.PRNGKey(3), cfg=cfg,
                                     exact=True)
        # different estimator (MC draws differ from the closed form)...
        assert not np.allclose(np.asarray(mc[0]), np.asarray(exact[0]),
                               rtol=1e-6, atol=1e-8)
        # ...but within MC error at M=512
        np.testing.assert_allclose(np.asarray(mc[0]), np.asarray(exact[0]),
                                   atol=0.2)
        np.testing.assert_allclose(np.asarray(mc[2]), np.asarray(exact[2]),
                                   atol=0.2)

    def test_exact_true_equals_analytic(self, setup):
        cfg, model, params, data, _ = setup
        got = reconstruction_stats(model, params, data, M=4,
                                   rng=jax.random.PRNGKey(0), cfg=cfg,
                                   exact=True)
        want = analytic_reconstruction_stats(model, params, data)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-6)


class TestExactRejectsNonlinear:
    def test_exact_true_raises_on_nonlinear_decoder(self):
        """exact=True is only valid for linear decoders (E[dec(z)] !=
        dec(E[z]) otherwise); non-flagship configs must refuse, not
        silently bias the estimator."""
        from multivae_tpu.train.train_step import init_train_state
        cfg = Config(method="joint_elbo", input_dim=[5, 24], class_dim=6,
                     style_dim=[2, 4], hidden_dim=32,
                     num_hidden_layer_encoder=1,
                     num_hidden_layer_decoder=1,  # nonlinear decoder
                     learn_output_scale=True).derive()
        model = build_model(cfg, make_modalities(cfg.input_dim,
                                                 cfg.style_dim,
                                                 cfg.likelihood))
        data = {
            "clinical": jnp.asarray(RNG.normal(size=(8, 5))
                                    .astype(np.float32)),
            "rois": jnp.asarray(RNG.normal(size=(8, 24))
                                .astype(np.float32)),
        }
        params, _ = init_train_state(cfg, model, data)
        with pytest.raises(ValueError, match="linear-decoder"):
            reconstruction_stats(model, params, data, M=4,
                                 rng=jax.random.PRNGKey(0), cfg=cfg,
                                 exact=True)
