"""Model-layer tests: forward shapes, method-specific joint mixtures,
missing-modality subsets, generation APIs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu import ops
from multivae_tpu.models import build_model, make_modalities, powerset_subsets
from multivae_tpu.train import Config

B = 16


def make_cfg(method="joint_elbo", **kw):
    cfg = Config(method=method, input_dim=[7, 20], class_dim=5,
                 style_dim=[3, 4], num_hidden_layer_encoder=1,
                 num_hidden_layer_decoder=0, hidden_dim=32, **kw)
    return cfg.derive()


def make_batch(cfg, present=("clinical", "rois"), b=B, seed=0):
    rng = np.random.default_rng(seed)
    names = ["clinical", "rois"]
    return {names[i]: jnp.asarray(
        rng.normal(size=(b, cfg.input_dim[i])).astype(np.float32))
        for i in range(2) if names[i] in present}


def init_and_run(cfg, batch, **call_kw):
    model = build_model(cfg, make_modalities(cfg.input_dim, cfg.style_dim,
                                             cfg.likelihood))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch)
    out = model.apply(variables, batch, rngs={"sample": jax.random.PRNGKey(2)},
                      **call_kw)
    return model, variables, out


class TestSubsets:
    def test_powerset_order_and_keys(self):
        subsets = powerset_subsets(("clinical", "rois"))
        assert list(subsets) == ["clinical", "rois", "clinical_rois"]
        subsets3 = powerset_subsets(("a", "b", "c"))
        assert list(subsets3) == ["a", "b", "c", "a_b", "a_c", "b_c", "a_b_c"]


class TestForward:
    @pytest.mark.parametrize("method", ["moe", "poe", "jsd", "joint_elbo"])
    def test_shapes(self, method):
        cfg = make_cfg(method)
        batch = make_batch(cfg)
        _, _, out = init_and_run(cfg, batch)
        lat = out["latents"]
        assert lat["joint"][0].shape == (B, cfg.class_dim)
        assert set(lat["subsets"]) == {"clinical", "rois", "clinical_rois"}
        for m, dim in zip(("clinical", "rois"), cfg.input_dim):
            loc, scale = out["rec"][m]
            assert loc.shape == (B, dim)
            assert scale.shape == (B, dim)
            assert np.all(np.asarray(scale) > 0)
        assert out["joint_divergence"].shape == ()

    def test_mixture_size_per_method(self):
        # moe/jsd -> singletons (+unit expert for jsd); poe -> full subset
        # only; joint_elbo -> all subsets. BaseMMVae.py:125-134,217-223.
        for method, k in [("moe", 2), ("jsd", 3), ("poe", 1),
                          ("joint_elbo", 3)]:
            cfg = make_cfg(method)
            batch = make_batch(cfg)
            _, _, out = init_and_run(cfg, batch)
            assert out["latents"]["mus"].shape[0] == k, method

    def test_poe_joint_is_product_of_experts(self):
        cfg = make_cfg("poe")
        batch = make_batch(cfg)
        model, variables, out = init_and_run(cfg, batch,
                                             sample_latents=False)
        lat = out["latents"]
        # joint (sample=False) = mean over the single selected subset = the
        # full poe posterior with prior expert
        enc = lat["modalities"]
        mus = jnp.stack([enc["clinical"][0], enc["rois"][0],
                         jnp.zeros_like(enc["clinical"][0])])
        lvs = jnp.stack([enc["clinical"][1], enc["rois"][1],
                         jnp.zeros_like(enc["clinical"][1])])
        want_mu, want_lv = ops.poe(mus, lvs)
        np.testing.assert_allclose(lat["jointt" if False else "joint"][0],
                                   want_mu, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(lat["joint"][1], want_lv, rtol=1e-4,
                                   atol=1e-4)

    def test_moe_joint_mean_is_mean_of_singletons(self):
        cfg = make_cfg("moe")
        batch = make_batch(cfg)
        _, _, out = init_and_run(cfg, batch, sample_latents=False)
        lat = out["latents"]
        enc = lat["modalities"]
        want = (enc["clinical"][0] + enc["rois"][0]) / 2
        np.testing.assert_allclose(lat["joint"][0], want, rtol=1e-4,
                                   atol=1e-5)

    def test_joint_sampling_is_mixture_selection(self):
        cfg = make_cfg("moe")
        batch = make_batch(cfg)
        _, _, out = init_and_run(cfg, batch, sample_latents=True)
        lat = out["latents"]
        enc = lat["modalities"]
        # first half of batch from clinical expert, second from rois
        half = B // 2
        np.testing.assert_allclose(lat["joint"][0][:half],
                                   enc["clinical"][0][:half], rtol=1e-5)
        np.testing.assert_allclose(lat["joint"][0][half:],
                                   enc["rois"][0][half:], rtol=1e-5)

    def test_use_expert(self):
        cfg = make_cfg("joint_elbo")
        batch = make_batch(cfg)
        _, _, out = init_and_run(cfg, batch, use_expert="clinical")
        lat = out["latents"]
        np.testing.assert_allclose(lat["joint"][0],
                                   lat["subsets"]["clinical"][0], rtol=1e-6)

    def test_divergence_matches_manual(self):
        cfg = make_cfg("joint_elbo")
        batch = make_batch(cfg)
        _, _, out = init_and_run(cfg, batch)
        mus, lvs = out["latents"]["mus"], out["latents"]["logvars"]
        w = np.full(mus.shape[0], 1 / mus.shape[0], np.float32)
        want, _ = ops.group_divergence_moe(mus, lvs, w, normalization=B)
        np.testing.assert_allclose(out["joint_divergence"], want, rtol=1e-5)


class TestMissingModalities:
    def test_single_modality_batch(self):
        cfg = make_cfg("joint_elbo")
        batch = make_batch(cfg, present=("clinical",))
        _, _, out = init_and_run(cfg, batch)
        lat = out["latents"]
        assert set(lat["subsets"]) == {"clinical"}
        assert lat["mus"].shape[0] == 1
        assert set(out["rec"]) == {"clinical"}
        assert lat["modalities"]["rois"] == (None, None)

    def test_poe_singleton_gets_prior_expert(self):
        # for method poe the prior expert joins every subset product
        # (BaseMMVae.poe_fusion: flags.modality_poe branch)
        cfg = make_cfg("poe")
        batch = make_batch(cfg, present=("clinical",))
        _, _, out = init_and_run(cfg, batch, sample_latents=False)
        enc = out["latents"]["modalities"]
        mus = jnp.stack([enc["clinical"][0], jnp.zeros_like(enc["clinical"][0])])
        lvs = jnp.stack([enc["clinical"][1], jnp.zeros_like(enc["clinical"][1])])
        want_mu, _ = ops.poe(mus, lvs)
        np.testing.assert_allclose(out["latents"]["joint"][0], want_mu,
                                   rtol=1e-4, atol=1e-5)

    def test_joint_elbo_singleton_has_no_prior_expert(self):
        cfg = make_cfg("joint_elbo")
        batch = make_batch(cfg, present=("clinical",))
        _, _, out = init_and_run(cfg, batch, sample_latents=False)
        enc = out["latents"]["modalities"]
        # single available subset, no prior expert appended (subset size 1
        # != num total modalities 2): posterior == encoder posterior
        np.testing.assert_allclose(out["latents"]["joint"][0],
                                   enc["clinical"][0], rtol=1e-4, atol=1e-5)


class TestStyleAndScaleVariants:
    def test_unfactorized_no_style(self):
        cfg = make_cfg("joint_elbo", factorized_representation=False)
        batch = make_batch(cfg)
        _, _, out = init_and_run(cfg, batch)
        assert out["latents"]["modalities"]["clinical_style"] == (None, None)

    def test_fixed_output_scale(self):
        cfg = make_cfg("joint_elbo", learn_output_scale=False,
                       initial_out_logvar=-2.0)
        batch = make_batch(cfg)
        _, _, out = init_and_run(cfg, batch)
        scale = np.asarray(out["rec"]["clinical"][1])
        np.testing.assert_allclose(scale, np.exp(-1.0), rtol=1e-5)

    def test_per_sample_scale_head(self):
        cfg = make_cfg("joint_elbo", learn_output_sample_scale=True)
        batch = make_batch(cfg)
        _, _, out = init_and_run(cfg, batch)
        scale = np.asarray(out["rec"]["clinical"][1])
        # per-sample head: rows differ
        assert np.std(scale, axis=0).max() > 0


class TestGeneration:
    def test_generate_shapes(self):
        cfg = make_cfg("joint_elbo")
        batch = make_batch(cfg)
        model, variables, _ = init_and_run(cfg, batch)
        gen = model.apply(variables, 6, method="generate",
                          rngs={"sample": jax.random.PRNGKey(3)})
        assert gen["clinical"].shape == (6, 7)
        assert gen["rois"].shape == (6, 20)

    def test_cond_generation(self):
        cfg = make_cfg("joint_elbo")
        batch = make_batch(cfg)
        model, variables, out = init_and_run(cfg, batch)
        subs = {k: v for k, v in out["latents"]["subsets"].items()}
        cg = model.apply(variables, subs, method="cond_generation",
                         rngs={"sample": jax.random.PRNGKey(4)})
        assert set(cg) == {"clinical", "rois", "clinical_rois"}
        assert cg["clinical"]["rois"].shape == (B, 20)


class TestDeterminism:
    def test_same_key_same_output(self):
        cfg = make_cfg("joint_elbo")
        batch = make_batch(cfg)
        model, variables, out1 = init_and_run(cfg, batch)
        out2 = model.apply(variables, batch,
                           rngs={"sample": jax.random.PRNGKey(2)})
        np.testing.assert_allclose(out1["rec"]["rois"][0],
                                   out2["rec"]["rois"][0], rtol=1e-6)

    def test_jit_forward(self):
        cfg = make_cfg("joint_elbo")
        batch = make_batch(cfg)
        model, variables, out = init_and_run(cfg, batch)

        @jax.jit
        def fwd(variables, batch, key):
            return model.apply(variables, batch, rngs={"sample": key})

        got = fwd(variables, batch, jax.random.PRNGKey(2))
        np.testing.assert_allclose(got["joint_divergence"],
                                   out["joint_divergence"], rtol=1e-5)


class TestThreeModalities:
    def test_m3_powerset_forward(self):
        """Three modalities: 7 subsets; joint_elbo mixes all of them."""
        cfg = Config(method="joint_elbo", input_dim=[4, 8, 6], class_dim=5,
                     style_dim=[2, 2, 2], hidden_dim=16,
                     num_hidden_layer_encoder=1,
                     num_hidden_layer_decoder=0).derive()
        mods = make_modalities(cfg.input_dim, cfg.style_dim, cfg.likelihood,
                               names=["a", "b", "c"])
        model = build_model(cfg, mods)
        rng = np.random.default_rng(0)
        batch = {n: jnp.asarray(rng.normal(size=(12, d)).astype(np.float32))
                 for n, d in zip("abc", cfg.input_dim)}
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            batch)
        out = model.apply(variables, batch,
                          rngs={"sample": jax.random.PRNGKey(2)})
        assert set(out["latents"]["subsets"]) == {
            "a", "b", "c", "a_b", "a_c", "b_c", "a_b_c"}
        assert out["latents"]["mus"].shape[0] == 7
        assert set(out["rec"]) == {"a", "b", "c"}

    def test_m3_partial_presence(self):
        cfg = Config(method="joint_elbo", input_dim=[4, 8, 6], class_dim=5,
                     style_dim=[2, 2, 2], hidden_dim=16,
                     num_hidden_layer_encoder=1,
                     num_hidden_layer_decoder=0).derive()
        mods = make_modalities(cfg.input_dim, cfg.style_dim, cfg.likelihood,
                               names=["a", "b", "c"])
        model = build_model(cfg, mods)
        rng = np.random.default_rng(0)
        full = {n: jnp.asarray(rng.normal(size=(12, d)).astype(np.float32))
                for n, d in zip("abc", cfg.input_dim)}
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            full)
        batch = {k: full[k] for k in ("a", "c")}
        out = model.apply(variables, batch,
                          rngs={"sample": jax.random.PRNGKey(2)})
        assert set(out["latents"]["subsets"]) == {"a", "c", "a_c"}
        assert set(out["rec"]) == {"a", "c"}
