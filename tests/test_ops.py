"""Golden tests for the math primitives against independently-computed
reference semantics (numpy/torch closed forms)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multivae_tpu import ops

RNG = np.random.default_rng(0)


def _rand(*shape):
    return RNG.normal(size=shape).astype(np.float32)


class TestKL:
    def test_kl_to_unit_prior_matches_closed_form(self):
        mu, logvar = _rand(16, 5), _rand(16, 5)
        got = ops.kl_divergence(jnp.array(mu), jnp.array(logvar))
        want = -0.5 * np.sum(1 - np.exp(logvar) - mu**2 + logvar)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_kl_two_gaussians_matches_torch(self):
        mu0, lv0, mu1, lv1 = _rand(8, 3), _rand(8, 3), _rand(8, 3), _rand(8, 3)
        got = ops.kl_divergence(*map(jnp.array, (mu0, lv0, mu1, lv1)),
                                norm_value=8)
        p = torch.distributions.Normal(torch.tensor(mu0),
                                       torch.tensor(np.exp(0.5 * lv0)))
        q = torch.distributions.Normal(torch.tensor(mu1),
                                       torch.tensor(np.exp(0.5 * lv1)))
        want = torch.distributions.kl_divergence(p, q).sum().item() / 8
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_per_sample_kl_sums_to_total(self):
        mu, logvar = _rand(16, 5), _rand(16, 5)
        per = ops.kl_divergence_per_sample(jnp.array(mu), jnp.array(logvar))
        assert per.shape == (16,)
        np.testing.assert_allclose(
            jnp.sum(per), ops.kl_divergence(jnp.array(mu), jnp.array(logvar)),
            rtol=1e-5)

    def test_norm_value_divides(self):
        mu, logvar = _rand(4, 2), _rand(4, 2)
        a = ops.kl_divergence(jnp.array(mu), jnp.array(logvar))
        b = ops.kl_divergence(jnp.array(mu), jnp.array(logvar), norm_value=4)
        np.testing.assert_allclose(a / 4, b, rtol=1e-6)


class TestPoE:
    def test_poe_precision_weighting(self):
        mus, logvars = _rand(3, 10, 4), _rand(3, 10, 4)
        got_mu, got_logvar = ops.poe(jnp.array(mus), jnp.array(logvars))
        var = np.exp(logvars) + 1e-8
        t = 1.0 / var
        want_mu = (mus * t).sum(0) / t.sum(0)
        want_logvar = np.log(1.0 / t.sum(0))
        np.testing.assert_allclose(got_mu, want_mu, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got_logvar, want_logvar, rtol=1e-4,
                                   atol=1e-4)

    def test_alpha_poe_uniform_equals_weighted(self):
        mus, logvars = _rand(2, 6, 3), _rand(2, 6, 3)
        alpha = np.array([0.3, 0.7], dtype=np.float32)
        got_mu, got_lv = ops.alpha_poe(jnp.array(alpha), jnp.array(mus),
                                       jnp.array(logvars))
        t = 1.0 / (np.exp(logvars) + 1e-8)
        a = alpha[:, None, None]
        want_var = 1.0 / (a * t).sum(0)
        want_mu = want_var * (a * mus * t).sum(0)
        np.testing.assert_allclose(got_mu, want_mu, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got_lv, np.log(want_var), rtol=1e-4, atol=1e-4)

    def test_single_expert_poe_with_prior(self):
        # PoE of one expert + unit prior == product of two Gaussians.
        mus, logvars = _rand(1, 5, 2), _rand(1, 5, 2)
        stacked_mu = np.concatenate([mus, np.zeros((1, 5, 2), np.float32)])
        stacked_lv = np.concatenate([logvars, np.zeros((1, 5, 2), np.float32)])
        got = ops.poe(jnp.array(stacked_mu), jnp.array(stacked_lv))
        sub = ops.masked_poe_all_subsets(
            jnp.array(mus), jnp.array(logvars),
            subset_mask=np.ones((1, 1)), prior_expert=np.ones(1))
        np.testing.assert_allclose(sub[0][0], got[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(sub[1][0], got[1], rtol=1e-4, atol=1e-4)


class TestMaskedSubsetFusion:
    def test_matches_per_subset_poe(self):
        m, b, d = 3, 12, 6
        mus, logvars = _rand(m, b, d), _rand(m, b, d)
        # all non-empty subsets of 3 modalities, reference powerset order
        from itertools import chain, combinations
        subsets = list(chain.from_iterable(
            combinations(range(m), n) for n in range(1, m + 1)))
        mask = np.zeros((len(subsets), m), np.float32)
        for i, s in enumerate(subsets):
            mask[i, list(s)] = 1.0
        prior = np.array([float(len(s) == m) for s in subsets], np.float32)
        got_mu, got_lv = ops.masked_poe_all_subsets(
            jnp.array(mus), jnp.array(logvars), mask, prior)
        for i, s in enumerate(subsets):
            sel_mu = mus[list(s)]
            sel_lv = logvars[list(s)]
            if len(s) == m:
                sel_mu = np.concatenate([sel_mu, np.zeros((1, b, d), np.float32)])
                sel_lv = np.concatenate([sel_lv, np.zeros((1, b, d), np.float32)])
            want_mu, want_lv = ops.poe(jnp.array(sel_mu), jnp.array(sel_lv))
            np.testing.assert_allclose(got_mu[i], want_mu, rtol=1e-4,
                                       atol=1e-6)
            np.testing.assert_allclose(got_lv[i], want_lv, rtol=1e-4,
                                       atol=1e-6)

    def test_missing_modality_equals_smaller_product(self):
        # zeroing a mask column must equal the product without that expert
        mus, logvars = _rand(2, 8, 4), _rand(2, 8, 4)
        got = ops.masked_poe_all_subsets(
            jnp.array(mus), jnp.array(logvars),
            subset_mask=np.array([[1.0, 0.0]]), prior_expert=np.zeros(1))
        want = ops.poe(jnp.array(mus[:1]), jnp.array(logvars[:1]))
        np.testing.assert_allclose(got[0][0], want[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got[1][0], want[1], rtol=1e-4, atol=1e-4)


class TestMixtureSelection:
    def test_partition_matches_reference_arithmetic(self):
        # reference: utils/utils.py:63-85 — floor(B*w_k) rows per component,
        # remainder to the last.
        owner = ops.mixture_partition(3, 10)
        # floor(10/3)=3 rows each for k=0,1; last takes 4
        np.testing.assert_array_equal(
            owner, [0, 0, 0, 1, 1, 1, 2, 2, 2, 2])

    def test_partition_nonuniform(self):
        owner = ops.mixture_partition(2, 10, weights=[0.25, 0.75])
        np.testing.assert_array_equal(owner, [0, 0] + [1] * 8)

    def test_selection_gathers_rows(self):
        mus, logvars = _rand(2, 6, 3), _rand(2, 6, 3)
        mu_sel, lv_sel = ops.mixture_component_selection(
            jnp.array(mus), jnp.array(logvars))
        np.testing.assert_allclose(mu_sel[:3], mus[0, :3])
        np.testing.assert_allclose(mu_sel[3:], mus[1, 3:])
        np.testing.assert_allclose(lv_sel[:3], logvars[0, :3])
        np.testing.assert_allclose(lv_sel[3:], logvars[1, 3:])


class TestGroupDivergences:
    def test_moe_divergence(self):
        mus, logvars = _rand(3, 8, 4), _rand(3, 8, 4)
        w = np.full(3, 1 / 3, np.float32)
        gd, klds = ops.group_divergence_moe(
            jnp.array(mus), jnp.array(logvars), w, normalization=8)
        want_klds = np.array([
            -0.5 * np.sum(1 - np.exp(logvars[k]) - mus[k] ** 2 + logvars[k]) / 8
            for k in range(3)])
        np.testing.assert_allclose(klds, want_klds, rtol=1e-5)
        np.testing.assert_allclose(gd, (w * want_klds).sum(), rtol=1e-5)

    def test_jsd_divergence_against_explicit(self):
        mus, logvars = _rand(2, 8, 4), _rand(2, 8, 4)
        w = np.full(2, 0.5, np.float32)
        gd, klds, (pm, plv) = ops.alpha_jsd_divergence(
            jnp.array(mus), jnp.array(logvars), w, normalization=8)
        want_pm, want_plv = ops.alpha_poe(jnp.array(w), jnp.array(mus),
                                          jnp.array(logvars))
        np.testing.assert_allclose(pm, want_pm, rtol=1e-5)
        want0 = ops.kl_divergence(jnp.array(mus[0]), jnp.array(logvars[0]),
                                  want_pm, want_plv, norm_value=8)
        np.testing.assert_allclose(klds[0], want0, rtol=1e-5)
        np.testing.assert_allclose(gd, 0.5 * (klds[0] + klds[1]), rtol=1e-5)

    def test_poe_group_divergence(self):
        mus, logvars = _rand(2, 4, 3), _rand(2, 4, 3)
        kld_poe, klds, (pm, plv) = ops.group_divergence_poe(
            jnp.array(mus), jnp.array(logvars), normalization=4)
        want_pm, want_plv = ops.poe(jnp.array(mus), jnp.array(logvars))
        np.testing.assert_allclose(pm, want_pm, rtol=1e-5)
        np.testing.assert_allclose(
            kld_poe, ops.kl_divergence(want_pm, want_plv, norm_value=4),
            rtol=1e-5)


class TestLikelihoods:
    @pytest.mark.parametrize("name", ["normal", "laplace"])
    def test_loc_scale_families_match_torch(self, name):
        x, loc = _rand(6, 5), _rand(6, 5)
        scale = np.abs(_rand(6, 5)) + 0.1
        got = ops.log_prob(name, *map(jnp.array, (x, loc, scale)))
        dist_cls = {"normal": torch.distributions.Normal,
                    "laplace": torch.distributions.Laplace}[name]
        want = dist_cls(torch.tensor(loc), torch.tensor(scale)).log_prob(
            torch.tensor(x)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_bernoulli_matches_torch(self):
        logits = _rand(6, 5)
        x = (RNG.random((6, 5)) > 0.5).astype(np.float32)
        got = ops.log_prob("bernoulli", jnp.array(x), jnp.array(logits), None)
        want = torch.distributions.Bernoulli(logits=torch.tensor(logits)) \
            .log_prob(torch.tensor(x)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_categorical_matches_torch(self):
        logits = _rand(6, 5)
        idx = RNG.integers(0, 5, 6)
        x = np.eye(5, dtype=np.float32)[idx]
        got = ops.log_prob("categorical", jnp.array(x), jnp.array(logits), None)
        want = torch.distributions.OneHotCategorical(
            logits=torch.tensor(logits)).log_prob(torch.tensor(x)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_calc_log_prob_norm(self):
        x, loc = _rand(6, 5), _rand(6, 5)
        scale = np.abs(_rand(6, 5)) + 0.1
        got = ops.calc_log_prob("normal", *map(jnp.array, (x, loc, scale)),
                                norm_value=6)
        want = torch.distributions.Normal(
            torch.tensor(loc), torch.tensor(scale)).log_prob(
            torch.tensor(x)).sum().item() / 6
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestReparamAndLogPdfs:
    def test_reparameterize_stats(self):
        mu = jnp.full((20000, 2), 3.0)
        logvar = jnp.full((20000, 2), np.log(0.25).item())
        z = ops.reparameterize(jax.random.PRNGKey(0), mu, logvar)
        np.testing.assert_allclose(np.mean(np.asarray(z)), 3.0, atol=0.02)
        np.testing.assert_allclose(np.std(np.asarray(z)), 0.5, atol=0.02)

    def test_gaussian_log_pdf_matches_torch(self):
        x, mu, logvar = _rand(7, 4), _rand(7, 4), _rand(7, 4)
        got = ops.gaussian_log_pdf(*map(jnp.array, (x, mu, logvar)))
        want = torch.distributions.Normal(
            torch.tensor(mu), torch.tensor(np.exp(0.5 * logvar))).log_prob(
            torch.tensor(x)).sum(-1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_log_mean_exp(self):
        x = _rand(5, 9)
        got = ops.log_mean_exp(jnp.array(x), axis=1)
        want = np.log(np.mean(np.exp(x), axis=1, keepdims=True))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestExtraDivergences:
    def test_mmd_same_distribution_small(self):
        a = jnp.asarray(RNG.normal(size=(64, 4)).astype(np.float32))
        b = jnp.asarray(RNG.normal(size=(64, 4)).astype(np.float32))
        c = jnp.asarray((RNG.normal(size=(64, 4)) + 5).astype(np.float32))
        near = float(ops.mmd_loss(a, b))
        far = float(ops.mmd_loss(a, c))
        assert far > near

    def test_modality_divergence_matrix(self):
        m1, l1 = _rand(10, 4), _rand(10, 4)
        m2, l2 = _rand(10, 4), _rand(10, 4)
        klds_sum, klds_mod = ops.modality_divergence(
            *map(jnp.array, (m1, l1, m2, l2)))
        assert np.isfinite(float(klds_sum))
        assert np.isfinite(float(klds_mod))
        # poe flag -> single cross KL
        kl = ops.modality_divergence(*map(jnp.array, (m1, l1, m2, l2)),
                                     modality_poe=True)
        want = ops.kl_divergence(*map(jnp.array, (m1, l1, m2, l2)),
                                 norm_value=10)
        np.testing.assert_allclose(kl, want, rtol=1e-5)

    def test_jsd_mixture_bounds_bracket(self):
        # for identical experts, the mixture KL bounds should be finite and
        # the averaged estimate well-defined
        mu, lv = _rand(16, 4), _rand(16, 4) * 0.1
        alpha = [1 / 3] * 3
        summed, klds, ents = ops.alpha_jsd_modalities_mixture(
            jnp.array(mu), jnp.array(lv), jnp.array(mu), jnp.array(lv),
            alpha, batch_size=16)
        assert np.isfinite(float(summed))
        assert klds.shape == (2,)
        assert np.isfinite(np.asarray(ents)).all()
