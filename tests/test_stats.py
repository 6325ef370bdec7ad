"""Statistics-layer tests: regression designs vs explicit numpy/scipy
references, batched kernels vs scalar paths, ANOVA, RSA primitives."""

import numpy as np
import pandas as pd
import pytest
from scipy import stats as sstats

from multivae_tpu.analysis.stats import (
    cmat2triu,
    data2cmat,
    fixed_regression_batch,
    fit_rsa,
    hierarchical_regression_batch,
    make_regression,
    one_sample_ttest,
    one_way_anova_batch,
    per_group_slopes,
    vec2cmat,
)

RNG = np.random.default_rng(7)


def make_grouped_data(n_groups=12, n_per=25, slope=0.5, subj_sd=0.3,
                      noise=0.2):
    rows = []
    for g in range(n_groups):
        x = RNG.normal(size=n_per)
        b_g = slope + RNG.normal() * subj_sd
        y = 1.0 + b_g * x + noise * RNG.normal(size=n_per)
        for xi, yi in zip(x, y):
            rows.append({"participant_id": f"s{g:02d}", "x": xi, "y": yi})
    return pd.DataFrame(rows)


class TestFixed:
    def test_matches_scipy_linregress(self):
        df = make_grouped_data()
        pval, coef, _ = make_regression(df, "x", "y", method="fixed")
        lr = sstats.linregress(df["x"], df["y"])
        np.testing.assert_allclose(coef, lr.slope, rtol=1e-8)
        np.testing.assert_allclose(pval, lr.pvalue, rtol=1e-6)

    def test_batch_matches_scalar(self):
        n, r = 200, 5
        x = RNG.normal(size=n)
        y = (0.3 * x[:, None] + RNG.normal(size=(n, r))).astype(np.float64)
        pvals, coefs = fixed_regression_batch(x, y)
        for j in range(r):
            lr = sstats.linregress(x, y[:, j])
            np.testing.assert_allclose(coefs[j], lr.slope, rtol=1e-4)
            np.testing.assert_allclose(pvals[j], lr.pvalue, rtol=1e-3,
                                       atol=1e-12)


class TestHierarchical:
    def test_scalar_matches_manual_two_level(self):
        df = make_grouped_data()
        pval, coef, betas = make_regression(
            df, "x", "y", groups_name="participant_id",
            method="hierarchical")
        manual = []
        for _, gdf in df.groupby("participant_id", sort=False):
            manual.append(sstats.linregress(gdf["x"], gdf["y"]).slope)
        manual = np.array(manual)
        np.testing.assert_allclose(betas["beta"], manual, rtol=1e-8)
        t = sstats.ttest_1samp(manual, 0.0)
        np.testing.assert_allclose(coef, manual.mean(), rtol=1e-8)
        np.testing.assert_allclose(pval, t.pvalue, rtol=1e-6)

    def test_batch_matches_scalar(self):
        g, n, r = 10, 30, 4
        x = RNG.normal(size=(g, n))
        y = 0.4 * x[:, :, None] + 0.3 * RNG.normal(size=(g, n, r))
        pvals, coefs, betas = hierarchical_regression_batch(x, y)
        assert betas.shape == (g, r)
        for j in range(r):
            manual = np.array([
                sstats.linregress(x[i], y[i, :, j]).slope for i in range(g)])
            np.testing.assert_allclose(betas[:, j], manual, rtol=1e-4)
            t = sstats.ttest_1samp(manual, 0.0)
            np.testing.assert_allclose(pvals[j], t.pvalue, rtol=1e-3)
            np.testing.assert_allclose(coefs[j], manual.mean(), rtol=1e-5)

    def test_per_group_slopes_equal_ols(self):
        g, n = 4, 20
        x = RNG.normal(size=(g, n))
        y = RNG.normal(size=(g, n, 2))
        slopes = np.asarray(per_group_slopes(x, y))
        for i in range(g):
            for j in range(2):
                lr = sstats.linregress(x[i], y[i, :, j])
                np.testing.assert_allclose(slopes[i, j], lr.slope, rtol=1e-4)


class TestMixed:
    def test_recovers_slope_and_detects_signal(self):
        df = make_grouped_data(n_groups=20, n_per=30, slope=0.8)
        pval, coef, _ = make_regression(
            df, "x", "y", groups_name="participant_id", method="mixed")
        assert abs(coef - 0.8) < 0.15
        assert pval < 1e-6

    def test_null_not_significant(self):
        df = make_grouped_data(n_groups=15, n_per=20, slope=0.0,
                               subj_sd=0.05, noise=1.0)
        pval, coef, _ = make_regression(
            df, "x", "y", groups_name="participant_id", method="mixed")
        assert pval > 0.01

    def test_close_to_fixed_when_no_group_effect(self):
        # with negligible between-group variance the mixed estimate should be
        # close to pooled OLS
        df = make_grouped_data(n_groups=10, n_per=50, slope=0.5,
                               subj_sd=0.0, noise=0.3)
        p_m, c_m, _ = make_regression(df, "x", "y",
                                      groups_name="participant_id",
                                      method="mixed")
        p_f, c_f, _ = make_regression(df, "x", "y", method="fixed")
        np.testing.assert_allclose(c_m, c_f, rtol=0.05)


class TestTtestAndAnova:
    def test_one_sample_ttest_matches_scipy(self):
        vals = RNG.normal(0.3, 1.0, size=25)
        coef, pval = one_sample_ttest(vals)
        t = sstats.ttest_1samp(vals, 0.0)
        np.testing.assert_allclose(coef, vals.mean(), rtol=1e-10)
        np.testing.assert_allclose(pval, t.pvalue, rtol=1e-8)

    def test_anova_matches_scipy_f_oneway(self):
        groups = np.repeat(["a", "b", "c"], 30)
        vals = RNG.normal(size=(90, 6))
        vals[groups == "b"] += 0.5  # site effect in every column
        pvals = one_way_anova_batch(vals, groups)
        for j in range(6):
            f = sstats.f_oneway(vals[groups == "a", j],
                                vals[groups == "b", j],
                                vals[groups == "c", j])
            np.testing.assert_allclose(pvals[j], f.pvalue, rtol=1e-8)


class TestRsaPrimitives:
    def test_data2cmat_euclidean(self):
        x = RNG.normal(size=(10, 3))
        cmat = data2cmat(x)
        assert cmat.shape == (10, 10)
        want = np.linalg.norm(x[0] - x[1])
        np.testing.assert_allclose(cmat[0, 1], want, rtol=1e-6)
        np.testing.assert_allclose(cmat, cmat.T)

    def test_vec2cmat_categorical(self):
        v = np.array(["a", "b", "a"])
        cmat = vec2cmat(v, categorical=True)
        np.testing.assert_array_equal(
            cmat, [[0, 1, 0], [1, 0, 1], [0, 1, 0]])

    def test_fit_rsa_perfect_correlation(self):
        x = RNG.normal(size=(12, 1))
        cmat = data2cmat(x)
        tau, pval = fit_rsa(cmat, cmat.copy())
        np.testing.assert_allclose(tau, 1.0)

    def test_cmat2triu(self):
        m = np.arange(9).reshape(3, 3)
        np.testing.assert_array_equal(cmat2triu(m), [1, 2, 5])

    def test_fit_rsa_3d_guards_10_round_assumption(self):
        """The 3-D branch keeps the reference's hardcoded range(10) loop
        but must fail loudly below 10 rounds and warn above (the upstream
        quirk silently drops extra rounds, stat_utils.py:87-92)."""
        x = RNG.normal(size=(12, 6, 2))
        idxs = np.arange(6)
        ref_cmat = data2cmat(RNG.normal(size=(6, 2)))
        with pytest.raises(ValueError, match="10-round"):
            fit_rsa(data2cmat(x[:7]), ref_cmat, idxs=idxs)
        with pytest.warns(UserWarning, match="first 10 of 12"):
            out = fit_rsa(data2cmat(x), ref_cmat, idxs=idxs)
        assert out.shape == (10,)
        # exactly 10 rounds: no warning, same values as the 12-round call
        import warnings as _w
        with _w.catch_warnings():
            _w.simplefilter("error")
            out10 = fit_rsa(data2cmat(x[:10]), ref_cmat, idxs=idxs)
        np.testing.assert_allclose(out10, out)


class TestMixedRegressionBatch:
    def test_matches_scalar_reml_per_roi(self):
        """Batched REML (all ROIs profiled together) == the scalar
        random-intercept fit, coef and p-value, per ROI."""
        import pandas as pd
        from multivae_tpu.analysis.stats import (
            make_regression, mixed_regression_batch)

        rng = np.random.default_rng(3)
        g, n, r = 20, 12, 15
        x = rng.normal(size=(g, n))
        u = rng.normal(size=(g, 1, r)) * 0.7
        beta_true = np.where(np.arange(r) < 3, 0.6, 0.0)
        y = (0.2 + x[:, :, None] * beta_true + u
             + rng.normal(size=(g, n, r)) * 0.5)
        pv_b, cf_b = mixed_regression_batch(x, y)

        pid = np.repeat(np.arange(g)[:, None], n, axis=1).flatten()
        for roi in range(r):
            df = pd.DataFrame({
                "participant_id": pid, "sampled_score": x.flatten(),
                "roi_avatar": y[:, :, roi].flatten()})
            p, c, _ = make_regression(df, "sampled_score", "roi_avatar",
                                      groups_name="participant_id",
                                      method="mixed")
            np.testing.assert_allclose(cf_b[roi], c, rtol=2e-3, atol=1e-5)
            np.testing.assert_allclose(
                np.log10(max(pv_b[roi], 1e-300)),
                np.log10(max(p, 1e-300)), atol=0.05)

    def test_detects_signal(self):
        from multivae_tpu.analysis.stats import mixed_regression_batch

        rng = np.random.default_rng(5)
        g, n, r = 25, 15, 8
        x = rng.normal(size=(g, n))
        y = (x[:, :, None] * np.where(np.arange(r) < 2, 1.0, 0.0)
             + rng.normal(size=(g, 1, r)) + rng.normal(size=(g, n, r)) * 0.3)
        pv, cf = mixed_regression_batch(x, y)
        assert (pv[:2] < 1e-10).all()
        assert (pv[2:] > 1e-4).all()
        np.testing.assert_allclose(cf[:2], 1.0, atol=0.1)


class TestFromStatsFinishers:
    """The stats-only DAA mode finishes regressions from per-group
    sufficient statistics (Σy, Σxy, Σy² per subject/ROI); each finisher
    must match its full-tensor batch kernel."""

    @staticmethod
    def _suffstats(x, y):
        ysum = y.sum(axis=1)
        xysum = np.einsum("gn,gnr->gr", x, y)
        yysum = np.einsum("gnr,gnr->gr", y, y)
        return ysum, xysum, yysum

    def test_hierarchical_from_stats_matches_batch(self):
        from multivae_tpu.analysis.stats import (
            hierarchical_regression_batch, hierarchical_regression_from_stats)

        rng = np.random.default_rng(7)
        g, n, r = 15, 12, 9
        x = rng.normal(size=(g, n))
        y = x[:, :, None] * 0.4 + rng.normal(size=(g, n, r))
        ysum, xysum, _ = self._suffstats(x, y)
        pv_s, cf_s, b_s = hierarchical_regression_from_stats(x, ysum, xysum)
        pv_b, cf_b, b_b = hierarchical_regression_batch(x, y)
        np.testing.assert_allclose(b_s, b_b, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(cf_s, cf_b, rtol=1e-10)
        np.testing.assert_allclose(pv_s, pv_b, rtol=1e-8)

    def test_fixed_from_stats_matches_batch_with_offset(self):
        from multivae_tpu.analysis.stats import (
            fixed_regression_batch, fixed_regression_from_stats)

        rng = np.random.default_rng(8)
        g, n, r = 10, 14, 6
        x = rng.normal(size=(g, n))
        y = x[:, :, None] * 0.3 + rng.normal(size=(g, n, r))
        rec = rng.normal(size=(g, r))  # per-subject reconstruction offset
        ysum, xysum, yysum = self._suffstats(x, y)
        pv_s, cf_s = fixed_regression_from_stats(x, ysum, xysum, yysum,
                                                 offset_g=rec)
        diff = (y - rec[:, None, :]).reshape(-1, r)
        pv_b, cf_b = fixed_regression_batch(x.reshape(-1), diff)
        np.testing.assert_allclose(cf_s, cf_b, rtol=1e-9)
        np.testing.assert_allclose(pv_s, pv_b, rtol=1e-7, atol=1e-12)

    def test_fixed_from_stats_no_offset(self):
        from multivae_tpu.analysis.stats import (
            fixed_regression_batch, fixed_regression_from_stats)

        rng = np.random.default_rng(9)
        g, n, r = 8, 10, 5
        x = rng.normal(size=(g, n))
        y = rng.normal(size=(g, n, r))
        ysum, xysum, yysum = self._suffstats(x, y)
        pv_s, cf_s = fixed_regression_from_stats(x, ysum, xysum, yysum)
        pv_b, cf_b = fixed_regression_batch(x.reshape(-1),
                                            y.reshape(-1, r))
        np.testing.assert_allclose(cf_s, cf_b, rtol=1e-9)
        np.testing.assert_allclose(pv_s, pv_b, rtol=1e-7, atol=1e-12)

    def test_mixed_from_stats_is_the_batch_path(self):
        """mixed_regression_batch routes through the from-stats core, so a
        direct from-stats call with exact statistics is identical."""
        from multivae_tpu.analysis.stats import (
            mixed_regression_batch, mixed_regression_from_stats)

        rng = np.random.default_rng(10)
        g, n, r = 12, 10, 7
        x = rng.normal(size=(g, n))
        y = (x[:, :, None] * 0.5 + rng.normal(size=(g, 1, r)) * 0.6
             + rng.normal(size=(g, n, r)) * 0.4)
        ysum, xysum, yysum = self._suffstats(x, y)
        pv_s, cf_s = mixed_regression_from_stats(x, ysum, xysum, yysum)
        pv_b, cf_b = mixed_regression_batch(x, y)
        np.testing.assert_allclose(cf_s, cf_b, rtol=1e-12)
        np.testing.assert_allclose(pv_s, pv_b, rtol=1e-12, atol=1e-300)
