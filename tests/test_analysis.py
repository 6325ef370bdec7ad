"""Integration tests: train a small model on the synthetic cohort, then run
DAA (checking ground-truth recovery), ANOVA, RSA, robustness, univariate
baseline and the plotting workflows — the full command surface."""

import os

import numpy as np
import pandas as pd
import pytest

from multivae_tpu import workflows as wf
from multivae_tpu.analysis.avatars import (
    analyze_avatars,
    assess_robustness,
    univariate_tests,
)
from multivae_tpu.data import make_synthetic_cohort

pytestmark = pytest.mark.slow  # end-to-end integration (train + analyses)

N_SCORES, N_ROIS = 4, 12
DAA_KW = dict(n_validation=3, n_samples=20, n_subjects=15, M=16,
              trust_level=0.7, seed=11, chunk=8)


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    datasetdir = str(root / "data")
    outdir = str(root / "out")
    os.makedirs(outdir)
    truth = make_synthetic_cohort(
        datasetdir, n_subjects=150, n_scores=N_SCORES, n_rois=N_ROIS,
        missing_rate=0.15, seed=5, signal_strength=2.0)
    run = wf.train_exp(
        dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
        input_dims=[N_SCORES, N_ROIS], latent_dim=6, style_dim=[2, 3],
        num_epochs=60, batch_size=64, method="joint_elbo",
        learning_rate=0.003, use_tensorboard=False, log_every=10)
    resdir = wf.daa_exp(dataset="synthetic", datasetdir=datasetdir,
                        outdir=outdir, run=run, **DAA_KW)
    return datasetdir, outdir, run, resdir, truth


class TestDaa:
    def test_artifacts(self, pipeline):
        _, _, _, resdir, _ = pipeline
        for f in ["rois_digital_avatars.npy", "sampled_scores.npy",
                  "metadatas.npy", "rois_reconstructions.npy", "coefs.npy",
                  "pvalues.npy", "all_coefs.npy", "significant_rois.tsv"]:
            assert os.path.isfile(os.path.join(resdir, f)), f

    def test_shapes(self, pipeline):
        _, _, _, resdir, _ = pipeline
        da = np.load(os.path.join(resdir, "rois_digital_avatars.npy"),
                     mmap_mode="r")
        assert da.shape == (3, 15, N_SCORES, 20, N_ROIS)
        pv = np.load(os.path.join(resdir, "pvalues.npy"))
        assert pv.shape == (3, N_SCORES, N_ROIS)
        scores = np.load(os.path.join(resdir, "sampled_scores.npy"))
        assert scores.shape == (3, 15, 20, N_SCORES)

    def test_recovers_injected_signal(self, pipeline):
        # score 0 drives the first block of ROIs in the synthetic ground
        # truth; its regression coefs there should dominate the null block
        _, _, _, resdir, truth = pipeline
        coefs = np.load(os.path.join(resdir, "coefs.npy")).mean(axis=0)
        driven = np.abs(truth["score_to_roi"][0]) > 0
        mean_driven = np.abs(coefs[0, driven]).mean()
        mean_null = np.abs(coefs[0, ~driven]).mean()
        assert mean_driven > 1.5 * mean_null

    def test_pvalues_in_range(self, pipeline):
        _, _, _, resdir, _ = pipeline
        pv = np.load(os.path.join(resdir, "pvalues.npy"))
        assert np.all(pv >= 0) and np.all(pv <= 1)


class TestAnova:
    def test_runs_and_shapes(self, pipeline):
        datasetdir, outdir, run, resdir, _ = pipeline
        anova_kw = {k: v for k, v in DAA_KW.items() if k != "chunk"}
        pv = wf.anova_exp(dataset="synthetic", datasetdir=datasetdir,
                          outdir=outdir, run=run, **anova_kw)
        assert pv.shape == (1, 3, N_SCORES, N_ROIS)
        assert np.all((pv >= 0) & (pv <= 1))


class TestRsa:
    def test_runs_and_artifacts(self, pipeline):
        datasetdir, outdir, run, _, _ = pipeline
        taus = wf.rsa_exp(dataset="synthetic", datasetdir=datasetdir,
                          outdir=outdir, run=run, n_validation=2,
                          n_subjects=20)
        rsadir = os.path.join(outdir, run, "rsa")
        assert os.path.isfile(os.path.join(rsadir, "kendalltau_stats.npy"))
        for latent in ["joint", "clinical_rois", "clinical_style",
                       "rois_style"]:
            assert os.path.isfile(
                os.path.join(rsadir, f"kendalltau_{latent}.tsv"))
        assert np.all(np.abs(taus[..., 0]) <= 1.0)
        wf.rsa_plot_exp("synthetic", datasetdir, outdir, run)
        assert os.path.isfile(os.path.join(rsadir, "dissimilarity.png"))


class TestPlotsAndPosthoc:
    def test_daa_plots(self, pipeline):
        import glob as _glob

        datasetdir, outdir, run, resdir, _ = pipeline
        wf.daa_plot_most_connected("synthetic", datasetdir, outdir, run,
                                   trust_level=0.3, plot_associations=True)
        sig = pd.read_table(os.path.join(resdir, "significant_rois.tsv"))
        if len(sig):
            # the parallel-categories flow (plotly-Parcats equivalent)
            flows = _glob.glob(os.path.join(resdir, "score2roi_*_flow.png"))
            assert flows and all(os.path.getsize(f) > 5000 for f in flows)
        if len(sig):
            score, metric = sig.iloc[0][["score", "metric"]]
            wf.daa_plot_score_metric("synthetic", datasetdir, outdir, run,
                                     score=score, metric=metric,
                                     trust_level=0.3)

    def test_analyze_avatars(self, pipeline):
        datasetdir, outdir, run, resdir, _ = pipeline
        kw = {k: v for k, v in DAA_KW.items()
              if k not in ("chunk", "trust_level")}
        figdir = analyze_avatars("synthetic", datasetdir, outdir, run,
                                 n_subjects_to_plot=3, **kw)
        assert os.path.isdir(figdir)
        assert os.path.isfile(os.path.join(figdir, "avatars_vs_scores.png"))
        # on a single-model run a nonzero model_idx must error, not
        # silently analyze model 0
        with pytest.raises(ValueError, match="single"):
            analyze_avatars("synthetic", datasetdir, outdir, run,
                            n_subjects_to_plot=3, model_idx=3, **kw)

    def test_assess_robustness(self, pipeline):
        datasetdir, outdir, run, resdir, _ = pipeline
        kw = {k: v for k, v in DAA_KW.items()
              if k not in ("chunk", "trust_level")}
        results = assess_robustness("synthetic", datasetdir, outdir, run,
                                    **kw)
        assert 0 in results["per_model"]
        assert os.path.isfile(os.path.join(
            resdir, "figures", "robustness_model_0.png"))

    def test_univariate_tests(self, pipeline):
        datasetdir, _, _, _, truth = pipeline
        pv, assoc = univariate_tests("synthetic", datasetdir,
                                     continuous_covs=["age"],
                                     categorical_covs=["sex", "site"])
        assert pv.shape == (N_SCORES, N_ROIS)
        # injected signal should show up in the univariate baseline too
        driven = np.abs(truth["score_to_roi"][0]) > 0
        assert pv[0, driven].min() < 0.05 / (N_SCORES * N_ROIS)

    def test_hist_plot(self, pipeline, tmp_path):
        datasetdir, _, _, _, _ = pipeline
        out = wf.hist_plot_exp(["synthetic"], [datasetdir], ["score_0"],
                               str(tmp_path))
        assert os.path.isfile(out)

    def test_avatar_plot(self, pipeline):
        datasetdir, outdir, run, _, _ = pipeline
        gif = wf.avatar_plot_exp("synthetic", datasetdir, outdir, run,
                                 score="score_0", n_frames=4, n_subjects=3)
        assert os.path.isfile(gif)
        # the MJPEG-AVI sibling (the ffmpeg-free true-video artifact)
        assert os.path.isfile(gif[:-4] + ".avi")

    def _cohort_atlas(self, datasetdir, tmp_path):
        from multivae_tpu.viz.surface import SurfaceAtlas

        rois_names = np.load(os.path.join(datasetdir, "rois_names.npy"),
                             allow_pickle=True).tolist()
        bases = sorted({"_".join(str(n).split("_")[:-1])
                        for n in rois_names})
        path = str(tmp_path / "atlas.npz")
        SurfaceAtlas.synthetic(roi_names=bases, subdiv=2, seed=1).save(path)
        return path

    def test_avatar_plot_on_surface_atlas(self, pipeline, tmp_path):
        """The animation renders true 3-D surface frames when an atlas
        whose ROI names match the cohort's base names is supplied."""
        datasetdir, outdir, run, _, _ = pipeline
        atlas = self._cohort_atlas(datasetdir, tmp_path)
        gif = wf.avatar_plot_exp("synthetic", datasetdir, outdir, run,
                                 score="score_1", n_frames=3, n_subjects=3,
                                 surface_atlas=atlas, metric="area")
        assert os.path.isfile(gif) and os.path.isfile(gif[:-4] + ".avi")

    def test_daa_plots_on_surface_atlas(self, pipeline, tmp_path):
        datasetdir, outdir, run, resdir, _ = pipeline
        atlas = self._cohort_atlas(datasetdir, tmp_path)
        wf.daa_plot_most_connected("synthetic", datasetdir, outdir, run,
                                   trust_level=0.3, surface_atlas=atlas)
        sig = pd.read_table(os.path.join(resdir, "significant_rois.tsv"))
        if len(sig):
            assert os.path.isfile(
                os.path.join(resdir, "most_connected_rois.png"))


class TestCli:
    def test_cli_commands_registered(self):
        from multivae_tpu.cli import _commands
        cmds = _commands()
        assert set(cmds) == {
            "train", "resume", "eval", "daa", "anova",
            "daa-plot-most-connected", "daa-plot-score-metric", "rsa",
            "rsa-plot", "hist-plot", "avatar-plot", "daa-analysis",
            "daa-robustness", "univariate-tests"}

    def test_cli_fractional_vote_prop_parses(self):
        """``vote_prop`` is a *proportion of models* — the reference's own
        robustness sweep uses 0.5–1.0 (``analyze_avatars.py:176``), so the
        CLI must parse fractional values (regression: an int-typed default
        rejected ``--vote-prop 0.67``)."""
        import argparse

        from multivae_tpu import workflows as wf
        from multivae_tpu.cli import _add_args_from_signature
        for fn in (wf.daa_exp, wf.anova_exp, wf.daa_plot_most_connected,
                   wf.daa_plot_score_metric):
            p = argparse.ArgumentParser()
            _add_args_from_signature(p, fn)
            ns = p.parse_args(["--dataset", "d", "--datasetdir", "x",
                               "--outdir", "o", "--run", "r",
                               "--vote-prop", "0.67"]
                              + (["--score", "s", "--metric", "m"]
                                 if fn is wf.daa_plot_score_metric else []))
            assert ns.vote_prop == pytest.approx(0.67)

    def test_cli_train_invocation(self, tmp_path):
        from multivae_tpu.cli import main
        datasetdir = str(tmp_path / "data")
        outdir = str(tmp_path / "out")
        os.makedirs(outdir)
        make_synthetic_cohort(datasetdir, n_subjects=60, n_scores=3,
                              n_rois=8, missing_rate=0.0, seed=9)
        rc = main(["train", "--dataset", "synthetic",
                   "--datasetdir", datasetdir, "--outdir", outdir,
                   "--input-dims", "3", "8", "--latent-dim", "3",
                   "--style-dim", "2", "2", "--num-epochs", "2",
                   "--batch-size", "16", "--use-tensorboard", "false"])
        assert rc == 0
        runs = pd.read_table(os.path.join(outdir, "runs.tsv"))
        assert len(runs) == 1


class TestDaaVariants:
    def test_linear_strategy_and_fixed_regression(self, pipeline):
        datasetdir, outdir, run, _, _ = pipeline
        resdir = wf.daa_exp(dataset="synthetic", datasetdir=datasetdir,
                            outdir=outdir, run=run,
                            sampling_strategy="linear", reg_method="fixed",
                            n_validation=2, n_samples=12, n_subjects=10,
                            M=4, trust_level=0.5, seed=3, chunk=8)
        pv = np.load(os.path.join(resdir, "pvalues.npy"))
        assert pv.shape == (2, N_SCORES, N_ROIS)
        assert np.all((pv >= 0) & (pv <= 1))
        # fixed method writes no all_coefs
        assert not os.path.isfile(os.path.join(resdir, "all_coefs.npy"))

    def test_uniform_strategy(self, pipeline):
        datasetdir, outdir, run, _, _ = pipeline
        resdir = wf.daa_exp(dataset="synthetic", datasetdir=datasetdir,
                            outdir=outdir, run=run,
                            sampling_strategy="uniform",
                            n_validation=2, n_samples=10, n_subjects=8,
                            M=4, seed=4, chunk=8)
        scores = np.load(os.path.join(resdir, "sampled_scores.npy"))
        assert scores.shape == (2, 8, 10, N_SCORES)

    def test_mixed_regression(self, pipeline):
        datasetdir, outdir, run, _, _ = pipeline
        resdir = wf.daa_exp(dataset="synthetic", datasetdir=datasetdir,
                            outdir=outdir, run=run, reg_method="mixed",
                            n_validation=1, n_samples=10, n_subjects=8,
                            M=4, seed=5, chunk=8)
        pv = np.load(os.path.join(resdir, "pvalues.npy"))
        assert pv.shape == (1, N_SCORES, N_ROIS)
        assert np.all((pv >= 0) & (pv <= 1))

    def test_fetch_dtype_equivalence(self, pipeline):
        """float16 wire fetch (the transfer-bottleneck default) must leave
        the regression outputs and significance votes unchanged to
        tolerance vs an exact float32 fetch; the on-disk artifact is
        float32 either way."""
        datasetdir, outdir, run, _, _ = pipeline
        kw = dict(dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
                  run=run, n_validation=2, n_samples=12, n_subjects=10,
                  M=4, trust_level=0.5, seed=9, chunk=8)
        out = {}
        for dtype in ("float16", "float32"):
            resdir = wf.daa_exp(fetch_dtype=dtype, **kw)
            da = np.load(os.path.join(resdir, "rois_digital_avatars.npy"),
                         mmap_mode="r")
            assert da.dtype == np.float32
            out[dtype] = (
                np.load(os.path.join(resdir, "coefs.npy")),
                np.load(os.path.join(resdir, "pvalues.npy")),
                pd.read_table(os.path.join(resdir,
                                           "significant_rois.tsv")))
        c16, pv16, sig16 = out["float16"]
        c32, pv32, sig32 = out["float32"]
        np.testing.assert_allclose(c16, c32, rtol=2e-2, atol=1e-4)
        # mid-range p-values wobble in the 3rd digit; the decision-relevant
        # contract is the (Bonferroni + voting) significance outcome
        np.testing.assert_allclose(pv16, pv32, atol=1e-2)
        pd.testing.assert_frame_equal(sig16, sig32)

    def test_bad_strategy_raises(self, pipeline):
        datasetdir, outdir, run, _, _ = pipeline
        with pytest.raises(ValueError):
            wf.daa_exp(dataset="synthetic", datasetdir=datasetdir,
                       outdir=outdir, run=run, sampling_strategy="bogus")

    def test_bad_artifact_raises(self, pipeline):
        datasetdir, outdir, run, _, _ = pipeline
        with pytest.raises(ValueError):
            wf.daa_exp(dataset="synthetic", datasetdir=datasetdir,
                       outdir=outdir, run=run, artifact="bogus")

    @pytest.mark.parametrize("reg_method", ["hierarchical", "fixed",
                                            "mixed"])
    def test_stats_only_equivalence(self, pipeline, tmp_path, reg_method):
        """artifact=stats-only never materializes the avatar tensor yet
        reproduces full-mode regression outputs: identical significance
        set, pvalues/coefs equal up to the f32-on-device vs f64-on-host
        level-1 reduction (the avatar values themselves are matched
        exactly through the wire-dtype roundtrip)."""
        from multivae_tpu.analysis.daa import SUFFSTATS_FILE, run_daa
        from multivae_tpu.workflows import _load_trained

        datasetdir, outdir, run, _, _ = pipeline
        experiment, cfg = _load_trained(outdir, run)
        kw = dict(DAA_KW)
        kw.update(n_validation=2, n_samples=12, n_subjects=10, M=4,
                  reg_method=reg_method)
        r_full = run_daa(experiment, cfg, datasetdir,
                         str(tmp_path / f"full_{reg_method}"),
                         artifact="full", **kw)
        r_stats = run_daa(experiment, cfg, datasetdir,
                          str(tmp_path / f"stats_{reg_method}"),
                          artifact="stats-only", **kw)
        assert not os.path.isfile(
            os.path.join(r_stats, "rois_digital_avatars.npy"))
        assert os.path.isfile(os.path.join(r_stats, SUFFSTATS_FILE))
        pv_f = np.load(os.path.join(r_full, "pvalues.npy"))
        pv_s = np.load(os.path.join(r_stats, "pvalues.npy"))
        cf_f = np.load(os.path.join(r_full, "coefs.npy"))
        cf_s = np.load(os.path.join(r_stats, "coefs.npy"))
        np.testing.assert_allclose(cf_s, cf_f, rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(pv_s, pv_f, atol=2e-4)
        sig_f = pd.read_table(os.path.join(r_full, "significant_rois.tsv"))
        sig_s = pd.read_table(os.path.join(r_stats, "significant_rois.tsv"))
        pd.testing.assert_frame_equal(sig_s, sig_f)
        if reg_method == "hierarchical":
            # the per-subject betas feed the ANOVA workflow; both modes
            # must produce them, and the site-effect ANOVA must run on the
            # stats-only artifact set
            from multivae_tpu.analysis.anova import run_anova
            ac_f = np.load(os.path.join(r_full, "all_coefs.npy"),
                           allow_pickle=True)
            ac_s = np.load(os.path.join(r_stats, "all_coefs.npy"),
                           allow_pickle=True)
            b_f = np.asarray(ac_f[0][0])[:, 2:].astype(float)
            b_s = np.asarray(ac_s[0][0])[:, 2:].astype(float)
            np.testing.assert_allclose(b_s, b_f, rtol=1e-3, atol=1e-6)
            clinical_names = np.load(
                os.path.join(datasetdir, "clinical_names.npy"),
                allow_pickle=True)
            rois_names = np.load(
                os.path.join(datasetdir, "rois_names.npy"),
                allow_pickle=True)
            pv = run_anova(r_stats, clinical_names, rois_names,
                           cfg.num_models, kw["n_validation"])
            assert np.all((pv >= 0) & (pv <= 1))


class TestSampledArtifact:
    SAMPLED_KW = dict(n_validation=2, n_samples=12, n_subjects=10, M=4,
                      trust_level=0.7, seed=11, chunk=8)

    def test_sampled_columns_match_full_artifact(self, pipeline, tmp_path):
        """artifact=sampled keeps a random ROI-column subsample of the
        avatars whose values are byte-equal to the full artifact's
        corresponding columns (both route the same wire dtype), plus the
        stats-only regression outputs."""
        from multivae_tpu.analysis.daa import (
            SAMPLED_AVATARS_FILE,
            SAMPLED_ROIS_FILE,
            SUFFSTATS_FILE,
            run_daa,
        )
        from multivae_tpu.workflows import _load_trained

        datasetdir, outdir, run, _, _ = pipeline
        experiment, cfg = _load_trained(outdir, run)
        r_full = run_daa(experiment, cfg, datasetdir, str(tmp_path / "full"),
                         artifact="full", **self.SAMPLED_KW)
        r_sub = run_daa(experiment, cfg, datasetdir, str(tmp_path / "sub"),
                        artifact="sampled", sampled_rois=5,
                        **self.SAMPLED_KW)
        assert not os.path.isfile(
            os.path.join(r_sub, "rois_digital_avatars.npy"))
        assert os.path.isfile(os.path.join(r_sub, SUFFSTATS_FILE))
        sub_idx = np.load(os.path.join(r_sub, SAMPLED_ROIS_FILE))
        assert len(sub_idx) == 5 and len(set(sub_idx.tolist())) == 5
        da_full = np.load(os.path.join(r_full, "rois_digital_avatars.npy"))
        da_sub = np.load(os.path.join(r_sub, SAMPLED_AVATARS_FILE))
        assert da_sub.shape == (2, 10, N_SCORES, 12, 5)
        np.testing.assert_array_equal(da_sub, da_full[..., sub_idx])
        # regression outputs: stats-only equivalence
        pv_f = np.load(os.path.join(r_full, "pvalues.npy"))
        pv_s = np.load(os.path.join(r_sub, "pvalues.npy"))
        np.testing.assert_allclose(pv_s, pv_f, atol=2e-4)

    def test_daa_analysis_runs_off_sampled_artifact(self, pipeline):
        """daa-analysis (KDE + scatter diagnostics) serves from the
        sampled artifact when the full one was never written."""
        from multivae_tpu.analysis.daa import run_daa
        from multivae_tpu.workflows import _load_trained

        datasetdir, outdir, run, _, _ = pipeline
        experiment, cfg = _load_trained(outdir, run)
        daadir = os.path.join(outdir, run, "daa")
        resdir = run_daa(experiment, cfg, datasetdir, daadir,
                         artifact="sampled", sampled_rois=5,
                         **self.SAMPLED_KW)
        assert not os.path.isfile(
            os.path.join(resdir, "rois_digital_avatars.npy"))
        kw = {k: v for k, v in self.SAMPLED_KW.items()
              if k not in ("chunk", "trust_level")}
        figdir = analyze_avatars("synthetic", datasetdir, outdir, run,
                                 n_subjects_to_plot=3, **kw)
        assert os.path.isfile(os.path.join(figdir, "avatars_vs_scores.png"))
        clinical_names = np.load(
            os.path.join(datasetdir, "clinical_names.npy"),
            allow_pickle=True)
        for score in clinical_names:
            assert os.path.isfile(
                os.path.join(figdir, f"sampled_scores_{score}.png"))

    def test_missing_both_artifacts_is_explicit(self, pipeline, tmp_path):
        from multivae_tpu.analysis.avatars import _load_avatars

        with pytest.raises(FileNotFoundError, match="sampled"):
            _load_avatars(str(tmp_path), np.array(["a", "b"]))


class TestEuaimsCohortName:
    def test_euaims_contract(self, tmp_path):
        """The euaims cohort name drives the same multiblock contract."""
        from multivae_tpu.data import DataManager
        d = str(tmp_path / "data")
        make_synthetic_cohort(d, n_subjects=80, n_scores=4, n_rois=10,
                              missing_rate=0.1, seed=31)
        dm = DataManager("euaims", d, ["clinical", "rois"],
                         allow_missing_blocks=True, overwrite=True)
        assert len(dm.train_dataset) > 0
        assert len(dm.test_dataset) > 0


class TestShardedDaaRouting:
    def test_sharded_routing_matches_unsharded(self, pipeline, tmp_path):
        """run_daa routes through avatar_sweep_sharded when >1 device is
        present (VERDICT round-1 item 3); outputs match the single-device
        path (deterministic decode)."""
        import jax
        from multivae_tpu.analysis.daa import run_daa
        from multivae_tpu.workflows import _load_trained

        assert len(jax.devices()) > 1
        datasetdir, outdir, run, _, _ = pipeline
        experiment, cfg = _load_trained(outdir, run)
        kw = dict(DAA_KW)
        kw.update(sample_latents=False, n_validation=1, n_samples=8)
        r_seq = run_daa(experiment, cfg, datasetdir,
                        str(tmp_path / "daa_seq"), use_sharding=False, **kw)
        r_par = run_daa(experiment, cfg, datasetdir,
                        str(tmp_path / "daa_par"), use_sharding="auto", **kw)
        a = np.load(os.path.join(r_seq, "rois_digital_avatars.npy"))
        b = np.load(os.path.join(r_par, "rois_digital_avatars.npy"))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        pa = np.load(os.path.join(r_seq, "pvalues.npy"))
        pb = np.load(os.path.join(r_par, "pvalues.npy"))
        np.testing.assert_allclose(pa, pb, rtol=1e-4, atol=1e-8)


class TestEnsembleAnalyses:
    """The n_models>1 branches of DAA / ANOVA / RSA / plots."""

    @pytest.fixture(scope="class")
    def ens_pipeline(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("ens_pipe")
        datasetdir = str(root / "data")
        outdir = str(root / "out")
        os.makedirs(outdir)
        make_synthetic_cohort(datasetdir, n_subjects=120, n_scores=4,
                              n_rois=12, missing_rate=0.1, seed=9,
                              signal_strength=2.0)
        run = wf.train_exp(
            dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
            input_dims=[4, 12], latent_dim=6, style_dim=[2, 3],
            num_models=2, num_epochs=30, batch_size=32,
            method="joint_elbo", learning_rate=0.003,
            use_tensorboard=False, log_every=10)
        kw = dict(n_validation=2, n_samples=15, n_subjects=12, M=8,
                  trust_level=0.7, seed=21, vote_prop=0.5, chunk=8)
        resdir = wf.daa_exp(dataset="synthetic", datasetdir=datasetdir,
                            outdir=outdir, run=run, **kw)
        return datasetdir, outdir, run, resdir, kw

    def test_daa_artifact_shapes_carry_model_axis(self, ens_pipeline):
        _, _, _, resdir, kw = ens_pipeline
        da = np.load(os.path.join(resdir, "rois_digital_avatars.npy"),
                     mmap_mode="r")
        assert da.shape == (2, 2, 12, 4, 15, 12)
        pv = np.load(os.path.join(resdir, "pvalues.npy"))
        assert pv.shape == (2, 2, 4, 12)
        assert np.isfinite(pv).all() and (pv >= 0).all() and (pv <= 1).all()
        cf = np.load(os.path.join(resdir, "coefs.npy"))
        assert cf.shape == (2, 2, 4, 12)

    def test_anova_on_ensemble_betas(self, ens_pipeline):
        datasetdir, outdir, run, _, kw = ens_pipeline
        out = wf.anova_exp(dataset="synthetic", datasetdir=datasetdir,
                           outdir=outdir, run=run,
                           n_validation=kw["n_validation"],
                           n_samples=kw["n_samples"],
                           n_subjects=kw["n_subjects"], M=kw["M"],
                           trust_level=kw["trust_level"], seed=kw["seed"],
                           vote_prop=kw["vote_prop"])
        assert out is not None

    def test_rsa_on_ensemble(self, ens_pipeline):
        datasetdir, outdir, run, _, _ = ens_pipeline
        rsadir = wf.rsa_exp(dataset="synthetic", datasetdir=datasetdir,
                            outdir=outdir, run=run, n_validation=1,
                            n_subjects=20, seed=7)
        stats_file = os.path.join(outdir, run, "rsa", "kendalltau_stats.npy")
        assert os.path.isfile(stats_file)
        kt = np.load(stats_file, allow_pickle=True)
        assert np.isfinite(np.asarray(kt, dtype=float)).any()

    def test_daa_analysis_on_ensemble(self, ens_pipeline):
        """Ensemble artifacts carry a models axis the reference's slicing
        ignores (upstream ``analyze_avatars.py:64-66`` crashes for
        num_models>1); ``model_idx`` selects the member (fix-forward)."""
        datasetdir, outdir, run, resdir, kw = ens_pipeline
        figdir = analyze_avatars(
            dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
            run=run, n_validation=kw["n_validation"],
            n_samples=kw["n_samples"], n_subjects=kw["n_subjects"],
            M=kw["M"], seed=kw["seed"], n_subjects_to_plot=3,
            model_idx=1)
        assert os.path.isfile(
            os.path.join(figdir, "avatars_vs_scores.png"))
        with pytest.raises(ValueError, match="out of range"):
            analyze_avatars(
                dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
                run=run, n_validation=kw["n_validation"],
                n_samples=kw["n_samples"], n_subjects=kw["n_subjects"],
                M=kw["M"], seed=kw["seed"], model_idx=5)

    def test_daa_plots_on_ensemble(self, ens_pipeline):
        datasetdir, outdir, run, resdir, _ = ens_pipeline
        wf.daa_plot_most_connected(dataset="synthetic",
                                   datasetdir=datasetdir, outdir=outdir,
                                   run=run, trust_level=0.5, vote_prop=0.5)
        # either plots exist or there were no significant associations —
        # both are valid outcomes on a 30-epoch model; the call must not
        # crash on the ensemble coef layout


class TestCliNewFlags:
    def test_parallelism_flags_parse_and_reach_config(self, monkeypatch):
        """The round-2 CLI surface (--data-parallel/--ensemble-parallel/
        --fused-training/--use-sharding/--exact-reconstruction) parses and
        reaches the workflow kwargs."""
        import inspect

        from multivae_tpu import cli
        from multivae_tpu import workflows as _wf

        seen = {}

        def fake_train(**kw):
            seen.update(kw)
            return "run"

        # the CLI builds its parser from the function signature
        fake_train.__signature__ = inspect.signature(_wf.train_exp)
        monkeypatch.setattr("multivae_tpu.workflows.train_exp", fake_train)
        cli.main(["train", "--dataset", "synthetic", "--datasetdir", "/d",
                  "--outdir", "/o", "--input-dims", "4", "12",
                  "--data-parallel", "4", "--ensemble-parallel", "false",
                  "--fused-training", "false", "--num-models", "2"])
        assert seen["data_parallel"] == 4
        assert seen["ensemble_parallel"] == "false"
        assert seen["fused_training"] is False
        assert seen["num_models"] == 2

        seen.clear()

        def fake_daa(**kw):
            seen.update(kw)
            return "res"

        fake_daa.__signature__ = inspect.signature(_wf.daa_exp)
        monkeypatch.setattr("multivae_tpu.workflows.daa_exp", fake_daa)
        cli.main(["daa", "--dataset", "synthetic", "--datasetdir", "/d",
                  "--outdir", "/o", "--run", "r", "--use-sharding", "false",
                  "--exact-reconstruction", "false", "--M", "32",
                  "--fetch-dtype", "float32"])
        assert seen["use_sharding"] == "false"
        assert seen["exact_reconstruction"] == "false"
        assert seen["M"] == 32
        assert seen["fetch_dtype"] == "float32"

    def test_hist_plot_accepts_cohort_lists(self, monkeypatch):
        """hist-plot's aligned list args (one score per cohort entry,
        ``workflow.py:823-868``) parse as multi-value flags."""
        import inspect

        from multivae_tpu import cli
        from multivae_tpu import workflows as _wf

        seen = {}

        def fake_hist(**kw):
            seen.update(kw)
            return "hist.png"

        fake_hist.__signature__ = inspect.signature(_wf.hist_plot_exp)
        monkeypatch.setattr("multivae_tpu.workflows.hist_plot_exp",
                            fake_hist)
        cli.main(["hist-plot", "--datasets", "synthetic", "synthetic",
                  "--datasetdirs", "/d1", "/d2",
                  "--scores", "score_0", "score_1", "--outdir", "/o"])
        assert seen["datasets"] == ["synthetic", "synthetic"]
        assert seen["datasetdirs"] == ["/d1", "/d2"]
        assert seen["scores"] == ["score_0", "score_1"]

    def test_ensemble_parallel_string_normalizes_in_config(self):
        from multivae_tpu.train.config import Config
        assert Config(ensemble_parallel="false").derive().ensemble_parallel \
            is False
        assert Config(ensemble_parallel="true").derive().ensemble_parallel \
            is True
        assert Config(ensemble_parallel="auto").derive().ensemble_parallel \
            == "auto"


class TestSplitRoiMetric:
    def test_split_and_metricless_names(self):
        from multivae_tpu.data.cohorts import split_roi_metric
        assert split_roi_metric("G_precentral_lh_thickness") == (
            "G_precentral_lh", "thickness")
        # a metric-less ROI name degrades to an empty metric instead of
        # crashing univariate_tests / avatar_plot_exp
        assert split_roi_metric("precentral") == ("precentral", "")
        assert split_roi_metric(123) == ("123", "")
