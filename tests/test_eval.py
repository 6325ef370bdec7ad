"""Eval-metric tests: PRD identities, FID closed forms, IWAE sanity,
representation probes, NLL/PRD training hooks."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.data import make_synthetic_cohort
from multivae_tpu.eval.likelihood import batch_likelihoods, estimate_likelihoods
from multivae_tpu.eval.prd import (
    compute_prd,
    compute_prd_from_embedding,
    prd_to_max_f_beta_pair,
)
from multivae_tpu.eval.representation import (
    test_clf_lr_all_subsets,
    train_clf_lr_all_subsets,
)
from multivae_tpu.eval.sample_quality import (
    calc_fid_scores,
    calc_prd_score,
    calculate_fid_from_embeddings,
    calculate_frechet_distance,
)
from multivae_tpu.train.experiment import MultimodalExperiment
from multivae_tpu.workflows import train_exp

RNG = np.random.default_rng(3)


class TestPrd:
    def test_identical_distributions_perfect(self):
        dist = np.full(10, 0.1)
        precision, recall = compute_prd(dist, dist)
        f8, f18 = prd_to_max_f_beta_pair(precision, recall)
        assert f8 > 0.99 and f18 > 0.99

    def test_disjoint_distributions_zero(self):
        p = np.array([0.5, 0.5, 0.0, 0.0])
        q = np.array([0.0, 0.0, 0.5, 0.5])
        precision, recall = compute_prd(p, q)
        assert precision.max() < 1e-3
        assert recall.max() < 1e-3

    def test_monotone_curve(self):
        p = np.array([0.6, 0.3, 0.1])
        q = np.array([0.2, 0.3, 0.5])
        precision, recall = compute_prd(p, q)
        # lambda sweeps 0 -> inf across angles: recall starts maximal and
        # falls; precision starts at 0 and rises
        assert recall[0] >= recall[-1]
        assert precision[-1] >= precision[0]
        assert recall[0] > 0.99 and precision[-1] > 0.99

    def test_embedding_path(self):
        a = RNG.normal(size=(200, 4))
        b = RNG.normal(size=(200, 4))
        prec, rec = compute_prd_from_embedding(a, b, num_clusters=5,
                                               num_runs=2)
        f8, f18 = prd_to_max_f_beta_pair(prec, rec)
        assert f8 > 0.8  # same distribution: high scores
        c = RNG.normal(size=(200, 4)) + 10.0
        prec, rec = compute_prd_from_embedding(a, c, num_clusters=5,
                                               num_runs=2)
        f8b, _ = prd_to_max_f_beta_pair(prec, rec)
        assert f8b < 0.3


class TestFid:
    def test_identical_gaussians_zero(self):
        mu = RNG.normal(size=5)
        a = RNG.normal(size=(500, 5))
        sigma = np.cov(a, rowvar=False)
        assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6

    def test_mean_shift_equals_squared_distance(self):
        sigma = np.eye(3)
        mu1, mu2 = np.zeros(3), np.array([1.0, 2.0, 2.0])
        d = calculate_frechet_distance(mu1, sigma, mu2, sigma)
        np.testing.assert_allclose(d, 9.0, rtol=1e-6)

    def test_from_embeddings(self):
        a = RNG.normal(size=(400, 3))
        b = RNG.normal(size=(400, 3))
        assert calculate_fid_from_embeddings(a, b) < 0.5
        c = b + 5.0
        assert calculate_fid_from_embeddings(a, c) > 50.0


@pytest.fixture(scope="module")
def small_exp(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalexp")
    datasetdir = str(root / "data")
    outdir = str(root / "out")
    os.makedirs(outdir)
    make_synthetic_cohort(datasetdir, n_subjects=100, n_scores=4, n_rois=10,
                          missing_rate=0.1, seed=21)
    run = train_exp(dataset="synthetic", datasetdir=datasetdir,
                    outdir=outdir, input_dims=[4, 10], latent_dim=4,
                    style_dim=[2, 2], num_epochs=10, batch_size=32,
                    method="joint_elbo", use_tensorboard=False, log_every=10)
    exp, cfg = MultimodalExperiment.get_experiment(
        os.path.join(outdir, run, "flags.json"),
        os.path.join(outdir, run, "checkpoints"))
    return exp


class TestLikelihood:
    def test_all_subsets_estimated(self, small_exp):
        lhoods = estimate_likelihoods(small_exp, num_imp_samples=6,
                                      batch_size=16)
        assert set(lhoods) == {"clinical", "rois", "clinical_rois"}
        for s_key, vals in lhoods.items():
            assert set(vals) == {"clinical", "rois", "joint"}
            for v in vals.values():
                assert np.isfinite(v)

    def test_incomplete_batch_scores_present_modalities(self, small_exp):
        """batch_likelihoods on a missing-modality batch: only subsets the
        batch can form are returned, and each scores only the present
        modalities (+ joint over them) — no KeyError on the absent one."""
        exp = small_exp
        data, _, _ = exp.dataset_test.gather(
            exp.dataset_test.idx_per_modality_subset[-1][:8])
        batch = {"clinical": jnp.asarray(data["clinical"])}
        out = batch_likelihoods(exp.model, exp.params[0], batch,
                                jax.random.PRNGKey(3), 4)
        assert set(out) == {"clinical"}
        assert set(out["clinical"]) == {"clinical", "joint"}
        for v in out["clinical"].values():
            assert np.isfinite(float(v))

    def test_joint_leq_sum_of_marginal_like_scale(self, small_exp):
        # joint log-likelihood should be on the order of the sum of
        # marginals (sanity of scales, not a strict bound)
        lhoods = estimate_likelihoods(small_exp, num_imp_samples=6,
                                      batch_size=16)
        j = lhoods["clinical_rois"]["joint"]
        s = (lhoods["clinical_rois"]["clinical"]
             + lhoods["clinical_rois"]["rois"])
        assert abs(j - s) < abs(s) + 50

    def test_more_samples_not_worse(self, small_exp):
        # IWAE bound tightens (increases) with more importance samples,
        # up to noise
        dataset = small_exp.dataset_test
        idxs = dataset.idx_per_modality_subset[-1][:16]
        data, _, _ = dataset.gather(idxs)
        batch = {k: jnp.asarray(v) for k, v in data.items()}
        ll_small = batch_likelihoods(small_exp.model, small_exp.params[0],
                                     batch, jax.random.PRNGKey(0), 2)
        ll_big = batch_likelihoods(small_exp.model, small_exp.params[0],
                                   batch, jax.random.PRNGKey(0), 32)
        assert (ll_big["clinical_rois"]["joint"]
                > ll_small["clinical_rois"]["joint"] - 5.0)


class TestSampleQuality:
    def test_prd_scores(self, small_exp):
        scores = calc_prd_score(small_exp, num_runs=2)
        assert any(k.startswith("prd_clinical_rois") for k in scores)
        for v in scores.values():
            assert 0.0 <= v <= 1.0

    def test_fid_scores(self, small_exp):
        scores = calc_fid_scores(small_exp)
        assert "fid_clinical_rois_rois" in scores
        for v in scores.values():
            assert np.isfinite(v) and v >= 0


class TestRepresentation:
    def test_probes(self, small_exp):
        clfs = train_clf_lr_all_subsets(small_exp)
        if not clfs:
            pytest.skip("single-class labels in split")
        accs = test_clf_lr_all_subsets(small_exp, clfs)
        for acc in accs.values():
            assert 0.0 <= acc <= 1.0


class TestTrainingHooks:
    def test_nll_and_prd_during_training(self, tmp_path):
        datasetdir = str(tmp_path / "data")
        outdir = str(tmp_path / "out")
        os.makedirs(outdir)
        make_synthetic_cohort(datasetdir, n_subjects=60, n_scores=3,
                              n_rois=8, missing_rate=0.0, seed=23)
        from multivae_tpu.train.config import Config
        from multivae_tpu.train.trainer import run_epochs
        from multivae_tpu.utils.filehandling import create_dir_structure
        cfg = Config(dataset="synthetic", datasetdir=datasetdir,
                     dir_experiment=outdir, input_dim=[3, 8], class_dim=3,
                     style_dim=[2, 2], end_epoch=2, batch_size=16,
                     method="joint_elbo", calc_nll=True, calc_prd=True,
                     calc_clf=True, calc_coherence=True,
                     eval_freq=2, eval_freq_fid=2,
                     allow_missing_blocks=False).derive()
        create_dir_structure(cfg)
        exp = MultimodalExperiment(cfg)
        exp.set_optimizers()
        run_epochs(exp, use_tensorboard=False, progress=False)
        import pandas as pd
        df = pd.read_csv(os.path.join(cfg.dir_logs, "metrics.csv"))
        assert (df["phase"] == "Likelihoods").any()
        assert (df["phase"] == "PRD").any()
        # latent-probe + coherence families (reference TBLogger.py:40-57
        # intent, wired fix-forward behind calc_clf / calc_coherence)
        clf_rows = df[df["phase"] == "Latent Representation"]
        coh_rows = df[df["phase"] == "Generation"]
        # the tiny split can degenerate to one label class, in which case
        # both evals legitimately produce nothing; otherwise both families
        # must be present with accuracies in [0, 1]
        if len(clf_rows):
            assert clf_rows["value"].between(0, 1).all()
            assert (coh_rows["metric"] == "Random").any()
            assert coh_rows["value"].between(0, 1).all()
        else:
            assert not len(coh_rows)

    def test_cadence_shares_one_generation_pass(self, tmp_path,
                                                monkeypatch):
        """With calc_prd AND calc_coherence on, the cadence must run
        generate_conditional_samples ONCE per hit (its rng is fixed, so
        the two evals' passes were byte-identical) and fit the modality
        classifiers once per model, not once per hit."""
        datasetdir = str(tmp_path / "data")
        outdir = str(tmp_path / "out")
        os.makedirs(outdir)
        make_synthetic_cohort(datasetdir, n_subjects=60, n_scores=3,
                              n_rois=8, missing_rate=0.0, seed=23)
        from multivae_tpu.eval import coherence as coh
        from multivae_tpu.eval import sample_quality as sq
        from multivae_tpu.train import trainer
        from multivae_tpu.train.config import Config
        from multivae_tpu.utils.filehandling import create_dir_structure

        gen_calls, fit_calls = [], []
        real_gen = sq.generate_conditional_samples
        real_fit = coh.train_modality_classifiers
        monkeypatch.setattr(
            sq, "generate_conditional_samples",
            lambda *a, **k: gen_calls.append(1) or real_gen(*a, **k))
        monkeypatch.setattr(
            coh, "train_modality_classifiers",
            lambda *a, **k: fit_calls.append(1) or real_fit(*a, **k))
        cfg = Config(dataset="synthetic", datasetdir=datasetdir,
                     dir_experiment=outdir, input_dim=[3, 8], class_dim=3,
                     style_dim=[2, 2], end_epoch=4, batch_size=16,
                     method="joint_elbo", calc_prd=True,
                     calc_coherence=True, eval_freq=2, eval_freq_fid=2,
                     allow_missing_blocks=False).derive()
        create_dir_structure(cfg)
        exp = MultimodalExperiment(cfg)
        exp.set_optimizers()
        trainer.run_epochs(exp, use_tensorboard=False, progress=False)
        # 2 cadence hits (epochs 2 and 4): one generation pass per hit
        assert len(gen_calls) == 2, gen_calls
        # classifiers fit once per model across all hits
        assert len(fit_calls) == 1, fit_calls

    def test_prd_fires_on_its_own_cadence(self, monkeypatch):
        """With eval_freq_fid NOT a multiple of eval_freq, PRD must still
        run at fid epochs (it was silently skipped there: the drivers only
        invoked the cadence at eval_freq multiples). Each family fires on
        its own cadence; both fire at the final epoch."""
        from types import SimpleNamespace

        from multivae_tpu.eval import likelihood as lh
        from multivae_tpu.eval import sample_quality as sq
        from multivae_tpu.train.trainer import (
            eval_breaks_after, run_eval_cadence)

        nll_epochs, prd_epochs, gen_epochs = [], [], []
        cfg = SimpleNamespace(end_epoch=6, eval_freq=2, eval_freq_fid=3,
                              calc_nll=True, calc_prd=True, calc_clf=False,
                              calc_coherence=False)
        exp = SimpleNamespace(cfg=cfg)
        monkeypatch.setattr(lh, "estimate_likelihoods",
                            lambda e, m: nll_epochs.append(cur[0]) or {})
        monkeypatch.setattr(sq, "calc_prd_score",
                            lambda e, m, samples=None:
                            prd_epochs.append(cur[0]) or {})
        monkeypatch.setattr(sq, "generate_conditional_samples",
                            lambda e, m: gen_epochs.append(cur[0]))
        cur = [0]
        for epoch_done in range(1, cfg.end_epoch + 1):
            cur[0] = epoch_done
            # drivers call the cadence exactly when eval_breaks_after
            # flags the epoch (plus the final epoch)
            if eval_breaks_after(cfg, epoch_done) \
                    or epoch_done == cfg.end_epoch:
                run_eval_cadence(exp, 0, None, epoch_done)
        assert nll_epochs == [2, 4, 6]
        assert prd_epochs == [3, 6]
        # the shared generation pass runs once per PRD hit only
        assert gen_epochs == [3, 6]


class TestCoherence:
    def test_conditional_coherence(self, small_exp):
        from multivae_tpu.eval.coherence import test_generation
        coh = test_generation(small_exp)
        if not coh:
            pytest.skip("single-class labels in split")
        assert set(coh) == {"clinical", "rois", "clinical_rois"}
        for subset, mods in coh.items():
            for m, acc in mods.items():
                assert 0.0 <= acc <= 1.0

    def test_joint_coherence_of_random_samples(self, small_exp):
        import jax
        from multivae_tpu.eval.coherence import calculate_coherence
        gen = small_exp.model.apply(
            {"params": small_exp.params[0]}, 64, method="generate",
            rngs={"sample": jax.random.PRNGKey(0)})
        score = calculate_coherence(small_exp,
                                    {k: np.asarray(v) for k, v in gen.items()})
        assert np.isnan(score) or 0.0 <= score <= 1.0


class TestJitCache:
    """The eval modules must reuse one compiled program per model — a
    fresh jit per call re-traces and recompiles (seconds-to-minutes
    through the remote relay) on every PRD/NLL/probe cadence hit."""

    def test_cached_jit_reuses_and_guards_id_recycle(self):
        from multivae_tpu.utils.jit_cache import cached_jit

        cache = {}
        builds = []
        model_a = object()
        fn_a = cached_jit(cache, model_a, (12,),
                          lambda: builds.append("a") or "prog_a")
        assert fn_a == "prog_a" and builds == ["a"]
        # same model + extra: no rebuild
        assert cached_jit(cache, model_a, (12,), lambda: builds.append(
            "a2") or "prog_a2") == "prog_a"
        assert builds == ["a"]
        # different extra: separate entry
        cached_jit(cache, model_a, (24,), lambda: builds.append(
            "a24") or "prog_a24")
        assert builds == ["a", "a24"]
        # a DIFFERENT model whose id() collides (simulated by reusing the
        # key) must rebuild: identity is re-validated on lookup
        key = (id(model_a), 12)
        model_b = object()
        cache[key] = (model_b, "stale")
        assert cached_jit(cache, model_a, (12,), lambda: builds.append(
            "re") or "prog_re") == "prog_re"
        assert builds == ["a", "a24", "re"]

    def test_conditional_generation_compiles_once(self, small_exp,
                                                  monkeypatch):
        from multivae_tpu.eval import sample_quality as sq

        monkeypatch.setattr(sq, "_COND_JIT_CACHE", {})
        calls = []
        real_jit = jax.jit

        def counting_jit(*a, **k):
            calls.append(1)
            return real_jit(*a, **k)

        monkeypatch.setattr(sq.jax, "jit", counting_jit)
        sq.generate_conditional_samples(small_exp, num_samples=8)
        sq.generate_conditional_samples(small_exp, num_samples=8)
        assert len(calls) == 1

    def test_representation_inference_compiles_once(self, small_exp,
                                                    monkeypatch):
        from multivae_tpu.eval import representation as rp

        monkeypatch.setattr(rp, "_INFER_JIT_CACHE", {})
        calls = []
        real_jit = jax.jit

        def counting_jit(*a, **k):
            calls.append(1)
            return real_jit(*a, **k)

        monkeypatch.setattr(rp.jax, "jit", counting_jit)
        clfs = train_clf_lr_all_subsets(small_exp)
        test_clf_lr_all_subsets(small_exp, clfs)
        assert len(calls) == 1


class TestSampleDumps:
    def test_save_generated_samples_contract(self, small_exp):
        """The reference's FID sample-dump artifact
        (utils/save_samples.py:35-49): one .npy vector per sample under
        fid/<group>/<modality>/NNNNNN.npy, groups = real/random/subsets;
        calculate_fid_given_paths consumes the dump directories."""
        from multivae_tpu.eval.sample_quality import (
            calculate_fid_given_paths, save_generated_samples)

        base = save_generated_samples(small_exp, num_samples=12)
        assert os.path.basename(base) == "fid"
        groups = sorted(os.listdir(base))
        assert {"real", "random", "clinical", "rois",
                "clinical_rois"} <= set(groups)
        d_real = os.path.join(base, "real", "rois")
        d_rand = os.path.join(base, "random", "rois")
        files = sorted(os.listdir(d_real))
        assert files[0] == "000000.npy"
        assert np.load(os.path.join(d_real, files[0])).shape == (10,)
        assert len(os.listdir(d_rand)) == 12
        fid = calculate_fid_given_paths(d_rand, d_real)
        assert np.isfinite(fid) and fid >= 0


class TestEvalCommand:
    def test_eval_exp_posthoc(self, tmp_path):
        """The standalone `eval` command: post-hoc NLL/PRD/probe/coherence
        on a saved checkpoint, TSV summary with the four scalar families
        (subject to label degeneracy for the probe/coherence rows)."""
        import pandas as pd

        from multivae_tpu.workflows import eval_exp, train_exp

        datasetdir = str(tmp_path / "data")
        outdir = str(tmp_path / "out")
        os.makedirs(outdir)
        make_synthetic_cohort(datasetdir, n_subjects=60, n_scores=3,
                              n_rois=8, missing_rate=0.0, seed=23)
        run = train_exp(dataset="synthetic", datasetdir=datasetdir,
                        outdir=outdir, input_dims=[3, 8], latent_dim=3,
                        style_dim=[2, 2], num_epochs=2, batch_size=16,
                        method="joint_elbo", use_tensorboard=False)
        out = eval_exp(dataset="synthetic", datasetdir=datasetdir,
                       outdir=outdir, run=run)
        assert out.endswith("eval_latest.tsv") and os.path.exists(out)
        d = pd.read_table(out)
        fams = set(d.family)
        assert {"Likelihoods", "PRD"} <= fams
        assert np.isfinite(d.value).all()
        # a specific checkpoint by epoch works too
        out1 = eval_exp(dataset="synthetic", datasetdir=datasetdir,
                        outdir=outdir, run=run, load_epoch=1,
                        prd=False, clf=False, coherence=False)
        assert out1.endswith("eval_0001.tsv") and os.path.exists(out1)


class TestEmbeddingHook:
    """The FID/PRD embedding slot (the reference fills it with InceptionV3,
    fid/inception.py:16-312; here any feature extractor plugs in)."""

    def test_identity_default(self):
        from multivae_tpu.eval.sample_quality import (
            calculate_fid_from_embeddings)
        rng = np.random.default_rng(0)
        a = rng.normal(size=(64, 6)).astype(np.float32)
        b = rng.normal(loc=0.5, size=(64, 6)).astype(np.float32)
        assert calculate_fid_from_embeddings(a, b) == pytest.approx(
            calculate_fid_from_embeddings(a, b, embedding=None))

    def test_linear_stub_npz_and_callable_agree(self, tmp_path):
        from multivae_tpu.eval.sample_quality import (
            calculate_fid_from_embeddings, load_embedding)
        rng = np.random.default_rng(1)
        a = rng.normal(size=(80, 6)).astype(np.float32)
        b = rng.normal(loc=0.3, size=(80, 6)).astype(np.float32)
        w = rng.normal(size=(6, 3)).astype(np.float32)
        bias = rng.normal(size=(3,)).astype(np.float32)
        path = str(tmp_path / "emb.npz")
        np.savez(path, W=w, b=bias)
        fid_npz = calculate_fid_from_embeddings(a, b, embedding=path)
        fid_fn = calculate_fid_from_embeddings(
            a, b, embedding=lambda x: np.asarray(x, np.float64) @ w + bias)
        assert fid_npz == pytest.approx(fid_fn, rel=1e-6)
        # the affine map changes the statistic vs identity
        assert fid_npz != pytest.approx(
            calculate_fid_from_embeddings(a, b), rel=1e-3)
        emb = load_embedding(path)
        np.testing.assert_allclose(emb(a), np.asarray(a, np.float64) @ w
                                   + bias, rtol=1e-6)

    def test_fid_given_paths_with_embedding(self, tmp_path):
        from multivae_tpu.eval.sample_quality import (
            calculate_fid_given_paths)
        rng = np.random.default_rng(2)
        a = rng.normal(size=(50, 4)).astype(np.float32)
        b = rng.normal(loc=1.0, size=(50, 4)).astype(np.float32)
        pa, pb = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
        np.save(pa, a)
        np.save(pb, b)
        np.savez(str(tmp_path / "e.npz"), W=np.eye(4, 2, dtype=np.float32))
        fid = calculate_fid_given_paths(pa, pb,
                                        embedding=str(tmp_path / "e.npz"))
        assert np.isfinite(fid) and fid > 0

    def test_module_attr_spec_and_errors(self):
        from multivae_tpu.eval.sample_quality import load_embedding
        fn = load_embedding("numpy:asarray")
        assert callable(fn)
        with pytest.raises(ValueError):
            load_embedding("not-a-spec")
        with pytest.raises(TypeError):
            load_embedding("numpy:pi")

    def test_prd_accepts_embedding(self, small_exp):
        from multivae_tpu.eval.sample_quality import calc_prd_score
        scores = calc_prd_score(small_exp, num_clusters=3, num_runs=2,
                                embedding=lambda x: np.asarray(x)[:, :3])
        assert scores and all(np.isfinite(v) for v in scores.values())
