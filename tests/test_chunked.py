"""Chunked (K-epochs-per-dispatch) trainer: equivalence and scheduling.

The chunked driver (``multivae_tpu/train/chunked.py``) must be a pure
performance transform of the per-epoch driver: same batch partition, same
rng streams, same logger write sequence, same checkpoint artifacts.
"""

import os

import jax
import numpy as np
import pandas as pd
import pytest

from multivae_tpu.data import make_synthetic_cohort
from multivae_tpu.train.config import Config
from multivae_tpu.workflows import train_exp

pytestmark = pytest.mark.driver  # chunked-dispatch driver equivalence


class TestChunkedEquivalence:
    @pytest.fixture(scope="class")
    def runs(self, tmp_path_factory):
        """The same tiny missing-blocks cohort trained with epoch_chunk=1
        (per-epoch driver) and epoch_chunk=50 (a 2-segment chunk of 10
        epochs spanning the 0004 and 0009 checkpoint boundaries, plus a
        2-epoch tail chunk ending at the final-epoch checkpoint)."""
        root = tmp_path_factory.mktemp("chunked")
        datasetdir = str(root / "data")
        make_synthetic_cohort(datasetdir, n_subjects=80, n_scores=4,
                              n_rois=16, missing_rate=0.2, seed=1)
        outs, names = [], []
        for chunk in (1, 50):
            outdir = str(root / f"out{chunk}")
            os.makedirs(outdir)
            run = train_exp(
                dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
                input_dims=[4, 16], latent_dim=4, style_dim=[2, 3],
                num_epochs=12, batch_size=32, method="joint_elbo",
                learning_rate=0.01, use_tensorboard=False,
                epoch_chunk=chunk)
            outs.append(outdir)
            names.append(run)
        return outs, names

    def test_final_params_match(self, runs):
        from multivae_tpu.train.experiment import MultimodalExperiment

        (out1, out2), (r1, r2) = runs
        exps = []
        for out, r in zip((out1, out2), (r1, r2)):
            exp, _ = MultimodalExperiment.get_experiment(
                os.path.join(out, r, "flags.json"),
                os.path.join(out, r, "checkpoints"))
            exps.append(exp)
        l1 = jax.tree_util.tree_leaves(exps[0].params[0])
        l2 = jax.tree_util.tree_leaves(exps[1].params[0])
        for a, b in zip(l1, l2):
            # same ops in the same order; only XLA fusion differs between
            # the two compiled programs (f32 roundoff)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_log_sequence_matches(self, runs):
        (out1, out2), (r1, r2) = runs
        d1 = pd.read_csv(os.path.join(out1, r1, "logs", "metrics.csv"))
        d2 = pd.read_csv(os.path.join(out2, r2, "logs", "metrics.csv"))
        assert len(d1) == len(d2)
        # identical (step, phase, metric) sequence — the chunked driver
        # replays the exact per-epoch write order from the fetched matrix
        assert (d1[["step", "phase", "metric"]].values
                == d2[["step", "phase", "metric"]].values).all()
        np.testing.assert_allclose(d1["value"].values, d2["value"].values,
                                   rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("boundary", ["0004", "0009"])
    def test_mid_run_checkpoint_matches_per_epoch(self, runs, boundary):
        """Both checkpoint boundaries INSIDE the 10-epoch chunk — emitted
        as the chunk scan's own snapshot outputs and fetched only after
        the next chunk's dispatch donated the live params/opt buffers —
        must carry the same values as the per-epoch driver's synchronous
        checkpoints at those epochs."""
        from multivae_tpu.train.checkpoint import restore_checkpoint
        from multivae_tpu.train.experiment import MultimodalExperiment

        (out1, out2), (r1, r2) = runs
        trees = []
        for out, r in zip((out1, out2), (r1, r2)):
            exp, _ = MultimodalExperiment.get_experiment(
                os.path.join(out, r, "flags.json"),
                os.path.join(out, r, "checkpoints"))
            path = os.path.join(out, r, "checkpoints", boundary, "model")
            trees.append(restore_checkpoint(path, exp.params[0]))
        for a, b in zip(jax.tree_util.tree_leaves(trees[0]),
                        jax.tree_util.tree_leaves(trees[1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_checkpoint_cadence_preserved(self, runs):
        (out1, out2), (r1, r2) = runs
        for out, r in zip((out1, out2), (r1, r2)):
            ckpts = sorted(d for d in os.listdir(
                os.path.join(out, r, "checkpoints"))
                if os.path.isdir(os.path.join(out, r, "checkpoints", d)))
            assert ckpts == ["0004", "0009", "0011"]


class TestResident:
    def test_resident_gather_matches_dataset_gather(self, tmp_path):
        """On-device row lookup from the resident transformed blocks equals
        ``MultimodalDataset.gather`` exactly (scalers are row-wise)."""
        from multivae_tpu.train.chunked import make_resident
        from multivae_tpu.train.experiment import MultimodalExperiment
        from multivae_tpu.utils.filehandling import create_dir_structure

        datasetdir = str(tmp_path / "data")
        outdir = str(tmp_path / "out")
        os.makedirs(outdir)
        make_synthetic_cohort(datasetdir, n_subjects=40, n_scores=3,
                              n_rois=8, missing_rate=0.3, seed=7)
        cfg = Config(dataset="synthetic", datasetdir=datasetdir,
                     dir_experiment=outdir, input_dim=[3, 8], class_dim=4,
                     style_dim=[2, 2], end_epoch=1, batch_size=8,
                     method="joint_elbo").derive()
        create_dir_structure(cfg)
        exp = MultimodalExperiment(cfg)
        dataset = exp.dataset_train
        mod_names = [m.name for m in exp.model.modalities]
        resident = make_resident(dataset, mod_names)
        idxs = np.arange(min(10, len(dataset)))
        data, _, _ = dataset.gather(idxs)
        true = (dataset.indices[idxs] if dataset.indices is not None
                else idxs)
        for mod, batch in data.items():
            rows = dataset._row_idx[mod][true]
            np.testing.assert_array_equal(resident[mod][rows], batch)


class TestChunkedOnMesh:
    def test_dp_chunked_trains(self, tmp_path):
        """Fast smoke for the dp+chunked production path: one 4-epoch
        chunked run on a 2-device data mesh trains (decreasing loss) and
        writes its final checkpoint. The full per-epoch equivalence runs
        in the slow suite."""
        import pandas as pd

        datasetdir = str(tmp_path / "data")
        make_synthetic_cohort(datasetdir, n_subjects=64, n_scores=4,
                              n_rois=16, missing_rate=0.0, seed=5)
        outdir = str(tmp_path / "out")
        os.makedirs(outdir)
        run = train_exp(
            dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
            input_dims=[4, 16], latent_dim=4, style_dim=[2, 3],
            num_epochs=4, batch_size=32, method="joint_elbo",
            learning_rate=0.01, use_tensorboard=False,
            data_parallel=2, epoch_chunk=50)
        d = pd.read_csv(os.path.join(outdir, run, "logs", "metrics.csv"))
        loss = d[(d.phase == "train") & (d.metric == "loss")]["value"]
        assert loss.iloc[-1] < loss.iloc[0]
        assert os.path.exists(os.path.join(
            outdir, run, "checkpoints", "0003", "model"))

    @pytest.mark.slow
    def test_dp_chunked_matches_dp_per_epoch(self, tmp_path):
        """Data-parallel training now runs through the chunked driver too:
        the dp Pallas kernel (shard_map + grad psum) is the chunk's fused
        segment and remainder groups keep the mesh only when their rows
        divide it. epoch_chunk=50 vs the per-epoch dp driver must agree on
        the final params and the full metric sequence."""
        import pandas as pd

        from multivae_tpu.train.experiment import MultimodalExperiment

        datasetdir = str(tmp_path / "data")
        make_synthetic_cohort(datasetdir, n_subjects=80, n_scores=4,
                              n_rois=16, missing_rate=0.2, seed=5)
        outs, names = [], []
        for chunk in (1, 50):
            outdir = str(tmp_path / f"out{chunk}")
            os.makedirs(outdir)
            run = train_exp(
                dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
                input_dims=[4, 16], latent_dim=4, style_dim=[2, 3],
                num_epochs=7, batch_size=32, method="joint_elbo",
                learning_rate=0.01, use_tensorboard=False,
                data_parallel=2, epoch_chunk=chunk)
            outs.append(outdir)
            names.append(run)
        leaves = []
        for out, r in zip(outs, names):
            exp, _ = MultimodalExperiment.get_experiment(
                os.path.join(out, r, "flags.json"),
                os.path.join(out, r, "checkpoints"))
            leaves.append(jax.tree_util.tree_leaves(exp.params[0]))
        for a, b in zip(*leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
        d1 = pd.read_csv(os.path.join(outs[0], names[0], "logs",
                                      "metrics.csv"))
        d2 = pd.read_csv(os.path.join(outs[1], names[1], "logs",
                                      "metrics.csv"))
        assert (d1[["step", "phase", "metric"]].values
                == d2[["step", "phase", "metric"]].values).all()
        np.testing.assert_allclose(d1["value"].values, d2["value"].values,
                                   rtol=1e-3, atol=1e-3)


class TestChunkedEnsemble:
    def test_ensemble_chunked_trains(self, tmp_path):
        """Fast smoke for the production-default ensemble path (chunked,
        EnsembleChunkRunner): both members train with decreasing loss and
        final per-member checkpoints. The equivalence matrix vs the
        per-epoch ensemble loop runs in the slow suite."""
        datasetdir = str(tmp_path / "data")
        make_synthetic_cohort(datasetdir, n_subjects=48, n_scores=3,
                              n_rois=8, missing_rate=0.2, seed=7)
        outdir = str(tmp_path / "out")
        os.makedirs(outdir)
        run = train_exp(
            dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
            input_dims=[3, 8], latent_dim=4, style_dim=[2, 2],
            num_models=2, num_epochs=3, batch_size=16,
            method="joint_elbo", learning_rate=0.01,
            use_tensorboard=False, ensemble_parallel=True,
            fused_training=False, epoch_chunk=50)
        for m in range(2):
            d = pd.read_csv(os.path.join(outdir, run, "logs", f"model_{m}",
                                         "metrics.csv"))
            loss = d[(d.phase == "train") & (d.metric == "loss")]["value"]
            assert loss.iloc[-1] < loss.iloc[0]
            assert os.path.exists(os.path.join(
                outdir, run, "checkpoints", f"model_{m}", "0002", "model"))

    @pytest.fixture(scope="class")
    def runs(self, tmp_path_factory):
        """A 2-member ensemble (forced ensemble_parallel over the device
        mesh) trained per-epoch vs chunked, on a cohort whose partial
        subset yields COMPLETE partial batches — exercising the
        stationary common-segment split (the first n_common scannable
        batches in stream order are not a leading run)."""
        root = tmp_path_factory.mktemp("chunked_ens")
        datasetdir = str(root / "data")
        make_synthetic_cohort(datasetdir, n_subjects=120, n_scores=4,
                              n_rois=12, missing_rate=0.4, seed=2)
        outs, names = [], []
        for chunk in (1, 50):
            outdir = str(root / f"out{chunk}")
            os.makedirs(outdir)
            run = train_exp(
                dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
                input_dims=[4, 12], latent_dim=4, style_dim=[2, 3],
                num_models=2, num_epochs=7, batch_size=16,
                method="joint_elbo", learning_rate=0.01,
                use_tensorboard=False, ensemble_parallel=True,
                fused_training=False, epoch_chunk=chunk)
            outs.append(outdir)
            names.append(run)
        return outs, names

    @pytest.mark.slow
    def test_final_params_match_per_member(self, runs):
        from multivae_tpu.train.experiment import MultimodalExperiment

        (out1, out2), (r1, r2) = runs
        exps = []
        for out, r in zip((out1, out2), (r1, r2)):
            exp, _ = MultimodalExperiment.get_experiment(
                os.path.join(out, r, "flags.json"),
                os.path.join(out, r, "checkpoints"))
            exps.append(exp)
        for m in range(2):
            for a, b in zip(
                    jax.tree_util.tree_leaves(exps[0].params[m]),
                    jax.tree_util.tree_leaves(exps[1].params[m])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_log_sequence_matches_per_member(self, runs):
        (out1, out2), (r1, r2) = runs
        for m in range(2):
            d1 = pd.read_csv(os.path.join(out1, r1, "logs", f"model_{m}",
                                          "metrics.csv"))
            d2 = pd.read_csv(os.path.join(out2, r2, "logs", f"model_{m}",
                                          "metrics.csv"))
            assert len(d1) == len(d2)
            assert (d1[["step", "phase", "metric"]].values
                    == d2[["step", "phase", "metric"]].values).all()
            np.testing.assert_allclose(d1["value"].values,
                                       d2["value"].values,
                                       rtol=1e-3, atol=1e-3)

    @pytest.mark.slow
    def test_checkpoint_cadence_per_member(self, runs):
        (out1, out2), (r1, r2) = runs
        for out, r in zip((out1, out2), (r1, r2)):
            for m in range(2):
                d = os.path.join(out, r, "checkpoints", f"model_{m}")
                ckpts = sorted(x for x in os.listdir(d)
                               if os.path.isdir(os.path.join(d, x)))
                assert ckpts == ["0004", "0006"], (out, m)

    @pytest.mark.slow
    def test_nll_cadence_matches_per_epoch(self, tmp_path):
        """calc_nll on the chunked ensemble driver emits the same
        likelihood log rows at the same cadence as the per-epoch ensemble
        loop (which runs them inside test_one_epoch)."""
        datasetdir = str(tmp_path / "data")
        make_synthetic_cohort(datasetdir, n_subjects=64, n_scores=3,
                              n_rois=8, missing_rate=0.0, seed=6)
        frames = []
        for chunk in (1, 50):
            outdir = str(tmp_path / f"out{chunk}")
            os.makedirs(outdir)
            run = train_exp(
                dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
                input_dims=[3, 8], latent_dim=4, style_dim=[2, 2],
                num_models=2, num_epochs=6, batch_size=16,
                method="joint_elbo", learning_rate=0.01,
                use_tensorboard=False, ensemble_parallel=True,
                fused_training=False, epoch_chunk=chunk,
                calc_nll=True, eval_freq=3)
            frames.append([pd.read_csv(os.path.join(
                outdir, run, "logs", f"model_{m}", "metrics.csv"))
                for m in range(2)])
        for m in range(2):
            l1 = frames[0][m][frames[0][m].phase == "Likelihoods"]
            l2 = frames[1][m][frames[1][m].phase == "Likelihoods"]
            assert len(l1) > 0
            assert (l1[["step", "metric"]].values
                    == l2[["step", "metric"]].values).all()
            np.testing.assert_allclose(l1["value"].values,
                                       l2["value"].values,
                                       rtol=1e-3, atol=1e-3)

    @pytest.mark.slow
    def test_no_common_segment_matches_per_epoch(self, tmp_path):
        """With heavy missingness and a large batch the all-modality
        subset yields ZERO scannable batches (n_common == 0): the whole
        epoch runs through the remainder groups; chunked vs per-epoch
        must still agree."""
        from multivae_tpu.train.experiment import MultimodalExperiment

        datasetdir = str(tmp_path / "data")
        make_synthetic_cohort(datasetdir, n_subjects=60, n_scores=3,
                              n_rois=8, missing_rate=0.6, seed=8)
        exps = []
        for chunk in (1, 50):
            outdir = str(tmp_path / f"out{chunk}")
            os.makedirs(outdir)
            run = train_exp(
                dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
                input_dims=[3, 8], latent_dim=4, style_dim=[2, 2],
                num_models=2, num_epochs=6, batch_size=48,
                method="joint_elbo", learning_rate=0.01,
                use_tensorboard=False, ensemble_parallel=True,
                fused_training=False, epoch_chunk=chunk)
            exp, _ = MultimodalExperiment.get_experiment(
                os.path.join(outdir, run, "flags.json"),
                os.path.join(outdir, run, "checkpoints"))
            exps.append(exp)
        from multivae_tpu.train.chunked_ensemble import plan_ensemble_epoch
        mod_names = [m.name for m in exps[0].model.modalities]
        n_common, _ = plan_ensemble_epoch(exps[0].cfg,
                                          exps[0].dataset_train,
                                          mod_names, 0)
        assert n_common == 0  # the scenario under test
        for m in range(2):
            for a, b in zip(
                    jax.tree_util.tree_leaves(exps[0].params[m]),
                    jax.tree_util.tree_leaves(exps[1].params[m])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_fused_ensemble_kernel_chunked_matches_per_epoch(self,
                                                             tmp_path):
        """With fused_training on, the ensemble chunk's common segment is
        the per-member Pallas epoch kernel over the model axis; chunked
        vs per-epoch must still agree per member."""
        from multivae_tpu.train.experiment import MultimodalExperiment

        datasetdir = str(tmp_path / "data")
        make_synthetic_cohort(datasetdir, n_subjects=96, n_scores=4,
                              n_rois=12, missing_rate=0.0, seed=4)
        exps = []
        for chunk in (1, 50):
            outdir = str(tmp_path / f"out{chunk}")
            os.makedirs(outdir)
            run = train_exp(
                dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
                input_dims=[4, 12], latent_dim=4, style_dim=[2, 3],
                num_models=2, num_epochs=6, batch_size=16,
                method="joint_elbo", learning_rate=0.01,
                use_tensorboard=False, ensemble_parallel=True,
                fused_training=True, epoch_chunk=chunk)
            exp, _ = MultimodalExperiment.get_experiment(
                os.path.join(outdir, run, "flags.json"),
                os.path.join(outdir, run, "checkpoints"))
            exps.append(exp)
        for m in range(2):
            for a, b in zip(
                    jax.tree_util.tree_leaves(exps[0].params[m]),
                    jax.tree_util.tree_leaves(exps[1].params[m])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-4, atol=1e-5)


class TestSaveOptimizerPolicy:
    def _train(self, root, policy):
        datasetdir = str(root / "data")
        if not os.path.isdir(datasetdir):
            make_synthetic_cohort(datasetdir, n_subjects=60, n_scores=3,
                                  n_rois=10, missing_rate=0.0, seed=3)
        outdir = str(root / f"out_{policy}")
        os.makedirs(outdir)
        run = train_exp(
            dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
            input_dims=[3, 10], latent_dim=4, style_dim=[2, 2],
            num_epochs=12, batch_size=32, method="joint_elbo",
            learning_rate=0.01, use_tensorboard=False, epoch_chunk=50,
            save_optimizer=policy)
        return os.path.join(outdir, run, "checkpoints")

    def test_latest_writes_opt_only_at_chunk_newest(self, tmp_path):
        """``latest`` persists opt_state only for the newest boundary of
        each chunk: here the 12 epochs run as one 10-epoch chunk
        (boundaries 0004, 0009) plus a 2-epoch tail (0011), so 0009 and
        0011 carry opt_state and 0004 does not. Params are written for
        every boundary regardless, and resume-from-latest stays exact."""
        ckpts = self._train(tmp_path, "latest")
        assert sorted(d for d in os.listdir(ckpts)
                      if os.path.isdir(os.path.join(ckpts, d))) \
            == ["0004", "0009", "0011"]
        has_opt = {d: os.path.exists(os.path.join(ckpts, d, "opt_state"))
                   for d in ("0004", "0009", "0011")}
        assert has_opt == {"0004": False, "0009": True, "0011": True}

    def test_none_writes_no_opt_state(self, tmp_path):
        ckpts = self._train(tmp_path, "none")
        for d in os.listdir(ckpts):
            assert not os.path.exists(os.path.join(ckpts, d, "opt_state"))
            if os.path.isdir(os.path.join(ckpts, d)):
                assert os.path.exists(os.path.join(ckpts, d, "model"))

    def test_latest_resume_restores_opt_from_newest(self, tmp_path):
        """Under ``latest`` the newest checkpoint dir always carries
        opt_state, so resume-from-latest restores the exact Adam state
        (count == trained steps, nonzero moments)."""
        from multivae_tpu.train.experiment import MultimodalExperiment
        from multivae_tpu.train.trainer import resume_from_checkpoints

        ckpts = self._train(tmp_path, "latest")
        run_dir = os.path.dirname(ckpts)
        exp, cfg = MultimodalExperiment.get_experiment(
            os.path.join(run_dir, "flags.json"), ckpts)
        exp.set_optimizers()
        start = resume_from_checkpoints(exp)
        assert start == 12
        opt = exp.opt_states[0]
        assert int(opt.count) > 0
        assert float(np.abs(np.asarray(opt.mu)).max()) > 0

    def test_rejects_unknown_policy(self):
        with pytest.raises(ValueError, match="save_optimizer"):
            Config(dataset="synthetic", input_dim=[3, 8], class_dim=4,
                   style_dim=[2, 2], end_epoch=5, method="joint_elbo",
                   save_optimizer="sometimes").derive()


class TestChunkPlan:
    def _cfg(self, **kw):
        base = dict(dataset="synthetic", input_dim=[3, 8], class_dim=4,
                    style_dim=[2, 2], end_epoch=23, method="joint_elbo",
                    epoch_chunk=50)
        base.update(kw)
        return Config(**base).derive()

    def test_spans_checkpoint_boundaries_as_segments(self):
        from multivae_tpu.train.chunked import chunk_plan

        cfg = self._cfg()
        # epoch 0, end 23: 20 whole 5-epoch segments fit before the tail —
        # boundaries 4/9/14/19 are snapshot rows, not chunk breaks
        assert chunk_plan(cfg, 0) == (4, 5)
        # tail: epochs 20,21,22 in one short segment, ending at end_epoch
        assert chunk_plan(cfg, 20) == (1, 3)
        # mid-cadence start (resume): one short segment realigns to the
        # next boundary (epochs 3,4), then 5-epoch segments resume
        assert chunk_plan(cfg, 3) == (1, 2)
        assert chunk_plan(cfg, 5) == (3, 5)

    def test_epoch_chunk_caps_total_epochs(self):
        from multivae_tpu.train.chunked import chunk_plan

        cfg = self._cfg(epoch_chunk=10, end_epoch=100)
        assert chunk_plan(cfg, 0) == (2, 5)
        # a sub-segment cap still chains up to the cap in one segment
        cfg2 = self._cfg(epoch_chunk=3, end_epoch=100)
        assert chunk_plan(cfg2, 0) == (1, 3)

    def test_breaks_at_eval_cadence_when_enabled(self):
        from multivae_tpu.train.chunked import chunk_plan

        cfg = self._cfg(calc_nll=True, eval_freq=3, end_epoch=30)
        # NLL fires after epoch 2 ((2+1)%3==0): chunk is 3, not 5
        assert chunk_plan(cfg, 0) == (1, 3)
        cfg2 = self._cfg(calc_nll=False, eval_freq=3, end_epoch=30)
        assert chunk_plan(cfg2, 0) == (6, 5)
        # PRD cadence breaks too
        cfg3 = self._cfg(calc_prd=True, eval_freq_fid=7, end_epoch=30)
        assert chunk_plan(cfg3, 0) == (1, 5)

    def test_profile_first_is_single_epoch(self):
        from multivae_tpu.train.chunked import chunk_plan

        cfg = self._cfg()
        assert chunk_plan(cfg, 0, profile_first=True) == (1, 1)

    def test_short_runs(self):
        from multivae_tpu.train.chunked import chunk_plan

        cfg = self._cfg(end_epoch=2)
        assert chunk_plan(cfg, 0) == (1, 2)

    def test_schedule_invariants_exhaustive(self):
        """Replaying chunk_plan from any start must (a) cover every epoch
        exactly once, (b) place every checkpoint boundary ((e+1)%5==0 and
        the final epoch) on a segment end, and (c) never run an epoch past
        an NLL/PRD host event inside a chunk — for every combination of
        end_epoch, cap, eval cadence, and resume start."""
        from multivae_tpu.train.chunked import chunk_plan

        for end in (1, 2, 5, 7, 12, 23, 50, 53):
            for cap in (1, 3, 5, 10, 50):
                for nll, freq in ((False, 25), (True, 3), (True, 7)):
                    for start in (0, 3, 5):
                        if start >= end:
                            continue
                        cfg = self._cfg(end_epoch=end, epoch_chunk=cap,
                                        calc_nll=nll, eval_freq=freq)
                        cfg.start_epoch = start
                        seg_ends, epoch = [], start
                        while epoch < end:
                            n_seg, seg_len = chunk_plan(cfg, epoch)
                            k = n_seg * seg_len
                            assert 1 <= k <= max(cap, 1), (end, cap, epoch)
                            assert epoch + k <= end, (end, cap, epoch)
                            for si in range(n_seg):
                                e_seg = epoch + (si + 1) * seg_len - 1
                                seg_ends.append(e_seg)
                                if nll and si < n_seg - 1:
                                    # host events only at chunk ends
                                    assert (e_seg + 1) % freq != 0
                            if nll:
                                # no epoch inside the chunk may cross an
                                # NLL event (the host must run it)
                                for e in range(epoch, epoch + k - 1):
                                    assert (e + 1) % freq != 0, \
                                        (end, cap, freq, epoch, e)
                            epoch += k
                        # checkpoint boundaries all fall on segment ends
                        for e in range(start, end):
                            if (e + 1) % 5 == 0 or (e + 1) == end:
                                assert e in seg_ends, (end, cap, nll, freq,
                                                       start, e)


class TestChunkedMembers:
    @pytest.mark.slow
    def test_sequential_members_train_chunked(self, tmp_path):
        """num_models>1 with ensemble_parallel=False routes each member
        through the chunked driver: per-member logs, checkpoints, and a
        decreasing loss for every member."""
        datasetdir = str(tmp_path / "data")
        outdir = str(tmp_path / "out")
        os.makedirs(outdir)
        make_synthetic_cohort(datasetdir, n_subjects=60, n_scores=3,
                              n_rois=10, missing_rate=0.2, seed=3)
        run = train_exp(
            dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
            input_dims=[3, 10], latent_dim=4, style_dim=[2, 2],
            num_epochs=6, batch_size=16, method="joint_elbo",
            learning_rate=0.01, use_tensorboard=False, num_models=2,
            ensemble_parallel=False, epoch_chunk=10)
        for m in range(2):
            logdir = os.path.join(outdir, run, "logs", f"model_{m}")
            csvs = [os.path.join(logdir, f) for f in os.listdir(logdir)
                    if f.endswith(".csv")]
            assert csvs, f"no metric csv for member {m}"
            df = pd.read_csv(csvs[0])
            tr = df[(df.phase == "train") & (df.metric == "loss")]["value"]
            assert tr.iloc[-1] < tr.iloc[0]
            ckpts = sorted(d for d in os.listdir(
                os.path.join(outdir, run, "checkpoints", f"model_{m}"))
                if d.startswith("0"))
            assert ckpts == ["0004", "0005"]

    @pytest.mark.slow
    def test_nll_cadence_runs_at_chunk_boundary(self, tmp_path):
        """calc_nll with eval_freq=3 forces chunk boundaries at epochs 3
        and 6; Likelihoods rows land in the CSV at the same cadence as the
        per-epoch driver."""
        datasetdir = str(tmp_path / "data")
        outdir = str(tmp_path / "out")
        os.makedirs(outdir)
        make_synthetic_cohort(datasetdir, n_subjects=48, n_scores=3,
                              n_rois=8, missing_rate=0.0, seed=4)
        run = train_exp(
            dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
            input_dims=[3, 8], latent_dim=4, style_dim=[2, 2],
            num_epochs=6, batch_size=16, method="joint_elbo",
            learning_rate=0.01, use_tensorboard=False,
            calc_nll=True, eval_freq=3, epoch_chunk=10)
        df = pd.read_csv(os.path.join(outdir, run, "logs", "metrics.csv"))
        lh = df[df.phase == "Likelihoods"]
        # two NLL evaluations: after epoch 3 and after epoch 6
        assert len(lh) > 0
        assert lh["step"].nunique() == 2
