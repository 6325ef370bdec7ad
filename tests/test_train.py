"""Training-layer tests: loss composition per method, optimization smoke
tests, data-parallel sharding equivalence, ensemble vmap."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multivae_tpu.models import build_model, make_modalities
from multivae_tpu.train import Config
from multivae_tpu.train.losses import total_loss
from multivae_tpu.train.train_step import (
    init_train_state,
    make_ensemble_train_step,
    make_eval_step,
    make_train_step,
)

B = 32


def make_cfg(method="joint_elbo", **kw):
    kw.setdefault("input_dim", [7, 20])
    kw.setdefault("style_dim", [3, 4])
    kw.setdefault("beta", 1.0)
    kw.setdefault("initial_learning_rate", 1e-2)
    cfg = Config(method=method, class_dim=5, hidden_dim=32,
                 num_hidden_layer_encoder=1, num_hidden_layer_decoder=0,
                 **kw)
    return cfg.derive()


def correlated_batch(cfg, b=B, seed=0):
    """Two blocks driven by a shared latent factor."""
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(b, 3)).astype(np.float32)
    w1 = rng.normal(size=(3, cfg.input_dim[0])).astype(np.float32)
    w2 = rng.normal(size=(3, cfg.input_dim[1])).astype(np.float32)
    x1 = z @ w1 + 0.1 * rng.normal(size=(b, cfg.input_dim[0])).astype(np.float32)
    x2 = z @ w2 + 0.1 * rng.normal(size=(b, cfg.input_dim[1])).astype(np.float32)
    return {"clinical": jnp.asarray(x1), "rois": jnp.asarray(x2)}


def setup(cfg, batch, seed=0):
    model = build_model(cfg, make_modalities(cfg.input_dim, cfg.style_dim,
                                             cfg.likelihood))
    params, opt_state = init_train_state(cfg, model, batch, seed=seed)
    return model, params, opt_state


class TestLossComposition:
    @pytest.mark.parametrize("method", ["moe", "jsd", "joint_elbo"])
    def test_mixture_methods_formula(self, method):
        cfg = make_cfg(method, beta=2.0, beta_style=1.5, beta_content=0.5)
        batch = correlated_batch(cfg)
        model, params, _ = setup(cfg, batch)
        variables = {"params": params}
        out = model.apply(variables, batch,
                          rngs={"sample": jax.random.PRNGKey(0)})
        loss, m = total_loss(cfg, model, variables, batch, out,
                             jax.random.PRNGKey(1))
        rec = m["log_prob/clinical"] + m["log_prob/rois"]
        kld_style = cfg.beta_style * (m["kld_style/clinical_style"]
                                      + m["kld_style/rois_style"])
        want = rec + cfg.beta * (cfg.beta_style * kld_style
                                 + cfg.beta_content * m["joint_divergence"])
        np.testing.assert_allclose(loss, want, rtol=1e-5)

    def test_poe_includes_unimodal_elbos(self):
        cfg = make_cfg("poe", beta=2.0, beta_style=1.5, beta_content=0.5)
        batch = correlated_batch(cfg)
        model, params, _ = setup(cfg, batch)
        variables = {"params": params}
        out = model.apply(variables, batch,
                          rngs={"sample": jax.random.PRNGKey(0)})
        loss, m = total_loss(cfg, model, variables, batch, out,
                             jax.random.PRNGKey(1))
        # joint part
        w_style = cfg.beta_style * (m["kld_style/clinical_style"]
                                    + m["kld_style/rois_style"])
        joint = (m["log_prob/clinical"] + m["log_prob/rois"]
                 + cfg.beta * (cfg.beta_content * m["joint_divergence"]
                               + cfg.beta_style * w_style))
        # unimodal parts
        unis = 0.0
        for mod in ("clinical", "rois"):
            div = (cfg.beta_content * m[f"kld/{mod}"]
                   + cfg.beta_style * cfg.beta_style
                   * m[f"kld_style/{mod}_style"])
            unis = unis + m[f"log_prob_uni/{mod}"] + cfg.beta * div
        np.testing.assert_allclose(loss, joint + unis, rtol=1e-5)

    @pytest.mark.parametrize("method", ["poe", "joint_elbo"])
    def test_loss_invariant_across_jit_boundary(self, method):
        """A jit boundary canonicalizes pytree dict key order (sorted), so
        the model output's ``subsets`` dict no longer carries the
        ``subset_stack`` row order. total_loss must not depend on dict
        iteration order — it recovers the pairing from ``model.subsets``
        (regression: poe's unimodal kld terms were silently mispaired)."""
        cfg = make_cfg(method, beta=2.0, beta_style=1.5, beta_content=0.5)
        batch = correlated_batch(cfg)
        model, params, _ = setup(cfg, batch)
        variables = {"params": params}
        noise = jnp.zeros((B, model.noise_width(batch)), jnp.float32)
        nu = None
        if method == "poe":
            nu = {n: jnp.zeros((B, model.noise_width({n: None})),
                               jnp.float32)
                  for n in ("clinical", "rois")}
        out_e = model.apply(variables, batch, noise=noise)
        out_j = jax.jit(lambda p: model.apply({"params": p}, batch,
                                              noise=noise))(params)
        loss_e, m_e = total_loss(cfg, model, variables, batch, out_e, None,
                                 noise_uni=nu)
        loss_j, m_j = total_loss(cfg, model, variables, batch, out_j, None,
                                 noise_uni=nu)
        np.testing.assert_allclose(float(loss_j), float(loss_e), rtol=1e-6)
        for k in m_e:
            np.testing.assert_allclose(float(m_j[k]), float(m_e[k]),
                                       rtol=1e-6, err_msg=k)

    def test_unfactorized_has_no_style_terms(self):
        cfg = make_cfg("joint_elbo", factorized_representation=False)
        batch = correlated_batch(cfg)
        model, params, _ = setup(cfg, batch)
        variables = {"params": params}
        out = model.apply(variables, batch,
                          rngs={"sample": jax.random.PRNGKey(0)})
        loss, m = total_loss(cfg, model, variables, batch, out,
                             jax.random.PRNGKey(1))
        assert not any(k.startswith("kld_style") for k in m)
        want = (m["log_prob/clinical"] + m["log_prob/rois"]
                + cfg.beta * cfg.beta_content * m["joint_divergence"])
        np.testing.assert_allclose(loss, want, rtol=1e-5)


class TestOptimization:
    @pytest.mark.parametrize("method", [
        "poe", "joint_elbo",
        # moe/jsd share the mixture-loss plumbing checked exactly by
        # TestLossComposition; their 60-step runs stay in the slow suite
        pytest.param("moe", marks=pytest.mark.slow),
        pytest.param("jsd", marks=pytest.mark.slow),
    ])
    def test_loss_decreases(self, method):
        cfg = make_cfg(method)
        batch = correlated_batch(cfg)
        model, params, opt_state = setup(cfg, batch)
        step = make_train_step(cfg, model, donate=False)
        rng = jax.random.PRNGKey(0)
        losses = []
        for i in range(60):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss, _ = step(params, opt_state, batch, sub)
            losses.append(float(loss))
        assert np.mean(losses[-10:]) < np.mean(losses[:10]), method

    def test_missing_modality_batches_train(self):
        cfg = make_cfg("joint_elbo")
        full = correlated_batch(cfg)
        model, params, opt_state = setup(cfg, full)
        step = make_train_step(cfg, model, donate=False)
        rng = jax.random.PRNGKey(0)
        # alternate complete and clinical-only batches, as the reference
        # sampler yields subset-homogeneous batches
        for i in range(10):
            rng, sub = jax.random.split(rng)
            batch = full if i % 2 == 0 else {"clinical": full["clinical"]}
            params, opt_state, loss, _ = step(params, opt_state, batch, sub)
        assert np.isfinite(float(loss))

    def test_fixed_scale_param_not_updated(self):
        cfg = make_cfg("joint_elbo", learn_output_scale=False)
        batch = correlated_batch(cfg)
        model, params, opt_state = setup(cfg, batch)
        step = make_train_step(cfg, model, donate=False)
        before = np.asarray(params["dec_clinical"]["out_logvar"]).copy()
        params, _, _, _ = step(params, opt_state, batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(params["dec_clinical"]["out_logvar"],
                                   before)

    def test_learned_scale_param_updated(self):
        cfg = make_cfg("joint_elbo", learn_output_scale=True)
        batch = correlated_batch(cfg)
        model, params, opt_state = setup(cfg, batch)
        step = make_train_step(cfg, model, donate=False)
        before = np.asarray(params["dec_clinical"]["out_logvar"]).copy()
        params, _, _, _ = step(params, opt_state, batch, jax.random.PRNGKey(0))
        assert np.abs(np.asarray(params["dec_clinical"]["out_logvar"])
                      - before).max() > 0


class TestEvalStep:
    def test_eval_matches_loss(self):
        cfg = make_cfg("joint_elbo")
        batch = correlated_batch(cfg)
        model, params, _ = setup(cfg, batch)
        eval_step = make_eval_step(cfg, model)
        loss, metrics = eval_step(params, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        assert "kld/clinical_rois" in metrics


class TestDataParallel:
    def test_sharded_step_matches_single_device(self):
        cfg = make_cfg("joint_elbo", dropout_rate=0.0)
        batch = correlated_batch(cfg)
        model, params, opt_state = setup(cfg, batch)
        mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
        step_sharded = make_train_step(cfg, model, mesh=mesh, donate=False)
        step_plain = make_train_step(cfg, model, donate=False)
        rng = jax.random.PRNGKey(0)
        p1, _, l1, _ = step_plain(params, opt_state, batch, rng)
        p2, _, l2, _ = step_sharded(params, opt_state, batch, rng)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
        a = jax.tree_util.tree_leaves(p1)[0]
        b = jax.tree_util.tree_leaves(p2)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


class TestTensorParallel:
    """GSPMD tensor parallelism (new capability; the reference is
    single-device). Params shard over the hidden dimension on a
    ``("data", "tensor")`` mesh; XLA inserts the collectives."""

    pytestmark = pytest.mark.driver  # mesh-composition contract

    def test_tp_train_exp_end_to_end(self, tmp_path):
        """The product surface: train --tensor-parallel 4 --data-parallel 2
        trains (decreasing loss) with missing-modality remainder batches
        and writes the final checkpoint."""
        import os

        import pandas as pd

        from multivae_tpu.data import make_synthetic_cohort
        from multivae_tpu.workflows import train_exp

        datasetdir = str(tmp_path / "data")
        make_synthetic_cohort(datasetdir, n_subjects=64, n_scores=4,
                              n_rois=16, missing_rate=0.2, seed=5)
        outdir = str(tmp_path / "out")
        os.makedirs(outdir)
        run = train_exp(
            dataset="synthetic", datasetdir=datasetdir, outdir=outdir,
            input_dims=[4, 16], latent_dim=4, style_dim=[2, 3],
            num_epochs=4, batch_size=16, method="joint_elbo",
            learning_rate=0.01, use_tensorboard=False,
            tensor_parallel=4, data_parallel=2)
        d = pd.read_csv(os.path.join(outdir, run, "logs", "metrics.csv"))
        loss = d[(d.phase == "train") & (d.metric == "loss")]["value"]
        assert loss.iloc[-1] < loss.iloc[0]
        assert os.path.exists(os.path.join(
            outdir, run, "checkpoints", "0003", "model"))

    @pytest.mark.parametrize("method", ["joint_elbo", "poe"])
    def test_tp_step_matches_single_device(self, method):
        """poe exercises the unimodal-ELBO re-runs under the sharding."""
        from multivae_tpu.parallel import tp_mesh
        from multivae_tpu.train.train_step import make_tp_train_step

        cfg = make_cfg(method, dropout_rate=0.0)
        batch = correlated_batch(cfg)
        model, params, opt_state = setup(cfg, batch)
        mesh = tp_mesh(4, n_data=2)
        tp_step = make_tp_train_step(cfg, model, mesh, donate=False)
        ref_step = make_train_step(cfg, model, donate=False)
        rng = jax.random.PRNGKey(0)
        p1, _, l1, _ = tp_step(params, opt_state, batch, rng)
        p2, _, l2, _ = ref_step(params, opt_state, batch, rng)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    def test_tp_params_actually_sharded(self):
        """The hidden-dim kernels/biases must land on the 'tensor' axis —
        this pins that TP is real sharding, not silent replication."""
        from multivae_tpu.parallel import tp_mesh, tp_param_spec
        from multivae_tpu.train.train_step import make_tp_train_step

        cfg = make_cfg("joint_elbo", dropout_rate=0.0)
        batch = correlated_batch(cfg)
        model, params, opt_state = setup(cfg, batch)
        mesh = tp_mesh(4, n_data=2)
        tp_step = make_tp_train_step(cfg, model, mesh, donate=False)
        p1, _, _, _ = tp_step(params, opt_state, batch,
                              jax.random.PRNGKey(0))
        flat = jax.tree_util.tree_leaves_with_path(p1)
        n_tensor = 0
        for path, leaf in flat:
            spec = tp_param_spec(leaf.shape, cfg.hidden_dim)
            assert leaf.sharding.spec == spec, (path, leaf.sharding.spec)
            n_tensor += "tensor" in str(spec)
        assert n_tensor >= 6  # trunk kernels+biases and head kernels

    def test_tp_scan_matches_stepwise(self):
        from multivae_tpu.parallel import tp_mesh
        from multivae_tpu.train.train_step import (
            make_tp_scan_train_step, make_tp_train_step)

        cfg = make_cfg("joint_elbo", dropout_rate=0.0)
        batch = correlated_batch(cfg)
        model, params, opt_state = setup(cfg, batch)
        mesh = tp_mesh(2, n_data=4)
        n = 3
        batches = {k: jnp.stack([v] * n) for k, v in batch.items()}
        rngs = jax.random.split(jax.random.PRNGKey(1), n)
        scan = make_tp_scan_train_step(cfg, model, mesh, donate=False)
        ps, os_, losses, _ = scan(params, opt_state, batches, rngs)
        step = make_tp_train_step(cfg, model, mesh, donate=False)
        p, o = params, opt_state
        for i in range(n):
            p, o, loss, _ = step(p, o, batch, rngs[i])
            np.testing.assert_allclose(float(losses[i]), float(loss),
                                       rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ps),
                        jax.tree_util.tree_leaves(p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    def test_hidden_must_divide_tensor_axis(self):
        from multivae_tpu.parallel import tp_mesh
        from multivae_tpu.train.train_step import make_tp_train_step

        cfg = Config(method="joint_elbo", input_dim=[7, 20], class_dim=5,
                     style_dim=[3, 4], hidden_dim=30,
                     num_hidden_layer_encoder=1,
                     num_hidden_layer_decoder=0).derive()
        model = build_model(cfg, make_modalities(
            cfg.input_dim, cfg.style_dim, cfg.likelihood))
        mesh = tp_mesh(4, n_data=2)
        with pytest.raises(ValueError, match="must divide"):
            make_tp_train_step(cfg, model, mesh, donate=False)


class TestEnsemble:
    def test_vmapped_ensemble_matches_sequential(self):
        cfg = make_cfg("joint_elbo", num_models=2)
        batch0 = correlated_batch(cfg, seed=0)
        batch1 = correlated_batch(cfg, seed=1)
        model, params0, opt0 = setup(cfg, batch0, seed=0)
        _, params1, opt1 = setup(cfg, batch1, seed=1)
        stack = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.stack([x, y]), a, b)
        params = stack(params0, params1)
        opt_state = stack(opt0, opt1)
        batches = stack(batch0, batch1)
        rngs = jnp.stack([jax.random.PRNGKey(5), jax.random.PRNGKey(6)])

        ens_step = make_ensemble_train_step(cfg, model)
        new_params, _, losses, _ = ens_step(params, opt_state, batches, rngs)

        step = make_train_step(cfg, model, donate=False)
        _, _, l0, _ = step(params0, opt0, batch0, jax.random.PRNGKey(5))
        _, _, l1, _ = step(params1, opt1, batch1, jax.random.PRNGKey(6))
        np.testing.assert_allclose(np.asarray(losses),
                                   [float(l0), float(l1)], rtol=1e-4)

    def test_ensemble_scan_matches_stepwise(self):
        """The scanned+vmapped epoch step advances every member exactly as
        repeated single ensemble steps do."""
        from multivae_tpu.train.train_step import (
            make_ensemble_scan_train_step, stack_trees)

        cfg = make_cfg("joint_elbo", num_models=2)
        n_steps = 3
        batches = [[correlated_batch(cfg, seed=10 * m + s)
                    for s in range(n_steps)] for m in range(2)]
        model, params0, opt0 = setup(cfg, batches[0][0], seed=0)
        _, params1, opt1 = setup(cfg, batches[1][0], seed=1)
        params = stack_trees([params0, params1])
        opt_state = stack_trees([opt0, opt1])
        grid = {k: jnp.stack([jnp.stack([batches[m][s][k]
                                         for s in range(n_steps)])
                              for m in range(2)])
                for k in batches[0][0]}
        rngs = jnp.stack([jnp.stack([jax.random.PRNGKey(100 * m + s)
                                     for s in range(n_steps)])
                          for m in range(2)])

        scan_fn = make_ensemble_scan_train_step(cfg, model)
        new_params, _, losses, metrics = scan_fn(params, opt_state, grid,
                                                 rngs)
        assert losses.shape == (2, n_steps)
        assert metrics["loss"].shape == (2, n_steps)
        assert "joint_divergence" in metrics

        step = make_train_step(cfg, model, donate=False)
        for m, (p, o) in enumerate(((params0, opt0), (params1, opt1))):
            for s in range(n_steps):
                p, o, loss, _ = step(p, o, batches[m][s],
                                     jax.random.PRNGKey(100 * m + s))
                np.testing.assert_allclose(float(losses[m, s]), float(loss),
                                           rtol=1e-4)
            for a, b in zip(jax.tree_util.tree_leaves(new_params),
                            jax.tree_util.tree_leaves(p)):
                np.testing.assert_allclose(np.asarray(a)[m], np.asarray(b),
                                           rtol=2e-4, atol=1e-5)

    def test_ensemble_scan_sharded_over_mesh(self):
        """Same scan over a (model, data) mesh: members shard over devices."""
        from multivae_tpu.parallel import make_mesh
        from multivae_tpu.train.train_step import (
            make_ensemble_scan_train_step, stack_trees)

        cfg = make_cfg("joint_elbo", num_models=2)
        n_steps = 2
        mesh = make_mesh(n_model=2, n_data=4)
        batches = [[correlated_batch(cfg, seed=10 * m + s)
                    for s in range(n_steps)] for m in range(2)]
        model, params0, opt0 = setup(cfg, batches[0][0], seed=0)
        _, params1, opt1 = setup(cfg, batches[1][0], seed=1)
        params = stack_trees([params0, params1])
        opt_state = stack_trees([opt0, opt1])
        grid = {k: jnp.stack([jnp.stack([batches[m][s][k]
                                         for s in range(n_steps)])
                              for m in range(2)])
                for k in batches[0][0]}
        rngs = jnp.stack([jnp.stack([jax.random.PRNGKey(100 * m + s)
                                     for s in range(n_steps)])
                          for m in range(2)])

        plain = make_ensemble_scan_train_step(cfg, model)
        sharded = make_ensemble_scan_train_step(cfg, model, mesh=mesh)
        p1, _, l1, _ = plain(params, opt_state, grid, rngs)
        # the first call donated its params/opt buffers; restack fresh ones
        params = stack_trees([params0, params1])
        opt_state = stack_trees([opt0, opt1])
        p2, _, l2, _ = sharded(params, opt_state, grid, rngs)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)


class TestResolveEnsemble:
    """The ensemble_parallel auto policy (trainer.resolve_ensemble)."""

    def _model(self, cfg):
        return build_model(cfg, make_modalities(cfg.input_dim, cfg.style_dim,
                                                cfg.likelihood))

    def test_forced_values(self):
        from multivae_tpu.train.trainer import resolve_ensemble
        cfg = make_cfg("joint_elbo", num_models=2, ensemble_parallel=True)
        assert resolve_ensemble(cfg, self._model(cfg)) is True
        cfg = make_cfg("joint_elbo", num_models=2, ensemble_parallel=False)
        assert resolve_ensemble(cfg, self._model(cfg)) is False
        cfg = make_cfg("joint_elbo", num_models=1, ensemble_parallel=True)
        assert resolve_ensemble(cfg, self._model(cfg)) is False

    def test_auto_uses_mesh_when_divisible(self):
        from multivae_tpu.train.trainer import ensemble_mesh, resolve_ensemble
        # 8 virtual devices; 2 members -> 2x4 mesh exists -> parallel
        cfg = make_cfg("joint_elbo", num_models=2, ensemble_parallel="auto")
        assert ensemble_mesh(cfg) is not None
        assert resolve_ensemble(cfg, self._model(cfg)) is True

    def test_auto_prefers_fused_when_no_mesh(self):
        from multivae_tpu.train.trainer import ensemble_mesh, resolve_ensemble
        # 3 members on 8 devices: no mesh; the flagship fused config should
        # stay on the (faster per-member) sequential fused path — measured
        # basis: 18.7k member-steps/s sequential-fused vs 319 vmapped-
        # general on one v5e chip, 58.6x (BASELINE.md round-3 table)
        cfg = make_cfg("joint_elbo", num_models=3, ensemble_parallel="auto")
        assert ensemble_mesh(cfg) is None
        assert resolve_ensemble(cfg, self._model(cfg)) is False
        # dropout now rides the method kernel (fused) -> still sequential;
        # per-sample-scale + dropout rides the generic kernel -> ditto
        for extra in ({"dropout_rate": 0.3},
                      {"dropout_rate": 0.3,
                       "learn_output_sample_scale": True}):
            cfg = make_cfg("joint_elbo", num_models=3,
                           ensemble_parallel="auto", **extra)
            assert resolve_ensemble(cfg, self._model(cfg)) is False
        # ...but a config NO kernel covers (params overflow the VMEM
        # budget: a very wide block) goes parallel
        cfg = make_cfg("joint_elbo", num_models=3, ensemble_parallel="auto",
                       input_dim=[7, 60000], dropout_rate=0.3)
        assert resolve_ensemble(cfg, self._model(cfg)) is True


class TestMetricLogger:
    def test_resumes_step_axis_from_existing_csv(self, tmp_path):
        """Resumed sessions must continue the step axis, not restart at 0
        (a fresh counter interleaves resumed rows below the old ones in
        the CSV/tensorboard)."""
        from multivae_tpu.train.logging import MetricLogger

        lg = MetricLogger(str(tmp_path), use_tensorboard=False)
        assert lg.step == 0
        for _ in range(3):
            lg.write_training_logs({"loss": 1.0})
        lg.close()

        lg2 = MetricLogger(str(tmp_path), use_tensorboard=False)
        assert lg2.step == 3
        lg2.write_testing_logs({"loss": 2.0})
        lg2.close()

        import pandas as pd
        m = pd.read_csv(tmp_path / "metrics.csv")
        assert list(m["step"]) == [0, 1, 2, 3]

    def test_header_only_csv_starts_at_zero(self, tmp_path):
        from multivae_tpu.train.logging import MetricLogger

        lg = MetricLogger(str(tmp_path), use_tensorboard=False)
        lg.close()  # header row only, no data
        lg2 = MetricLogger(str(tmp_path), use_tensorboard=False)
        assert lg2.step == 0
        lg2.close()

    def test_resume_ignores_torn_final_line(self, tmp_path):
        """A session killed mid-write leaves a torn final CSV line; '12'
        of step '123' still parses as an int, which would make the resumed
        session reuse step numbers. Only a newline-terminated 4-field line
        counts; otherwise fall back to the previous complete one."""
        from multivae_tpu.train.logging import MetricLogger

        lg = MetricLogger(str(tmp_path), use_tensorboard=False)
        for _ in range(3):
            lg.write_training_logs({"loss": 1.0})
        lg.close()
        for torn in (b"12", b"12,tra", b"12,train,loss"):
            with open(tmp_path / "metrics.csv", "rb") as f:
                intact = f.read()
            with open(tmp_path / "metrics.csv", "ab") as f:
                f.write(torn)  # no trailing newline: torn write
            lg2 = MetricLogger(str(tmp_path), use_tensorboard=False)
            assert lg2.step == 3, torn
            lg2.close()
            with open(tmp_path / "metrics.csv", "wb") as f:
                f.write(intact)

    def test_resume_ignores_complete_but_short_line(self, tmp_path):
        """A torn line that DID get its newline flushed (killed between
        the two writes) must also be rejected when it has too few fields."""
        from multivae_tpu.train.logging import MetricLogger

        lg = MetricLogger(str(tmp_path), use_tensorboard=False)
        for _ in range(2):
            lg.write_training_logs({"loss": 1.0})
        lg.close()
        with open(tmp_path / "metrics.csv", "ab") as f:
            f.write(b"99,train\n")
        lg2 = MetricLogger(str(tmp_path), use_tensorboard=False)
        assert lg2.step == 2
        lg2.close()
