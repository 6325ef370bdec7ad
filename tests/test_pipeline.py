"""Pipeline parallelism (`parallel/pipeline.py`): GPipe schedule correctness.

The reference has no pipeline parallelism (single device,
``workflow.py:123-124``); these tests pin the net-new capability: the
microbatch schedule must be *exactly* the sequential composition of the
stages — forward activations, gradients, and whole training trajectories —
on real multi-device meshes (8 virtual CPU devices, conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multivae_tpu.parallel.pipeline import (
    init_pipelined_mlp,
    make_pipelined_train_step,
    mlp_stage,
    pipe_mesh,
    pipeline_apply,
    sequential_mlp_loss,
    stack_stages,
)


def _stages(key, n_stages, d):
    ks = jax.random.split(key, n_stages)
    return [{"w": jax.random.normal(k, (d, d)) / np.sqrt(d),
             "b": 0.1 * jax.random.normal(jax.random.fold_in(k, 7), (d,))}
            for k in ks]


def _sequential(stages, x):
    h = x
    for p in stages:
        h = mlp_stage(p, h)
    return h


class TestPipelineApply:
    @pytest.mark.parametrize("n_stages,n_micro", [
        (2, 1), (2, 4), (4, 2), (4, 8), (8, 4), (1, 3),
    ])
    def test_matches_sequential_forward(self, n_stages, n_micro):
        key = jax.random.PRNGKey(n_stages * 10 + n_micro)
        d, batch = 16, n_micro * 3
        stages = _stages(key, n_stages, d)
        x = jax.random.normal(jax.random.fold_in(key, 1), (batch, d))
        mesh = pipe_mesh(n_stages)
        got = pipeline_apply(mlp_stage, stack_stages(stages), x,
                             n_micro=n_micro, mesh=mesh)
        want = _sequential(stages, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_batch_not_divisible_raises(self):
        stages = _stages(jax.random.PRNGKey(0), 2, 8)
        x = jnp.ones((7, 8))
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_apply(mlp_stage, stack_stages(stages), x,
                           n_micro=2, mesh=pipe_mesh(2))

    def test_too_few_devices_raises(self):
        with pytest.raises(ValueError, match="needs"):
            pipe_mesh(99)

    def test_gradients_match_sequential(self):
        """The reverse pipeline computes the exact sequential gradient."""
        key = jax.random.PRNGKey(3)
        n_stages, d, batch = 4, 12, 20
        stages = _stages(key, n_stages, d)
        stacked = stack_stages(stages)
        x = jax.random.normal(jax.random.fold_in(key, 1), (batch, d))
        tgt = jax.random.normal(jax.random.fold_in(key, 2), (batch, d))
        mesh = pipe_mesh(n_stages)

        def pipe_loss(p):
            y = pipeline_apply(mlp_stage, p, x, n_micro=5, mesh=mesh)
            return jnp.mean((y - tgt) ** 2)

        def seq_loss(p):
            h, _ = jax.lax.scan(lambda c, s: (mlp_stage(s, c), None), x, p)
            return jnp.mean((h - tgt) ** 2)

        gp = jax.grad(pipe_loss)(stacked)
        gs = jax.grad(seq_loss)(stacked)
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestPipelinedTraining:
    def test_training_trajectory_matches_sequential(self):
        """Pipelined SGD == sequential SGD, step for step."""
        key = jax.random.PRNGKey(11)
        in_dim, hidden, out_dim, n_layers = 5, 16, 3, 4
        params = init_pipelined_mlp(key, in_dim, hidden, out_dim, n_layers)
        x = jax.random.normal(jax.random.fold_in(key, 1), (24, in_dim))
        w_true = jax.random.normal(jax.random.fold_in(key, 2),
                                   (in_dim, out_dim))
        y = x @ w_true
        mesh = pipe_mesh(n_layers)
        step = make_pipelined_train_step(mesh, n_micro=4, lr=1e-2)

        seq_params = params
        lr = 1e-2

        @jax.jit
        def seq_step(p, x, y):
            loss, g = jax.value_and_grad(sequential_mlp_loss)(p, x, y)
            return jax.tree_util.tree_map(lambda a, b: a - lr * b, p, g), loss

        losses, seq_losses = [], []
        for _ in range(5):
            params, lo = step(params, x, y)
            seq_params, ls = seq_step(seq_params, x, y)
            losses.append(float(lo))
            seq_losses.append(float(ls))
        np.testing.assert_allclose(losses, seq_losses, rtol=1e-5)
        assert losses[-1] < losses[0], "pipelined training must converge"
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(seq_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_padded_first_layer_rows_stay_zero(self):
        """Input zero-padding is exact: padded kernel rows get zero grad."""
        key = jax.random.PRNGKey(5)
        in_dim, hidden = 4, 12
        params = init_pipelined_mlp(key, in_dim, hidden, 2, n_layers=2)
        x = jax.random.normal(jax.random.fold_in(key, 1), (8, in_dim))
        y = jnp.ones((8, 2))
        mesh = pipe_mesh(2)
        step = make_pipelined_train_step(mesh, n_micro=2)
        params, _ = step(params, x, y)
        w0 = np.asarray(params["stack"]["w"][0])
        np.testing.assert_array_equal(w0[in_dim:], 0.0)

    def test_stochastic_stage_with_coords_matches_sequential(self):
        """with_coords=True: a dropout-bearing stage folds (stage, micro)
        into its rng and the pipeline reproduces the sequential reference
        bit for bit."""
        key = jax.random.PRNGKey(9)
        n_stages, d, mb, n_micro = 4, 10, 6, 3
        stages = _stages(key, n_stages, d)
        x = jax.random.normal(jax.random.fold_in(key, 1),
                              (mb * n_micro, d))
        base = jax.random.PRNGKey(123)
        rate = 0.5

        def drop_stage(p, h, stage, micro):
            h = mlp_stage(p, h)
            k = jax.random.fold_in(jax.random.fold_in(base, stage), micro)
            keep = jax.random.bernoulli(k, 1.0 - rate, h.shape)
            return jnp.where(keep, h / (1.0 - rate), 0.0)

        mesh = pipe_mesh(n_stages)
        got = pipeline_apply(drop_stage, stack_stages(stages), x,
                             n_micro=n_micro, mesh=mesh, with_coords=True)

        # sequential reference: same (stage, micro) rng folds
        chunks = []
        for m in range(n_micro):
            h = x[m * mb:(m + 1) * mb]
            for s, p in enumerate(stages):
                h = drop_stage(p, h, jnp.asarray(s), jnp.asarray(m))
            chunks.append(h)
        want = jnp.concatenate(chunks)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_compiled_program_contains_collective_permute(self):
        """The schedule really is SPMD pipelining over ICI, not a rerun of
        every stage on every device: the lowered HLO must carry the
        collective-permute hops."""
        key = jax.random.PRNGKey(0)
        stages = stack_stages(_stages(key, 4, 8))
        x = jnp.ones((8, 8))
        mesh = pipe_mesh(4)
        fn = jax.jit(lambda p, x: pipeline_apply(
            mlp_stage, p, x, n_micro=2, mesh=mesh))
        hlo = fn.lower(stages, x).compile().as_text()
        assert "collective-permute" in hlo
