"""M=4 modality property sweep: the masked-subset fusion redesign claims
M=2..~10 (SURVEY §7); tests elsewhere stop at 3 modalities. Here the full
4-modality powerset (15 non-empty subsets) is fuzzed across methods ×
presence patterns on the general path, pinned against per-subset brute
force — the reference's Python powerset loop semantics
(``BaseMMVae.py:190-216``, ``utils/utils.py:63-85``).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multivae_tpu.models import build_model, make_modalities
from multivae_tpu.ops.fusion import masked_poe_all_subsets, poe
from multivae_tpu.train.config import Config
from multivae_tpu.train.train_step import init_train_state, make_train_step

NAMES = ("a", "b", "c", "d")
DIMS = (4, 8, 6, 5)
B = 12

PRESENCE_PATTERNS = [
    ("a", "b", "c", "d"),
    ("a", "b", "c"),
    ("b", "d"),
    ("a", "d"),
    ("c",),
]


def cfg4(method, **kw):
    kw.setdefault("style_dim", [2, 2, 2, 2])
    return Config(method=method, input_dim=list(DIMS), class_dim=5,
                  hidden_dim=16, num_hidden_layer_encoder=1,
                  num_hidden_layer_decoder=0, **kw).derive()


def model4(cfg):
    return build_model(cfg, make_modalities(cfg.input_dim, cfg.style_dim,
                                            cfg.likelihood, names=NAMES))


def full_batch(cfg, seed=0, b=B):
    rng = np.random.default_rng(seed)
    return {n: jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
            for n, d in zip(NAMES, cfg.input_dim)}


def init_vars(model, batch):
    return model.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)}, batch)


def powerset(names):
    for r in range(1, len(names) + 1):
        yield from itertools.combinations(names, r)


class TestMaskedFusionBruteForce:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_static_unroll_matches_per_subset_poe(self, seed):
        """All 15 subsets of 4 experts through one masked fusion equal 15
        independent ``poe`` products (with and without the prior row)."""
        rng = np.random.default_rng(seed)
        mus = jnp.asarray(rng.normal(size=(4, B, 5)).astype(np.float32))
        lvs = jnp.asarray(
            rng.normal(scale=0.7, size=(4, B, 5)).astype(np.float32))
        subsets = list(powerset(range(4)))
        mask = np.zeros((len(subsets), 4), np.float32)
        prior = np.zeros(len(subsets), np.float32)
        for s, mods in enumerate(subsets):
            mask[s, list(mods)] = 1.0
            prior[s] = float(s % 2)  # alternate prior-expert rows
        got_mu, got_lv = masked_poe_all_subsets(mus, lvs, mask, prior)
        assert got_mu.shape == (15, B, 5)
        for s, mods in enumerate(subsets):
            sel_mu = jnp.stack([mus[m] for m in mods])
            sel_lv = jnp.stack([lvs[m] for m in mods])
            if prior[s]:
                sel_mu = jnp.concatenate([sel_mu, jnp.zeros_like(sel_mu[:1])])
                sel_lv = jnp.concatenate([sel_lv, jnp.zeros_like(sel_lv[:1])])
            want_mu, want_lv = poe(sel_mu, sel_lv)
            np.testing.assert_allclose(got_mu[s], want_mu, rtol=2e-5,
                                       atol=2e-6)
            np.testing.assert_allclose(got_lv[s], want_lv, rtol=2e-5,
                                       atol=2e-6)

    def test_dynamic_einsum_path_matches_static_unroll(self):
        """>16 subset rows route to the einsum path; it must agree with
        the unrolled path row-for-row (here: the 15 subsets duplicated to
        17 rows to cross the threshold)."""
        rng = np.random.default_rng(3)
        mus = jnp.asarray(rng.normal(size=(4, B, 5)).astype(np.float32))
        lvs = jnp.asarray(
            rng.normal(scale=0.7, size=(4, B, 5)).astype(np.float32))
        subsets = list(powerset(range(4)))
        mask = np.zeros((15, 4), np.float32)
        prior = np.zeros(15, np.float32)
        for s, mods in enumerate(subsets):
            mask[s, list(mods)] = 1.0
            prior[s] = float(s % 2)
        big_mask = np.concatenate([mask, mask[:2]])
        big_prior = np.concatenate([prior, prior[:2]])
        stat_mu, stat_lv = masked_poe_all_subsets(mus, lvs, mask, prior)
        dyn_mu, dyn_lv = masked_poe_all_subsets(
            mus, lvs, jnp.asarray(big_mask), jnp.asarray(big_prior))
        np.testing.assert_allclose(dyn_mu[:15], stat_mu, rtol=2e-5,
                                   atol=2e-6)
        np.testing.assert_allclose(dyn_lv[:15], stat_lv, rtol=2e-5,
                                   atol=2e-6)

    def test_zeroed_column_is_missing_expert(self):
        """Masking a column out equals fusing the smaller expert set —
        the presence-masking semantics the missing-modality path relies
        on (zero precision == infinite variance)."""
        rng = np.random.default_rng(4)
        mus = jnp.asarray(rng.normal(size=(4, B, 5)).astype(np.float32))
        lvs = jnp.asarray(
            rng.normal(scale=0.7, size=(4, B, 5)).astype(np.float32))
        mask = np.ones((1, 4), np.float32)
        mask[0, 2] = 0.0
        got_mu, got_lv = masked_poe_all_subsets(
            mus, lvs, mask, np.zeros(1, np.float32))
        want_mu, want_lv = poe(jnp.stack([mus[0], mus[1], mus[3]]),
                               jnp.stack([lvs[0], lvs[1], lvs[3]]))
        np.testing.assert_allclose(got_mu[0], want_mu, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(got_lv[0], want_lv, rtol=2e-5, atol=2e-6)


class TestModelSubsetsBruteForce:
    @pytest.mark.parametrize("method", ["poe", "joint_elbo"])
    @pytest.mark.parametrize("present", PRESENCE_PATTERNS,
                             ids=["".join(p) for p in PRESENCE_PATTERNS])
    def test_poe_family_subsets(self, method, present):
        """Every available subset's posterior equals the brute-force PoE
        of its experts' raw encoder outputs, under the reference's
        prior-expert convention (``BaseMMVae.py:109-118``): poe appends
        the unit expert always, joint_elbo only for the full subset."""
        cfg = cfg4(method)
        model = model4(cfg)
        full = full_batch(cfg)
        variables = init_vars(model, full)
        batch = {k: full[k] for k in present}
        out = model.apply(variables, batch,
                          rngs={"sample": jax.random.PRNGKey(2)})
        enc = out["latents"]["modalities"]
        subsets = out["latents"]["subsets"]
        avail = {k for k in subsets}
        want_keys = {"_".join(s) for s in powerset(present)}
        assert avail == want_keys
        n_total = len(NAMES)
        for key, (got_mu, got_lv) in subsets.items():
            mods = key.split("_")
            sel_mu = jnp.stack([enc[m][0] for m in mods])
            sel_lv = jnp.stack([enc[m][1] for m in mods])
            if method == "poe" or len(mods) == n_total:
                sel_mu = jnp.concatenate(
                    [sel_mu, jnp.zeros_like(sel_mu[:1])])
                sel_lv = jnp.concatenate(
                    [sel_lv, jnp.zeros_like(sel_lv[:1])])
            want_mu, want_lv = poe(sel_mu, sel_lv)
            np.testing.assert_allclose(got_mu, want_mu, rtol=2e-5,
                                       atol=2e-6, err_msg=key)
            np.testing.assert_allclose(got_lv, want_lv, rtol=2e-5,
                                       atol=2e-6, err_msg=key)

    @pytest.mark.parametrize("method", ["moe", "jsd"])
    @pytest.mark.parametrize("present", PRESENCE_PATTERNS,
                             ids=["".join(p) for p in PRESENCE_PATTERNS])
    def test_mixture_family_subsets(self, method, present):
        """moe/jsd multi-expert subsets are the deterministic mixture
        partition (``utils/utils.py:63-85``): expert j contributes its
        partition slice of batch rows. Pinned against a numpy replay of
        the partition arithmetic."""
        from multivae_tpu.ops.fusion import mixture_partition

        cfg = cfg4(method)
        model = model4(cfg)
        full = full_batch(cfg)
        variables = init_vars(model, full)
        batch = {k: full[k] for k in present}
        out = model.apply(variables, batch,
                          rngs={"sample": jax.random.PRNGKey(2)})
        enc = out["latents"]["modalities"]
        for key, (got_mu, got_lv) in out["latents"]["subsets"].items():
            mods = key.split("_")
            if len(mods) == 1:
                np.testing.assert_allclose(got_mu, enc[mods[0]][0],
                                           rtol=1e-6, err_msg=key)
                continue
            owner = mixture_partition(len(mods), B)  # row -> component
            want_mu = np.zeros((B, cfg.class_dim), np.float32)
            want_lv = np.zeros((B, cfg.class_dim), np.float32)
            for j, m in enumerate(mods):
                rows = owner == j
                want_mu[rows] = np.asarray(enc[m][0])[rows]
                want_lv[rows] = np.asarray(enc[m][1])[rows]
            np.testing.assert_allclose(got_mu, want_mu, rtol=2e-5,
                                       atol=2e-6, err_msg=key)
            np.testing.assert_allclose(got_lv, want_lv, rtol=2e-5,
                                       atol=2e-6, err_msg=key)


class TestM4Training:
    @pytest.mark.parametrize("method", ["poe", "joint_elbo", "moe", "jsd"])
    def test_step_all_presence_patterns(self, method):
        """The general train path handles every presence pattern at M=4
        (finite loss, finite grads applied) — subset control flow stays
        trace-static per pattern."""
        cfg = cfg4(method)
        model = model4(cfg)
        full = full_batch(cfg)
        params, opt_state = init_train_state(cfg, model, full, seed=0)
        step = make_train_step(cfg, model, donate=False)
        rng = jax.random.PRNGKey(0)
        for present in PRESENCE_PATTERNS:
            rng, sub = jax.random.split(rng)
            batch = {k: full[k] for k in present}
            params, opt_state, loss, metrics = step(params, opt_state,
                                                    batch, sub)
            assert np.isfinite(float(loss)), (method, present)
        leaves = jax.tree_util.tree_leaves(params)
        assert all(np.all(np.isfinite(np.asarray(p))) for p in leaves)

    def test_loss_decreases_m4(self):
        cfg = cfg4("joint_elbo", initial_learning_rate=1e-2)
        model = model4(cfg)
        batch = full_batch(cfg)
        params, opt_state = init_train_state(cfg, model, batch, seed=0)
        step = make_train_step(cfg, model, donate=False)
        rng = jax.random.PRNGKey(0)
        losses = []
        for _ in range(40):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss, _ = step(params, opt_state, batch, sub)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_cond_generation_from_all_subsets(self):
        """train -> conditional generation loop at M=4: every one of the
        15 subset posteriors decodes into all 4 modalities (the DAA-style
        conditional-decode path, generalized past the 2-block cohort)."""
        cfg = cfg4("joint_elbo")
        model = model4(cfg)
        batch = full_batch(cfg)
        variables = init_vars(model, batch)
        out = model.apply(variables, batch,
                          rngs={"sample": jax.random.PRNGKey(2)})
        subsets = out["latents"]["subsets"]
        assert len(subsets) == 15
        gen = model.apply(variables, subsets,
                          rngs={"sample": jax.random.PRNGKey(3)},
                          method=model.cond_generation)
        assert set(gen) == {"_".join(s) for s in powerset(NAMES)}
        for key, per_mod in gen.items():
            assert set(per_mod) == set(NAMES), key
            for n, d in zip(NAMES, DIMS):
                arr = np.asarray(per_mod[n])
                assert arr.shape == (B, d)
                assert np.all(np.isfinite(arr))
