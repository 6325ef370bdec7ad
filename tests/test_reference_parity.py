"""Parity against the ACTUAL reference implementation.

Drives the real ``BaseMMVae``/``VAE``/``mm_div``/``run_epochs`` code from
``/root/reference/experiments`` (torchvision stubbed — it is only imported
for image helpers this model family never uses) with weights copied from the
JAX model, and asserts forward / subset-posterior / divergence / total-loss
parity for all four methods, on complete and missing-modality batches.

Both sides are made deterministic by zeroing the reparameterization noise:
the JAX model takes an explicit ``noise`` array; the torch model's
``reparameterize`` is monkeypatched to return ``mu`` (``BaseMMVae.py:37-40``
is ``mu + eps*std`` so zero eps is exactly that).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.models import build_model, make_modalities
from multivae_tpu.train import Config
from multivae_tpu.train.losses import total_loss
from multivae_tpu.train.train_step import init_params

torch = pytest.importorskip("torch")

REF = "/root/reference/experiments"
pytestmark = [pytest.mark.driver,
              pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference checkout not present")]

B = 24
D1, D2 = 5, 17
CD, S1, S2 = 6, 2, 3
METHODS = ("joint_elbo", "moe", "poe", "jsd")


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tvu = types.ModuleType("torchvision.utils")
    tvu.save_image = lambda *a, **k: None
    tvu.make_grid = lambda *a, **k: None
    tvt = types.ModuleType("torchvision.transforms")

    class _Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for fn in self.fns:
                x = fn(x)
            return x

    tvt.Compose = _Compose
    tvt.ToTensor = lambda: (lambda x: x)
    tvm = types.ModuleType("torchvision.models")
    # the vendored fid/inception.py subclasses these at import time; the
    # classes are never instantiated in the parity tests
    tvmi = types.ModuleType("torchvision.models.inception")
    for cls_name in ("InceptionA", "InceptionC", "InceptionE",
                     "InceptionAux", "BasicConv2d", "Inception3"):
        setattr(tvmi, cls_name, type(cls_name, (torch.nn.Module,), {}))
    tvm.inception = tvmi
    tvm.inception_v3 = lambda *a, **k: None
    tv.utils, tv.transforms, tv.models = tvu, tvt, tvm
    for name, mod in (("torchvision", tv), ("torchvision.utils", tvu),
                      ("torchvision.transforms", tvt),
                      ("torchvision.models", tvm),
                      ("torchvision.models.inception", tvmi)):
        sys.modules[name] = mod
    # iterstrat isn't in the image either; back it with this repo's
    # reimplementation (data/stratify.py, same Sechidis et al. algorithm)
    if "iterstrat" not in sys.modules:
        from multivae_tpu.data import stratify as _strat
        its = types.ModuleType("iterstrat")
        its_ml = types.ModuleType("iterstrat.ml_stratifiers")
        its_ml.MultilabelStratifiedShuffleSplit = \
            _strat.MultilabelStratifiedShuffleSplit
        its_ml.MultilabelStratifiedKFold = _strat.MultilabelStratifiedKFold
        its.ml_stratifiers = its_ml
        sys.modules["iterstrat"] = its
        sys.modules["iterstrat.ml_stratifiers"] = its_ml


@pytest.fixture(scope="module")
def ref():
    """Imported reference modules (flat package rooted at experiments/)."""
    _stub_torchvision()
    sys.path.insert(0, REF)
    import importlib
    mods = types.SimpleNamespace()
    mods.VAE = importlib.import_module(
        "multimodal_cohort.networks.VAE").VAE
    nets = importlib.import_module("multimodal_cohort.networks.networks")
    mods.Encoder, mods.Decoder = nets.Encoder, nets.Decoder
    cohort = importlib.import_module("modalities.multimodal_cohort")
    mods.Clinical, mods.Rois = cohort.Clinical, cohort.Rois
    mods.run_epochs = importlib.import_module("run_epochs")
    mods.utils = importlib.import_module("utils.utils")
    mods.likelihood_utils = importlib.import_module("utils.likelihood")
    mods.eval_likelihood = importlib.import_module("eval_metrics.likelihood")
    mods.prd_score = importlib.import_module("prd_score.prd_score")
    mods.fid_score = importlib.import_module("fid.fid_score")
    # statsmodels is absent from this image; stat_utils only touches it in
    # make_regression, so an empty stub lets the scipy-only RSA helpers
    # (data2cmat/vec2cmat/fit_rsa) run for parity
    if "statsmodels" not in sys.modules:
        smod = types.ModuleType("statsmodels")
        smod_api = types.ModuleType("statsmodels.api")
        smod.api = smod_api
        sys.modules["statsmodels"] = smod
        sys.modules["statsmodels.api"] = smod_api
    mods.stat_utils = importlib.import_module("stat_utils")
    yield mods
    sys.path.remove(REF)


def make_flags(method):
    """The reference's flag surface for this config (workflow.py:98-145)."""
    num_mods = 2
    flags = types.SimpleNamespace(
        method=method,
        input_dim=[D1, D2], class_dim=CD, style_dim=[S1, S2],
        num_hidden_layer_encoder=1, num_hidden_layer_decoder=0,
        dropout_rate=0.0, factorized_representation=True,
        learn_output_scale=True, learn_output_sample_scale=False,
        initial_out_logvar=-3.0, likelihood="normal",
        batch_size=B, beta=1.0, beta_style=1.0, beta_content=1.0,
        num_models=1, num_mods=num_mods, poe_unimodal_elbos=True,
        device="cpu",
        modality_poe=method == "poe", modality_moe=method == "moe",
        modality_jsd=method == "jsd", joint_elbo=method == "joint_elbo",
        alpha_modalities=[1.0 / (num_mods + 1)] * (num_mods + 1),
    )
    return flags


def make_cfg(method):
    return Config(method=method, input_dim=[D1, D2], class_dim=CD,
                  style_dim=[S1, S2], hidden_dim=256,
                  num_hidden_layer_encoder=1, num_hidden_layer_decoder=0,
                  learn_output_scale=True, likelihood="normal",
                  batch_size=B).derive()


def build_reference_model(ref, flags, style_dims=(S1, S2)):
    """Real VAE over the real Clinical/Rois modalities and subset powerset
    (BaseExperiment.set_subsets key scheme)."""
    from itertools import chain, combinations

    clinical = ref.Clinical(D1, ref.Encoder, ref.Decoder, CD, style_dims[0],
                            "normal")
    rois = ref.Rois(D2, ref.Encoder, ref.Decoder, CD, style_dims[1],
                    "normal")
    modalities = {"clinical": clinical, "rois": rois}
    xs = list(modalities)
    subsets = {}
    for mod_names in chain.from_iterable(
            combinations(xs, n) for n in range(len(xs) + 1)):
        subsets["_".join(sorted(mod_names))] = [
            modalities[m] for m in sorted(mod_names)]
    model = ref.VAE(flags, modalities, subsets)
    model.eval()
    # deterministic: z = mu (zero-eps reparameterization)
    model.reparameterize = lambda mu, logvar: mu
    return model, modalities


def copy_weights(params, model_t, style_dims=(S1, S2)):
    """JAX param tree -> the reference model's torch parameters.

    ``style_dims`` of 0 skip the style heads (the reference encoder does
    not create them when the style dim is 0)."""
    def t(x):
        return torch.from_numpy(np.array(x))

    with torch.no_grad():
        for i, name in enumerate(["clinical", "rois"]):
            s = style_dims[i]
            enc = model_t.encoders[name]
            p = params[f"enc_{name}"]
            enc.shared_encoder[0].weight.copy_(t(p["hidden_0"]["kernel"]).T)
            enc.shared_encoder[0].bias.copy_(t(p["hidden_0"]["bias"]))
            heads_w = t(p["heads"]["kernel"])
            heads_b = t(p["heads"]["bias"])
            enc.class_mu.weight.copy_(heads_w[:, :CD].T)
            enc.class_mu.bias.copy_(heads_b[:CD])
            enc.class_logvar.weight.copy_(heads_w[:, CD:2 * CD].T)
            enc.class_logvar.bias.copy_(heads_b[CD:2 * CD])
            if s > 0:
                enc.style_mu.weight.copy_(heads_w[:, 2 * CD:2 * CD + s].T)
                enc.style_mu.bias.copy_(heads_b[2 * CD:2 * CD + s])
                enc.style_logvar.weight.copy_(heads_w[:, 2 * CD + s:].T)
                enc.style_logvar.bias.copy_(heads_b[2 * CD + s:])
            dec = model_t.decoders[name]
            d = params[f"dec_{name}"]
            dec.out_mu.weight.copy_(t(d["out_mu"]["kernel"]).T)
            dec.out_mu.bias.copy_(t(d["out_mu"]["bias"]))
            dec.logvar.copy_(t(d["out_logvar"]))


@pytest.fixture(scope="module")
def batch_np():
    rng = np.random.default_rng(7)
    return {"clinical": rng.normal(size=(B, D1)).astype(np.float32),
            "rois": rng.normal(size=(B, D2)).astype(np.float32)}


def run_both(ref, method, batch_np, present=("clinical", "rois")):
    cfg = make_cfg(method)
    model_j = build_model(cfg, make_modalities(cfg.input_dim, cfg.style_dim,
                                               cfg.likelihood))
    batch_full = {k: jnp.asarray(v) for k, v in batch_np.items()}
    params = init_params(cfg, model_j, batch_full, seed=3)
    batch_j = {k: v for k, v in batch_full.items() if k in present}
    noise = jnp.zeros((B, model_j.noise_width(batch_j)), jnp.float32)
    out_j = jax.jit(lambda p: model_j.apply(
        {"params": p}, batch_j, noise=noise))(params)

    flags = make_flags(method)
    model_t, modalities = build_reference_model(ref, flags)
    copy_weights(params, model_t)
    batch_t = {k: torch.from_numpy(batch_np[k]) for k in present}
    with torch.no_grad():
        out_t = model_t(batch_t)
    return cfg, model_j, params, batch_j, out_j, flags, model_t, \
        modalities, batch_t, out_t


def assert_close(a, b, rtol=2e-4, atol=1e-5, msg=""):
    np.testing.assert_allclose(np.asarray(a), b.detach().numpy(),
                               rtol=rtol, atol=atol, err_msg=msg)


class TestForwardParity:
    @pytest.mark.parametrize("method", METHODS)
    def test_complete_batch(self, ref, batch_np, method):
        (_, _, _, _, out_j, _, _, _, _, out_t) = run_both(
            ref, method, batch_np)
        # joint posterior (deterministic mixture partition)
        assert_close(out_j["latents"]["joint"][0],
                     out_t["latents"]["joint"][0], msg="joint mu")
        assert_close(out_j["latents"]["joint"][1],
                     out_t["latents"]["joint"][1], msg="joint logvar")
        # mixture rows entering the joint divergence
        assert_close(out_j["latents"]["mus"], out_t["latents"]["mus"],
                     msg="mus")
        assert_close(out_j["latents"]["logvars"],
                     out_t["latents"]["logvars"], msg="logvars")
        # subset posteriors, by key
        for key, (mu_t, lv_t) in out_t["latents"]["subsets"].items():
            mu_j, lv_j = out_j["latents"]["subsets"][key]
            assert_close(mu_j, mu_t, msg=f"subset {key} mu")
            assert_close(lv_j, lv_t, msg=f"subset {key} logvar")
        # reconstructions (torch rec is a Normal distribution object)
        for name in ("clinical", "rois"):
            loc_j, scale_j = out_j["rec"][name]
            assert_close(loc_j, out_t["rec"][name].loc, msg=f"{name} loc")
            assert_close(scale_j, out_t["rec"][name].scale,
                         msg=f"{name} scale")
        # joint divergence
        assert_close(out_j["joint_divergence"], out_t["joint_divergence"],
                     rtol=1e-4, msg="joint_divergence")

    @pytest.mark.parametrize("method", ["joint_elbo", "moe"])
    def test_missing_modality_batch(self, ref, batch_np, method):
        (_, _, _, _, out_j, _, _, _, _, out_t) = run_both(
            ref, method, batch_np, present=("clinical",))
        assert_close(out_j["latents"]["joint"][0],
                     out_t["latents"]["joint"][0], msg="joint mu")
        assert_close(out_j["joint_divergence"], out_t["joint_divergence"],
                     rtol=1e-4, msg="joint_divergence")
        loc_j, _ = out_j["rec"]["clinical"]
        assert_close(loc_j, out_t["rec"]["clinical"].loc, msg="clinical loc")
        assert "rois" not in out_t["rec"]


class TestGradParity:
    @pytest.mark.parametrize("method", METHODS)
    def test_backward_matches_reference_autograd(self, ref, batch_np,
                                                 method):
        """torch autograd of the REAL ``basic_routine_epoch`` total loss
        (``run_epochs.py:166-182``'s backward quantities) against
        ``jax.grad`` of ``total_loss`` with copied weights and zero noise —
        for all four methods, including poe's unimodal re-runs."""
        import jax

        (cfg, model_j, params, batch_j, _, flags, model_t, modalities,
         batch_t, _) = run_both(ref, method, batch_np)

        noise = jnp.zeros((B, model_j.noise_width(batch_j)), jnp.float32)
        noise_uni = None
        if method == "poe":
            noise_uni = {
                name: jnp.zeros((B, model_j.noise_width({name: None})),
                                jnp.float32)
                for name in ("clinical", "rois")}

        def loss_fn(p):
            out = model_j.apply({"params": p}, batch_j, noise=noise)
            return total_loss(cfg, model_j, {"params": p}, batch_j, out,
                              None, noise_uni=noise_uni)[0]

        g = jax.jit(jax.grad(loss_fn))(params)

        exp = types.SimpleNamespace(
            flags=flags, models=model_t, modalities=modalities,
            rec_weights={m: 1.0 for m in modalities},
            style_weights={m: flags.beta_style for m in modalities})
        model_t.zero_grad()
        out_ref = ref.run_epochs.basic_routine_epoch(
            exp, 0, [dict(batch_t)])
        out_ref["total_loss"].backward()

        def close(a, t_param, msg):
            np.testing.assert_allclose(
                np.asarray(a), t_param.grad.detach().numpy(),
                rtol=5e-4, atol=1e-5, err_msg=f"{method} {msg}")

        for i, name in enumerate(["clinical", "rois"]):
            s = [S1, S2][i]
            enc = model_t.encoders[name]
            p = g[f"enc_{name}"]
            close(np.asarray(p["hidden_0"]["kernel"]).T,
                  enc.shared_encoder[0].weight, f"{name} enc hidden W")
            close(p["hidden_0"]["bias"], enc.shared_encoder[0].bias,
                  f"{name} enc hidden b")
            hw = np.asarray(p["heads"]["kernel"])
            hb = np.asarray(p["heads"]["bias"])
            close(hw[:, :CD].T, enc.class_mu.weight, f"{name} cmu W")
            close(hb[:CD], enc.class_mu.bias, f"{name} cmu b")
            close(hw[:, CD:2 * CD].T, enc.class_logvar.weight,
                  f"{name} clv W")
            close(hb[CD:2 * CD], enc.class_logvar.bias, f"{name} clv b")
            close(hw[:, 2 * CD:2 * CD + s].T, enc.style_mu.weight,
                  f"{name} smu W")
            close(hw[:, 2 * CD + s:].T, enc.style_logvar.weight,
                  f"{name} slv W")
            dec = model_t.decoders[name]
            d = g[f"dec_{name}"]
            close(np.asarray(d["out_mu"]["kernel"]).T, dec.out_mu.weight,
                  f"{name} dec W")
            close(d["out_mu"]["bias"], dec.out_mu.bias, f"{name} dec b")
            close(d["out_logvar"], dec.logvar, f"{name} out_logvar")


class TestLossParity:
    @pytest.mark.parametrize("method", METHODS)
    def test_total_loss_matches_basic_routine_epoch(self, ref, batch_np,
                                                    method):
        """The REAL loss composition (run_epochs.basic_routine_epoch +
        utils.calc_elbo) against total_loss, zero-noise on both sides."""
        (cfg, model_j, params, batch_j, out_j, flags, model_t, modalities,
         batch_t, _) = run_both(ref, method, batch_np)

        noise_uni = None
        if method == "poe":
            noise_uni = {
                name: jnp.zeros((B, model_j.noise_width({name: None})),
                                jnp.float32)
                for name in ("clinical", "rois")}
        loss_j, metrics_j = total_loss(cfg, model_j, {"params": params},
                                       batch_j, out_j, None,
                                       noise_uni=noise_uni)

        exp = types.SimpleNamespace(
            flags=flags, models=model_t, modalities=modalities,
            rec_weights={m: 1.0 for m in modalities},
            style_weights={m: flags.beta_style for m in modalities})
        with torch.no_grad():
            out_ref = ref.run_epochs.basic_routine_epoch(
                exp, 0, [dict(batch_t)])
        loss_t = float(out_ref["total_loss"])
        np.testing.assert_allclose(float(loss_j), loss_t, rtol=2e-4,
                                   err_msg=f"{method} total loss")
        # per-modality log-prob and per-subset KLD families
        for name, val in out_ref["log_probs"].items():
            np.testing.assert_allclose(
                float(metrics_j[f"log_prob/{name}"]), float(val),
                rtol=2e-4, err_msg=f"log_prob {name}")
        for key, val in out_ref["klds"].items():
            np.testing.assert_allclose(
                float(metrics_j[f"kld/{key}"]), float(val), rtol=2e-4,
                atol=1e-6, err_msg=f"kld {key}")


# ---------------------------------------------------------------------------
# IWAE likelihood parity (eval_metrics/likelihood.py + utils/likelihood.py)
# ---------------------------------------------------------------------------
# The reference's own IWAE driver cannot run as published on this cohort:
#  * utils/likelihood.py:104-121 never tiles 2-D (tabular) targets, so
#    ``likelihood.log_prob(image)`` broadcasts [B,D] against [K*B,D] and
#    crashes for num_imp_samples > 1 — K=1 is the only runnable setting;
#  * eval_metrics/likelihood.py:38 calls ``next(batch.values())`` (a
#    TypeError — dict_values is not an iterator), so the factorized branch
#    of calc_log_likelihood_batch always crashes;
#  * eval_metrics/likelihood.py:57-63 reuses the stale loop variable
#    ``mod``, assigning every modality the LAST subset modality's style.
# Parity is therefore asserted (a) end-to-end against the real driver in
# its one runnable configuration (no styles, K=1), and (b) against the
# real log_marginal_estimate/log_joint_estimate primitives with correctly
# assembled styles for the factorized config. Zero-eps reparameterization
# on both sides makes every importance sample equal its posterior mean, so
# the K=1 reference value equals our K>1 value exactly.


def _zero_imp_samples(monkeypatch):
    """Deterministic importance samples: z = mu, any K."""
    import multivae_tpu.eval.likelihood as L
    monkeypatch.setattr(
        L, "_imp_samples",
        lambda rng, mu, logvar, k: jnp.broadcast_to(
            mu[None], (k,) + mu.shape))
    monkeypatch.setattr(L, "_JIT_CACHE", {})


class _RowLenDict(dict):
    """Batch mapping whose ``len()`` is the ROW count, not the modality
    count: ``log_joint_estimate`` derives ``batch_size = len(targets)``
    from the batch dict (utils/likelihood.py:162-181), which is the number
    of modalities for a plain dict — the upstream joint estimate is
    unrunnable whenever B != num_mods. This wrapper lets the real function
    execute with the batch size it plainly intends."""

    def __len__(self):
        return next(iter(self.values())).shape[0]


def _rep(x, k):
    """[B, D] -> [k*B, D] sample-major, the reference's repeat layout."""
    return x.unsqueeze(0).repeat(k, 1, 1).view(k * x.shape[0], -1)


class TestIWAEParity:
    def test_content_only_matches_reference_driver(self, ref, batch_np,
                                                   monkeypatch):
        """End-to-end vs the REAL calc_log_likelihood_batch. style_dim=0
        everywhere: the reference Decoder sizes its input as
        style_dim+class_dim even when unfactorized
        (networks.py:46-48 vs :69-73), so only zero style dims run."""
        from multivae_tpu.eval.likelihood import batch_likelihoods

        method = "joint_elbo"
        cfg = Config(method=method, input_dim=[D1, D2], class_dim=CD,
                     style_dim=[0, 0], hidden_dim=256,
                     num_hidden_layer_encoder=1,
                     num_hidden_layer_decoder=0, learn_output_scale=True,
                     likelihood="normal", batch_size=B,
                     factorized_representation=False).derive()
        model_j = build_model(cfg, make_modalities(cfg.input_dim,
                                                   cfg.style_dim,
                                                   cfg.likelihood))
        batch_j = {k: jnp.asarray(v) for k, v in batch_np.items()}
        params = init_params(cfg, model_j, batch_j, seed=3)
        _zero_imp_samples(monkeypatch)
        ours_k5 = batch_likelihoods(model_j, params, batch_j,
                                    jax.random.PRNGKey(0), 5)
        ours_k1 = batch_likelihoods(model_j, params, batch_j,
                                    jax.random.PRNGKey(0), 1)

        flags = make_flags(method)
        flags.style_dim = [0, 0]
        flags.factorized_representation = False
        model_t, modalities = build_reference_model(ref, flags,
                                                    style_dims=(0, 0))
        copy_weights(params, model_t, style_dims=(0, 0))
        subsets = model_t.subsets

        batch_t = _RowLenDict(
            {k: torch.from_numpy(v) for k, v in batch_np.items()})
        exp_t = types.SimpleNamespace(
            flags=flags, mm_vae=model_t, modalities=modalities,
            style_weights={m: 1.0 for m in modalities})
        with torch.no_grad():
            latents_t = model_t.inference(batch_t)
            for s_key, s_mods in subsets.items():
                if not s_key:
                    continue
                ll_t = ref.eval_likelihood.calc_log_likelihood_batch(
                    exp_t, latents_t, s_key, s_mods, batch_t,
                    num_imp_samples=1)
                for m_key in ("clinical", "rois", "joint"):
                    ref_v = float(ll_t[m_key])
                    np.testing.assert_allclose(
                        float(ours_k1[s_key][m_key]), ref_v, rtol=2e-4,
                        err_msg=f"K1 {s_key}/{m_key}")
                    np.testing.assert_allclose(
                        float(ours_k5[s_key][m_key]), ref_v, rtol=2e-4,
                        err_msg=f"K5 {s_key}/{m_key}")

    @pytest.mark.parametrize("method", ["joint_elbo", "poe"])
    def test_factorized_matches_reference_estimators(self, ref, batch_np,
                                                     monkeypatch, method):
        """Style-aware parity vs the REAL log_marginal_estimate /
        log_joint_estimate with per-subset styles assembled the way
        calc_log_likelihood_batch intends (encoded posterior for subset
        modalities, unit-prior draw for the rest) — bypassing its stale
        ``mod`` variable (eval_metrics/likelihood.py:57-63)."""
        from multivae_tpu.eval.likelihood import batch_likelihoods

        cfg = make_cfg(method)
        model_j = build_model(cfg, make_modalities(cfg.input_dim,
                                                   cfg.style_dim,
                                                   cfg.likelihood))
        batch_j = {k: jnp.asarray(v) for k, v in batch_np.items()}
        params = init_params(cfg, model_j, batch_j, seed=3)
        _zero_imp_samples(monkeypatch)
        ours = batch_likelihoods(model_j, params, batch_j,
                                 jax.random.PRNGKey(0), 4)

        flags = make_flags(method)
        model_t, modalities = build_reference_model(ref, flags)
        copy_weights(params, model_t)
        batch_t = _RowLenDict(
            {k: torch.from_numpy(v) for k, v in batch_np.items()})
        with torch.no_grad():
            latents_t = model_t.inference(batch_t)
            for s_key, s_mods in model_t.subsets.items():
                if not s_key:
                    continue
                in_subset = {m.name for m in s_mods}
                c_mu, c_lv = latents_t["subsets"][s_key]
                content = {"mu": _rep(c_mu, 1), "logvar": _rep(c_lv, 1),
                           "z": _rep(c_mu, 1)}
                styles, l_dec_style = {}, {}
                for name, mod in modalities.items():
                    if name in in_subset:
                        s_mu, s_lv = latents_t["modalities"][
                            name + "_style"]
                    else:  # get_random_style_dists: unit prior, z = mu = 0
                        s_mu = torch.zeros(B, mod.style_dim)
                        s_lv = torch.zeros(B, mod.style_dim)
                    styles[name] = {"mu": _rep(s_mu, 1),
                                    "logvar": _rep(s_lv, 1),
                                    "z": _rep(s_mu, 1)}
                    l_dec_style[name] = styles[name]["z"]
                gen = model_t.generate_sufficient_statistics_from_latents(
                    {"content": content["z"], "style": l_dec_style})
                for name in modalities:
                    style_arg = styles[name] if name in in_subset else None
                    ll_m = ref.likelihood_utils.log_marginal_estimate(
                        flags, 1, gen[name], batch_t[name], style_arg,
                        content)
                    np.testing.assert_allclose(
                        float(ours[s_key][name]), float(ll_m), rtol=2e-4,
                        err_msg=f"{method} {s_key}/{name}")
                ll_joint = ref.likelihood_utils.log_joint_estimate(
                    flags, 1, gen, batch_t, styles, content)
                np.testing.assert_allclose(
                    float(ours[s_key]["joint"]), float(ll_joint),
                    rtol=2e-4, err_msg=f"{method} {s_key}/joint")


class TestPrdFidParity:
    """Sample-quality metric parity vs the files the reference VENDORS
    (``experiments/prd_score/prd_score.py`` from compare_gan,
    ``experiments/fid/fid_score.py``). Our implementations were written
    from the papers; these tests pin them to the vendored code on the
    deterministic paths (curve/F-beta/Frechet math exactly; the k-means
    embedding path on well-separated blobs where every clustering
    converges to the same partition)."""

    def test_compute_prd_matches_vendored(self, ref):
        from multivae_tpu.eval.prd import compute_prd

        rng = np.random.default_rng(5)
        e = rng.random(20)
        e /= e.sum()
        r = rng.random(20)
        r /= r.sum()
        p_ours, r_ours = compute_prd(e, r, num_angles=501)
        p_ref, r_ref = ref.prd_score.compute_prd(e, r, num_angles=501)
        np.testing.assert_allclose(p_ours, p_ref, atol=1e-12)
        np.testing.assert_allclose(r_ours, r_ref, atol=1e-12)

    def test_max_f_beta_pair_matches_vendored(self, ref):
        from multivae_tpu.eval.prd import compute_prd, \
            prd_to_max_f_beta_pair

        rng = np.random.default_rng(6)
        e = rng.random(12)
        e /= e.sum()
        r = rng.random(12)
        r /= r.sum()
        prec, rec = compute_prd(e, r)
        ours = prd_to_max_f_beta_pair(prec, rec, beta=8.0)
        theirs = ref.prd_score.prd_to_max_f_beta_pair(prec, rec, beta=8)
        np.testing.assert_allclose(ours, theirs, rtol=1e-9)

    def test_embedding_path_matches_vendored_on_separated_blobs(self, ref):
        """Two tight far-apart blobs: every 2-means clustering recovers
        the same partition (up to a label swap compute_prd is invariant
        to), so the stochastic clustering stage is deterministic and the
        full embedding->PRD pipelines must agree exactly."""
        from multivae_tpu.eval.prd import compute_prd_from_embedding

        rng = np.random.default_rng(7)
        blob_a = rng.normal(size=(80, 4)) * 0.01 + 10.0
        blob_b = rng.normal(size=(80, 4)) * 0.01 - 10.0
        eval_d = np.concatenate([blob_a[:56], blob_b[:24]])
        ref_d = np.concatenate([blob_a[56:], blob_b[24:]])
        p_ours, r_ours = compute_prd_from_embedding(
            eval_d, ref_d, num_clusters=2, num_runs=2)
        p_ref, r_ref = ref.prd_score.compute_prd_from_embedding(
            eval_d, ref_d, num_clusters=2, num_runs=2)
        np.testing.assert_allclose(p_ours, p_ref, atol=1e-9)
        np.testing.assert_allclose(r_ours, r_ref, atol=1e-9)

    def test_frechet_distance_matches_vendored(self, ref):
        from multivae_tpu.eval.sample_quality import \
            calculate_frechet_distance

        rng = np.random.default_rng(8)
        d = 6
        mu1, mu2 = rng.normal(size=d), rng.normal(size=d)
        a = rng.normal(size=(d, d))
        b = rng.normal(size=(d, d))
        s1 = a @ a.T + 0.1 * np.eye(d)
        s2 = b @ b.T + 0.1 * np.eye(d)
        ours = calculate_frechet_distance(mu1, s1, mu2, s2)
        theirs = ref.fid_score.calculate_frechet_distance(mu1, s1, mu2, s2)
        np.testing.assert_allclose(ours, theirs, rtol=1e-8)


class TestStatUtilsParity:
    """RSA stat helpers vs the REAL ``stat_utils.py`` (statsmodels stubbed
    empty — it is only touched by ``make_regression``, whose fixed/mixed/
    hierarchical designs cannot run in this image and are instead verified
    against closed forms in tests/test_stats.py)."""

    def test_data2cmat_and_triu(self, ref):
        from multivae_tpu.analysis.stats import cmat2triu, data2cmat

        rng = np.random.default_rng(9)
        x2 = rng.normal(size=(12, 5))
        x3 = rng.normal(size=(4, 12, 5))
        np.testing.assert_allclose(data2cmat(x2),
                                   ref.stat_utils.data2cmat(x2))
        np.testing.assert_allclose(data2cmat(x3),
                                   ref.stat_utils.data2cmat(x3))
        c = data2cmat(x2)
        np.testing.assert_allclose(cmat2triu(c),
                                   ref.stat_utils.cmat2triu(c))

    def test_vec2cmat_both_branches(self, ref):
        from multivae_tpu.analysis.stats import vec2cmat

        rng = np.random.default_rng(10)
        v = rng.normal(size=16)
        np.testing.assert_allclose(vec2cmat(v),
                                   ref.stat_utils.vec2cmat(v))
        cat = rng.integers(0, 3, size=16)
        np.testing.assert_array_equal(
            vec2cmat(cat, categorical=True),
            ref.stat_utils.vec2cmat(cat, categorical=True))

    def test_fit_rsa_2d_and_range10_quirk(self, ref):
        from multivae_tpu.analysis.stats import fit_rsa, vec2cmat, data2cmat

        rng = np.random.default_rng(11)
        x = rng.normal(size=(14, 6))
        cmat = data2cmat(x)
        ref_cmat = vec2cmat(rng.normal(size=14))
        np.testing.assert_allclose(fit_rsa(cmat, ref_cmat),
                                   ref.stat_utils.fit_rsa(cmat, ref_cmat))
        # 3-D branch: the reference iterates range(10) regardless of the
        # model count (stat_utils.py:87-92) — the quirk is part of the
        # parity contract
        cmats = data2cmat(rng.normal(size=(12, 14, 6)))
        idxs = np.arange(10)
        sub_ref = vec2cmat(rng.normal(size=10))
        np.testing.assert_allclose(
            fit_rsa(cmats, sub_ref, idxs=idxs),
            ref.stat_utils.fit_rsa(cmats, sub_ref, idxs=idxs))
