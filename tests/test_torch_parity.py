"""Golden parity: the deterministic forward pass must match a PyTorch
implementation of the reference's BaseMMVae semantics with identical weights.

The torch side reimplements ``BaseMMVae.forward``/``inference``
(``utils/BaseMMVae.py:137-239``) and ``networks.py`` faithfully; flax weights
are copied in (flax kernels are ``[in, out]``, torch ``[out, in]``), so any
semantic drift in fusion order, prior-expert placement, mixture partitioning
or decoding shows up as a numeric mismatch.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multivae_tpu.models import build_model, make_modalities
from multivae_tpu.train import Config
from multivae_tpu.train.train_step import init_params

pytestmark = pytest.mark.driver  # cross-framework parity pins

B = 24
DIMS = (5, 18)
CD = 6
STYLE = (2, 4)
HIDDEN = 16


def make_cfg(method):
    return Config(method=method, input_dim=list(DIMS), class_dim=CD,
                  style_dim=list(STYLE), hidden_dim=HIDDEN,
                  num_hidden_layer_encoder=1, num_hidden_layer_decoder=0,
                  learn_output_scale=True,
                  initial_out_logvar=-3.0).derive()


class TorchRef:
    """Reference-semantics forward in torch, weights injected from flax."""

    def __init__(self, cfg, params):
        self.cfg = cfg
        self.w = {}
        for m_idx, name in enumerate(("clinical", "rois")):
            enc = params[f"enc_{name}"]
            dec = params[f"dec_{name}"]
            self.w[name] = {
                "Wh": torch.tensor(np.asarray(enc["hidden_0"]["kernel"])),
                "bh": torch.tensor(np.asarray(enc["hidden_0"]["bias"])),
                "Wo": torch.tensor(np.asarray(enc["heads"]["kernel"])),
                "bo": torch.tensor(np.asarray(enc["heads"]["bias"])),
                "Wd": torch.tensor(np.asarray(dec["out_mu"]["kernel"])),
                "bd": torch.tensor(np.asarray(dec["out_mu"]["bias"])),
                "olv": torch.tensor(np.asarray(dec["out_logvar"])),
                "s": STYLE[m_idx],
            }

    def encode(self, name, x):
        w = self.w[name]
        h = torch.relu(x @ w["Wh"] + w["bh"])
        heads = h @ w["Wo"] + w["bo"]
        cd, s = CD, w["s"]
        return (heads[:, 2 * cd:2 * cd + s], heads[:, 2 * cd + s:],
                heads[:, :cd], heads[:, cd:2 * cd])

    @staticmethod
    def poe(mus, logvars):
        var = torch.exp(logvars) + 1e-8
        t = 1.0 / var
        pd_mu = (mus * t).sum(0) / t.sum(0)
        return pd_mu, torch.log(1.0 / t.sum(0))

    @staticmethod
    def mixture_selection(mus, logvars):
        # utils/utils.py:63-85 with uniform weights
        k, b = mus.shape[0], mus.shape[1]
        import math
        starts, ends = [], []
        for i in range(k):
            start = 0 if i == 0 else ends[i - 1]
            end = b if i == k - 1 else start + int(math.floor(b / k))
            starts.append(start)
            ends.append(end)
        mu = torch.cat([mus[i, starts[i]:ends[i]] for i in range(k)])
        lv = torch.cat([logvars[i, starts[i]:ends[i]] for i in range(k)])
        return mu, lv

    def inference(self, batch, sample):
        cfg = self.cfg
        enc = {m: self.encode(m, batch[m]) for m in batch}
        subsets = {}
        zero = torch.zeros(1, len(next(iter(batch.values()))), CD)
        order = [m for m in ("clinical", "rois") if m in batch]
        # powerset in reference order: singletons then pairs
        from itertools import combinations
        mus_sel, lvs_sel = [], []
        for n in range(1, len(order) + 1):
            for combo in combinations(order, n):
                mus = torch.stack([enc[m][2] for m in combo])
                lvs = torch.stack([enc[m][3] for m in combo])
                if cfg.method in ("poe", "joint_elbo"):
                    if cfg.method == "poe" or len(combo) == 2:
                        mus = torch.cat([mus, zero])
                        lvs = torch.cat([lvs, zero])
                    mu_s, lv_s = self.poe(mus, lvs)
                else:
                    mu_s, lv_s = self.mixture_selection(mus, lvs)
                key = "_".join(sorted(combo))
                subsets[key] = (mu_s, lv_s)
                selected = (
                    (cfg.method in ("moe", "jsd") and len(combo) == 1)
                    or (cfg.method == "poe" and len(combo) == len(order))
                    or cfg.method == "joint_elbo")
                if selected:
                    mus_sel.append(mu_s)
                    lvs_sel.append(lv_s)
        mus_sel = torch.stack(mus_sel)
        lvs_sel = torch.stack(lvs_sel)
        if cfg.method == "jsd":
            mus_sel = torch.cat([mus_sel, zero])
            lvs_sel = torch.cat([lvs_sel, zero])
        if sample:
            joint = self.mixture_selection(mus_sel, lvs_sel)
        else:
            joint = (mus_sel.mean(0), lvs_sel.mean(0))
        return enc, subsets, joint

    def forward(self, batch):
        enc, subsets, joint = self.inference(batch, sample=False)
        rec = {}
        for name in batch:
            w = self.w[name]
            z = torch.cat([enc[name][0], joint[0]], dim=1)
            loc = z @ w["Wd"] + w["bd"]
            rec[name] = loc
        return subsets, joint, rec


@pytest.mark.parametrize("method", ["joint_elbo", "moe", "poe", "jsd"])
def test_deterministic_forward_matches_torch(method):
    cfg = make_cfg(method)
    model = build_model(cfg, make_modalities(cfg.input_dim, cfg.style_dim,
                                             cfg.likelihood))
    rng = np.random.default_rng(7)
    batch_np = {"clinical": rng.normal(size=(B, DIMS[0])).astype(np.float32),
                "rois": rng.normal(size=(B, DIMS[1])).astype(np.float32)}
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    params = init_params(cfg, model, batch)

    out = model.apply({"params": params}, batch, sample_latents=False)
    tref = TorchRef(cfg, params)
    tbatch = {k: torch.tensor(v) for k, v in batch_np.items()}
    subsets_t, joint_t, rec_t = tref.forward(tbatch)

    np.testing.assert_allclose(np.asarray(out["latents"]["joint"][0]),
                               joint_t[0].numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["latents"]["joint"][1]),
                               joint_t[1].numpy(), rtol=2e-4, atol=1e-4)
    for key, (mu_t, lv_t) in subsets_t.items():
        mu_j, lv_j = out["latents"]["subsets"][key]
        np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(),
                                   rtol=2e-4, atol=1e-5, err_msg=key)
        np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(),
                                   rtol=2e-4, atol=1e-4, err_msg=key)
    for name in batch:
        np.testing.assert_allclose(np.asarray(out["rec"][name][0]),
                                   rec_t[name].numpy(), rtol=3e-4,
                                   atol=1e-4, err_msg=name)


def test_single_modality_poe_prior_matches_torch():
    cfg = make_cfg("poe")
    model = build_model(cfg, make_modalities(cfg.input_dim, cfg.style_dim,
                                             cfg.likelihood))
    rng = np.random.default_rng(8)
    full_np = {"clinical": rng.normal(size=(B, DIMS[0])).astype(np.float32),
               "rois": rng.normal(size=(B, DIMS[1])).astype(np.float32)}
    full = {k: jnp.asarray(v) for k, v in full_np.items()}
    params = init_params(cfg, model, full)
    batch_np = {"clinical": full_np["clinical"]}
    batch = {"clinical": full["clinical"]}

    out = model.apply({"params": params}, batch, sample_latents=False)
    tref = TorchRef(cfg, params)
    subsets_t, joint_t, rec_t = tref.forward(
        {"clinical": torch.tensor(batch_np["clinical"])})
    np.testing.assert_allclose(np.asarray(out["latents"]["joint"][0]),
                               joint_t[0].numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rec"]["clinical"][0]),
                               rec_t["clinical"].numpy(), rtol=3e-4,
                               atol=1e-4)
