"""Representational Similarity Analysis.

Reference: ``experiments/workflow.py:656-820`` (``rsa_exp``). For each latent
space (joint, clinical_rois subset, per-modality styles) the euclidean
dissimilarity matrix of test-set latents is compared — via Kendall tau — with
per-clinical-score and per-covariate dissimilarity matrices.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import pandas as pd

from ..utils.colors import print_result, print_subtitle
from ..utils.jit_cache import cached_jit
from .daa import complete_indices, full_batch
from .stats import data2cmat, fit_rsa, vec2cmat

LATENT_NAMES = ["joint", "clinical_rois", "clinical_style", "rois_style"]

# jitted inference per (model, sample_latents) — RSA only consumes the
# latents, so tracing the full forward would decode reconstructions per
# round just to throw them away
_RSA_JIT_CACHE = {}


def run_rsa(experiment, cfg, datasetdir: str, rsadir: str,
            n_validation: int = 1, n_subjects: int = 301,
            sample_latents: bool = False, seed: int = 1037):
    n_models = cfg.num_models
    clinical_names = np.load(os.path.join(datasetdir, "clinical_names.npy"),
                             allow_pickle=True)
    cov_names = ["age", "sex", "site"]
    if cfg.dataset == "euaims":
        cov_names.append("fsiq")
    categorical_covs = ["sex", "site"]
    n_scores = len(clinical_names)

    kendalltaus = np.zeros((n_models, len(LATENT_NAMES), n_validation,
                            n_scores + len(cov_names), 2))
    latent_dis, scores_dis = [], []
    np_rng = np.random.default_rng(seed)
    base_key = jax.random.PRNGKey(seed)

    for model_idx in range(n_models):
        testset = experiment.dataset_test
        if n_models > 1:
            testset = testset[model_idx]
        params = experiment.params[model_idx]
        model = experiment.model
        latent_dis.append([])
        scores_dis.append([])
        test_complete = complete_indices(testset)
        for val_idx in range(n_validation):
            sel = np_rng.choice(test_complete,
                                size=min(n_subjects, len(test_complete)),
                                replace=False)
            data, metadata = full_batch(testset, sel)
            key = jax.random.fold_in(base_key, 7000 * model_idx + val_idx)
            infer = cached_jit(
                _RSA_JIT_CACHE, model, (bool(sample_latents),),
                lambda: jax.jit(lambda p, d, r: model.apply(
                    {"params": p}, d, method="inference",
                    sample=sample_latents, rngs={"sample": r})))
            latents_all = infer(params, data, key)
            for latent_idx, latent_name in enumerate(LATENT_NAMES):
                if latent_name == "joint":
                    lat = latents_all["joint"]
                elif "style" in latent_name:
                    lat = latents_all["modalities"][latent_name]
                else:
                    lat = latents_all["subsets"][latent_name]
                if lat[0] is None:
                    continue
                if sample_latents:
                    k2 = jax.random.fold_in(key, latent_idx)
                    from .. import ops
                    z = ops.reparameterize(k2, lat[0], lat[1])
                else:
                    z = lat[0]
                z = np.asarray(z)
                cmat = data2cmat(z)
                latent_dis[model_idx].append(cmat)
                scores_cmats = []
                clinical = np.asarray(data["clinical"])
                for score_idx in range(n_scores):
                    score_cmat = vec2cmat(clinical[:, score_idx])
                    scores_cmats.append(score_cmat)
                    tau, pval = fit_rsa(cmat, score_cmat)
                    kendalltaus[model_idx, latent_idx, val_idx,
                                score_idx] = (tau, pval)
                for cov_idx, name in enumerate(cov_names):
                    score_cmat = vec2cmat(metadata[name].to_numpy(),
                                          categorical=name in categorical_covs)
                    scores_cmats.append(score_cmat)
                    tau, pval = fit_rsa(cmat, score_cmat)
                    kendalltaus[model_idx, latent_idx, val_idx,
                                n_scores + cov_idx] = (tau, pval)
                scores_dis[model_idx].append(np.asarray(scores_cmats))

    latent_dis = np.asarray(latent_dis)
    scores_dis = np.asarray(scores_dis)
    np.save(os.path.join(rsadir, "kendalltau_stats.npy"), kendalltaus)
    np.save(os.path.join(rsadir, "latent_dissimilarity.npy"), latent_dis)
    np.save(os.path.join(rsadir, "scores_dissimilarity.npy"), scores_dis)
    print_result(f"kendall tau statistics: "
                 f"{os.path.join(rsadir, 'kendalltau_stats.npy')}")

    print_subtitle("Summarize Kendall tau statstics...")
    for latent_idx, latent_name in enumerate(LATENT_NAMES):
        data_out = {"score": [], "pval": [], "pval_std": [], "r": [],
                    "r_std": []}
        names = list(clinical_names) + cov_names
        for i, name in enumerate(names):
            data_out["score"].append(name)
            data_out["pval"].append(
                np.mean(kendalltaus[:, latent_idx, :, i, 1]))
            data_out["pval_std"].append(
                np.std(kendalltaus[:, latent_idx, :, i, 1]))
            data_out["r"].append(
                np.mean(kendalltaus[:, latent_idx, :, i, 0]))
            data_out["r_std"].append(
                np.std(kendalltaus[:, latent_idx, :, i, 0]))
        df = pd.DataFrame.from_dict(data_out)
        summary_file = os.path.join(rsadir, f"kendalltau_{latent_name}.tsv")
        df.to_csv(summary_file, sep="\t", index=False)
        print_result(f"kendall tau summary: {summary_file}")
    return kendalltaus
