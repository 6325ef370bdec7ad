"""Sample-quality metrics: FID and PRD over decoded feature vectors.

The reference scores generated samples with inception activations of saved
PNGs (``experiments/eval_metrics/sample_quality.py``, ``experiments/fid/``).
The cohorts here are tabular (7-d clinical + 444-d ROI vectors), so the
feature vectors themselves are the embeddings: conditional generations per
modality-subset are compared against the real test data directly (the
adaptation recorded in SURVEY.md §2.4). The Frechet distance math matches
``fid/fid_score.py:calculate_frechet_distance`` (``:139-197``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from ..utils.jit_cache import cached_jit
from .prd import compute_prd_from_embedding, prd_to_max_f_beta_pair

# jitted inference+cond_generation per model (shapes re-trace via jax's
# own cache); keyed by id() with a strong model ref so ids cannot recycle
_COND_JIT_CACHE: Dict[tuple, tuple] = {}


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2,
                               eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def embedding_stats(x: np.ndarray):
    x = np.asarray(x, dtype=np.float64)
    return x.mean(axis=0), np.cov(x, rowvar=False)


def load_embedding(spec):
    """Resolve an embedding spec to ``samples [N, D] -> features [N, E]``.

    The reference pushes samples through InceptionV3 before the Frechet/PRD
    statistics (``fid/inception.py:16-312``, ``fid_score.py:70-137``); for
    the tabular cohorts here the identity is the right default, and this
    hook closes the API gap for image-capable embeddings without vendoring
    a vision model:

    * ``None`` — identity (feature vectors ARE the embeddings);
    * a callable — used as-is;
    * ``"<path>.npz"`` — affine map ``x @ W (+ b)`` from arrays ``W``
      (``[D, E]``) and optional ``b`` (``[E]``);
    * ``"module:attr"`` — an imported callable (plug in any framework's
      feature extractor).
    """
    if spec is None or callable(spec):
        return spec
    if isinstance(spec, str) and spec.endswith(".npz"):
        with np.load(spec) as z:
            w = np.asarray(z["W"], dtype=np.float64)
            b = np.asarray(z["b"], dtype=np.float64) if "b" in z else None

        def affine(x):
            x = np.asarray(x, dtype=np.float64)
            out = x @ w
            return out + b if b is not None else out

        return affine
    if isinstance(spec, str) and ":" in spec:
        import importlib

        mod_name, attr = spec.split(":", 1)
        fn = getattr(importlib.import_module(mod_name), attr)
        if not callable(fn):
            raise TypeError(f"embedding {spec!r} is not callable")
        return fn
    raise ValueError(
        f"embedding spec {spec!r}: expected None, a callable, a .npz path "
        "(arrays 'W'/'b') or 'module:attr'")


def _embed(x, embedding):
    return np.asarray(embedding(x)) if embedding is not None else x


def calculate_fid_from_embeddings(eval_data: np.ndarray,
                                  ref_data: np.ndarray,
                                  embedding=None) -> float:
    embedding = load_embedding(embedding)
    mu1, s1 = embedding_stats(_embed(eval_data, embedding))
    mu2, s2 = embedding_stats(_embed(ref_data, embedding))
    return calculate_frechet_distance(mu1, s1, mu2, s2)


def _load_sample_dump(path: str) -> np.ndarray:
    """A sample dump is either one stacked ``.npy`` array or a directory
    of per-sample ``.npy`` vectors (the reference's
    ``save_samples.py:35-49`` layout, written by
    :func:`save_generated_samples`)."""
    if os.path.isdir(path):
        files = sorted(f for f in os.listdir(path) if f.endswith(".npy"))
        return np.stack([np.load(os.path.join(path, f)) for f in files])
    return np.load(path)


def calculate_fid_given_paths(path_eval: str, path_ref: str,
                              embedding=None) -> float:
    """FID between two sample dumps — stacked ``.npy`` files or
    per-sample dump directories (API parity with
    ``fid_score.py:calculate_fid_given_paths``). ``embedding`` maps the
    samples through a feature extractor first (:func:`load_embedding` — the
    slot the reference fills with InceptionV3)."""
    return calculate_fid_from_embeddings(_load_sample_dump(path_eval),
                                         _load_sample_dump(path_ref),
                                         embedding=embedding)


def save_generated_samples(exp, model_idx: int = 0,
                           num_samples: Optional[int] = None) -> str:
    """Per-group per-modality sample dumps — the reference's FID artifact
    contract (``utils/save_samples.py:35-49``: one ``.npy`` vector per
    sample under ``fid/<group>/<modality>/NNNNNN.npy``). Groups are
    ``real``, ``random`` and one per conditioning subset; the row cap
    follows ``num_samples_fid`` (``coherence.py:88,108``). Returns the dump
    root."""
    cfg = exp.cfg
    if num_samples is None:
        num_samples = int(getattr(cfg, "num_samples_fid", 10000))
    gen, real = generate_conditional_samples(exp, model_idx)
    n_real = len(next(iter(real.values())))
    rand = generate_random_samples(exp, model_idx,
                                   num_samples=min(num_samples, n_real))
    groups = {"real": real, "random": rand, **gen}
    base = os.path.join(cfg.dir_experiment_run, "fid")
    if cfg.num_models > 1:
        base = os.path.join(base, f"model_{model_idx}")
    for group, mods in groups.items():
        for m_key, arr in mods.items():
            d = os.path.join(base, group, m_key)
            os.makedirs(d, exist_ok=True)
            for i, row in enumerate(np.asarray(arr)[:num_samples]):
                np.save(os.path.join(d, str(i).zfill(6) + ".npy"), row)
    return base


def generate_conditional_samples(exp, model_idx: int = 0,
                                 num_samples: Optional[int] = None,
                                 rng=None):
    """Per-subset conditional generations on the test split
    (``BaseMMVae.cond_generation`` driven over the full test batch)."""
    cfg = exp.cfg
    dataset = exp.dataset_test
    if cfg.num_models > 1:
        dataset = dataset[model_idx]
    params = exp.params[model_idx]
    complete = dataset.idx_per_modality_subset[-1]
    if num_samples is not None:
        complete = complete[:num_samples]
    data, _, _ = dataset.gather(complete)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed + 7)

    # one jitted dispatch (eager op-by-op execution costs a relay
    # round-trip per op on remote TPUs); cached per model so the PRD/FID/
    # coherence cadence doesn't re-trace + recompile on every call
    model = exp.model

    def _build():
        def _run(p, b, r):
            latents = model.apply({"params": p}, b, method="inference",
                                  rngs={"sample": r})
            return model.apply({"params": p}, latents["subsets"],
                               method="cond_generation",
                               rngs={"sample": jax.random.fold_in(r, 1)})
        return jax.jit(_run)

    cond = cached_jit(_COND_JIT_CACHE, model, (), _build)(params, batch, rng)
    real = {k: np.asarray(v) for k, v in data.items()}
    gen = {s: {m: np.asarray(v) for m, v in d.items()}
           for s, d in cond.items()}
    return gen, real


def generate_random_samples(exp, model_idx: int = 0,
                            num_samples: int = 256, rng=None):
    """Unconditional generations from the unit prior
    (``BaseMMVae.generate``, ``BaseMMVae.py:242-254``), one jitted
    dispatch; returns ``{modality: [num_samples, D]}`` host arrays."""
    cfg = exp.cfg
    params = exp.params[model_idx]
    model = exp.model
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed + 13)

    def _build():
        return jax.jit(lambda p, r: model.apply(
            {"params": p}, num_samples, method="generate",
            rngs={"sample": r}))

    fn = cached_jit(_COND_JIT_CACHE, model, ("random", int(num_samples)),
                    _build)
    return {m: np.asarray(v) for m, v in fn(params, rng).items()}


def calc_prd_score(exp, model_idx: int = 0, num_clusters: int = 20,
                   num_runs: int = 5, samples=None,
                   embedding=None) -> Dict[str, float]:
    """PRD F-beta scores per (subset, modality)
    (``sample_quality.py:calc_prd_score`` adapted to feature embeddings).
    ``samples`` reuses an already computed ``generate_conditional_samples``
    result (fixed rng — sharing changes nothing numerically); ``embedding``
    maps generated and real samples through a feature extractor first
    (:func:`load_embedding`)."""
    gen, real = (samples if samples is not None
                 else generate_conditional_samples(exp, model_idx))
    embedding = load_embedding(embedding)
    n = len(next(iter(real.values())))
    num_clusters = min(num_clusters, max(2, n // 5))
    scores: Dict[str, float] = {}
    for s_key, mods in gen.items():
        for m_key, samples in mods.items():
            prec, rec = compute_prd_from_embedding(
                _embed(samples, embedding), _embed(real[m_key], embedding),
                num_clusters=num_clusters,
                num_runs=num_runs, seed=exp.cfg.seed)
            f_beta, f_beta_inv = prd_to_max_f_beta_pair(prec, rec)
            scores[f"prd_{s_key}_{m_key}"] = f_beta
            scores[f"prd_inv_{s_key}_{m_key}"] = f_beta_inv
    return scores


def calc_fid_scores(exp, model_idx: int = 0,
                    embedding=None) -> Dict[str, float]:
    """FID per (subset, modality) over feature embeddings."""
    gen, real = generate_conditional_samples(exp, model_idx)
    embedding = load_embedding(embedding)
    scores: Dict[str, float] = {}
    for s_key, mods in gen.items():
        for m_key, samples in mods.items():
            scores[f"fid_{s_key}_{m_key}"] = calculate_fid_from_embeddings(
                samples, real[m_key], embedding=embedding)
    return scores
