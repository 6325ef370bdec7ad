"""Conditional-generation label coherence.

The reference's version (``experiments/eval_metrics/coherence.py:15-119``) is
vestigial — it requires ``exp.clfs`` per-modality label classifiers that
``MultimodalExperiment`` never defines, so it crashes if called. This is a
working equivalent for the tabular cohorts: logistic-regression label
classifiers are fit per modality on the raw train features, then conditional
generations from every subset posterior are scored for label agreement
(random generations against the label prior, as upstream intended).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from sklearn.linear_model import LogisticRegression

from .sample_quality import generate_conditional_samples


def train_modality_classifiers(exp, model_idx: int = 0):
    """Per-modality label classifiers on raw train features (the ``exp.clfs``
    the reference assumed into existence)."""
    cfg = exp.cfg
    dataset = exp.dataset_train
    if cfg.num_models > 1:
        dataset = dataset[model_idx]
    complete = dataset.idx_per_modality_subset[-1]
    data, labels, _ = dataset.gather(complete)
    if len(np.unique(labels)) < 2:
        return None
    return {m: LogisticRegression(max_iter=1000).fit(x, labels)
            for m, x in data.items()}


def test_generation(exp, model_idx: int = 0,
                    clfs=None, samples=None) -> Dict[str, Dict[str, float]]:
    """Coherence of conditional generations
    (``coherence.py:test_generation`` semantics, made functional).

    For each subset posterior, decode every modality and measure how often
    the modality classifier recovers the true label of the conditioning
    sample. Returns ``{subset: {modality: accuracy}}``. ``clfs`` reuses
    already-trained modality classifiers; ``samples`` reuses an already
    computed ``generate_conditional_samples`` result (its rng is fixed,
    so sharing it with the PRD/FID evals changes nothing numerically).
    """
    if clfs is None:
        clfs = train_modality_classifiers(exp, model_idx)
    if clfs is None:
        return {}
    cfg = exp.cfg
    dataset = exp.dataset_test
    if cfg.num_models > 1:
        dataset = dataset[model_idx]
    complete = dataset.idx_per_modality_subset[-1]
    _, labels, _ = dataset.gather(complete)
    gen, _ = (samples if samples is not None
              else generate_conditional_samples(exp, model_idx))
    coherence: Dict[str, Dict[str, float]] = {}
    for s_key, mods in gen.items():
        coherence[s_key] = {}
        for m_key, samples in mods.items():
            pred = clfs[m_key].predict(samples)
            coherence[s_key][m_key] = float(np.mean(pred == labels))
    return coherence


def calculate_coherence(exp, samples: Dict[str, np.ndarray],
                        model_idx: int = 0, clfs=None) -> float:
    """Joint coherence of unconditional generations
    (``coherence.py:calculate_coherence``): fraction of samples where every
    modality classifier agrees on the label."""
    if clfs is None:
        clfs = train_modality_classifiers(exp, model_idx)
    if clfs is None:
        return float("nan")
    preds = np.stack([clfs[m].predict(np.asarray(x))
                      for m, x in samples.items()])
    return float(np.mean(np.all(preds == preds[0], axis=0)))


def evaluate_coherence(exp, model_idx: int = 0,
                       num_random_samples: int = 256,
                       clfs=None, samples=None) -> Dict[str, object]:
    """Eval-cadence entry point: conditional coherence per subset plus the
    joint coherence of random generations, in the shape the logger's
    ``Generation/*`` family expects (``TBLogger.py:47-57``). Returns ``{}``
    when the cohort has a single label class (nothing to classify).
    Reference intent: ``run_epochs.py``'s test loop was meant to call
    ``coherence.test_generation`` (crashes upstream on ``exp.clfs``);
    this is the fixed-forward product-surface version behind
    ``--calc-coherence``.
    """
    from .sample_quality import generate_random_samples

    if clfs is None:
        clfs = train_modality_classifiers(exp, model_idx)
    if clfs is None:
        return {}
    cond = test_generation(exp, model_idx, clfs=clfs, samples=samples)
    samples = generate_random_samples(exp, model_idx,
                                      num_samples=num_random_samples)
    rand = calculate_coherence(exp, samples, model_idx, clfs=clfs)
    return {"cond": cond, "random": rand}
