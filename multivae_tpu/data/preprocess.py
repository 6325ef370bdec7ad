"""Per-modality preprocessing: standard scaling and covariate residualization.

Reference: scalers are sklearn ``StandardScaler`` fit on the train fold
(``multimodal_cohort/experiment.py:146-166``); the ``Residualizer`` regresses
each feature on continuous + categorical covariates with statsmodels OLS and
subtracts the prediction (``experiment.py:26-60``). statsmodels is not
available here, so the residualizer solves the same least-squares problem for
*all* feature columns at once with one ``lstsq`` on a shared design matrix —
mathematically identical and far faster than the per-column loop.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import pandas as pd
from sklearn.preprocessing import StandardScaler

__all__ = ["StandardScaler", "Residualizer"]


def _design_matrix(df: pd.DataFrame, by_continuous: Sequence[str],
                   by_categorical: Sequence[str],
                   categories: Dict[str, np.ndarray] | None = None):
    """[1, continuous..., one-hot(categorical, first level dropped)...] —
    the same parameterization as the reference's patsy formula
    ``y ~ cont + C(cat)``."""
    n = len(df)
    cols = [np.ones((n, 1))]
    for c in by_continuous:
        cols.append(np.asarray(df[c], dtype=np.float64)[:, None])
    cats_out = {}
    for c in by_categorical:
        vals = np.asarray(df[c]).astype(str)
        if categories is None:
            levels = np.unique(vals)
        else:
            levels = categories[c]
        cats_out[c] = levels
        for lev in levels[1:]:  # drop first level (treatment coding)
            cols.append((vals == lev).astype(np.float64)[:, None])
    return np.concatenate(cols, axis=1), cats_out


class Residualizer:
    """OLS residualizer over covariates (``experiment.py:26-60``)."""

    def __init__(self, by_continuous: Sequence[str],
                 by_categorical: Sequence[str]):
        self.by_continuous = list(by_continuous)
        self.by_categorical = list(by_categorical)
        self.coefs = None           # [n_design, n_features]
        self.categories = None
        self.columns_to_residualize: List[str] = []

    def fit(self, df: pd.DataFrame, columns_to_residualize: Sequence[str]):
        self.columns_to_residualize = list(columns_to_residualize)
        X, self.categories = _design_matrix(df, self.by_continuous,
                                            self.by_categorical)
        Y = np.asarray(df[self.columns_to_residualize], dtype=np.float64)
        self.coefs, *_ = np.linalg.lstsq(X, Y, rcond=None)

    def _predict(self, df: pd.DataFrame) -> np.ndarray:
        X, _ = _design_matrix(df, self.by_continuous, self.by_categorical,
                              self.categories)
        return X @ self.coefs

    def transform(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.coefs is None:
            raise ValueError(
                "You must fit the residualizer before transforming data")
        new_df = df.copy()
        pred = self._predict(df)
        for i, col in enumerate(self.columns_to_residualize):
            new_df[col] = np.asarray(new_df[col], dtype=np.float64) - pred[:, i]
        return new_df

    def fit_transform(self, df, columns_to_residualize):
        self.fit(df, columns_to_residualize)
        return self.transform(df)

    def inverse_transform(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.coefs is None:
            raise ValueError(
                "You must fit the residualizer before transforming data")
        new_df = df.copy()
        pred = self._predict(df)
        for i, col in enumerate(self.columns_to_residualize):
            new_df[col] = np.asarray(new_df[col], dtype=np.float64) + pred[:, i]
        return new_df
