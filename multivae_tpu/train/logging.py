"""Metric logging: tensorboard scalars + a CSV mirror.

Scalar families follow the reference's TBLogger
(``experiments/utils/TBLogger.py:84-101``): per-step ``train/Loss``,
``train/LogProb``, ``train/KLD``, ``train/group_divergence``, latent mu/logvar
means, plus ``Likelihoods/*`` and ``PRD`` eval families. A CSV mirror
(``metrics.csv``) is written so runs remain inspectable without tensorboard.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional

import numpy as np

try:
    from tensorboardX import SummaryWriter
except Exception:  # pragma: no cover
    SummaryWriter = None


class MetricLogger:
    """Writes per-step scalar families (tensorboard + CSV mirror).

    Device metric dicts may be logged as-is: they are queued with an async
    device→host copy and materialized at :meth:`flush` (called by the
    trainer at checkpoint cadence and on close), so the epoch loop never
    blocks on a metric ``device_get`` — those ~25 ms relay round-trips per
    epoch dominate long small-cohort trainings otherwise. Row order in the
    CSV/tensorboard is the logging order regardless of when flushes happen.
    """

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.step = 0
        self.writer = None
        if use_tensorboard and SummaryWriter is not None:
            self.writer = SummaryWriter(log_dir)
        self._csv_path = os.path.join(log_dir, "metrics.csv")
        self._csv_file = open(self._csv_path, "a", newline="")
        self._csv = csv.writer(self._csv_file)
        self._pending = []
        if os.path.getsize(self._csv_path) == 0:
            self._csv.writerow(["step", "phase", "metric", "value"])

    def add_text(self, tag: str, text: str) -> None:
        if self.writer is not None:
            self.writer.add_text(tag, text, 0)

    def _scalar(self, phase: str, name: str, value) -> None:
        value = float(np.asarray(value))
        if self.writer is not None:
            self.writer.add_scalar(f"{phase}/{name}", value, self.step)
        self._csv.writerow([self.step, phase, name, value])

    @staticmethod
    def _start_async_copy(metrics) -> None:
        for v in metrics.values():
            start = getattr(v, "copy_to_host_async", None)
            if start is not None:
                try:
                    start()
                except Exception:
                    pass

    def write_metrics(self, phase: str, metrics: Dict[str, object]) -> None:
        """Queue one step's metric dict (keys like ``loss``,
        ``log_prob/m``, ``kld/subset``); values may be device arrays."""
        self._start_async_copy(metrics)
        self._pending.append((phase, metrics, None))

    def write_metrics_stacked(self, phase: str, metrics: Dict[str, object],
                              indices) -> None:
        """Queue per-step rows sliced from stacked metric arrays (one row
        per index; an index may be a tuple, e.g. ``(member, step)``). The
        arrays are fetched once at flush time."""
        self._start_async_copy(metrics)
        for idx in indices:
            self._pending.append((phase, metrics, idx))

    def _drain(self) -> None:
        fetched = {}
        for phase, metrics, idx in self._pending:
            if idx is None:
                for name, value in metrics.items():
                    self._scalar(phase, name, value)
            else:
                key = id(metrics)
                if key not in fetched:
                    fetched[key] = {k: np.asarray(v)
                                    for k, v in metrics.items()}
                for name, value in fetched[key].items():
                    self._scalar(phase, name, value[idx])
            self.step += 1
        self._pending.clear()

    def write_training_logs(self, metrics) -> None:
        self.write_metrics("train", metrics)

    def write_testing_logs(self, metrics) -> None:
        self.write_metrics("test", metrics)

    def write_lhood_logs(self, lhoods: Dict[str, Dict[str, float]]) -> None:
        self._drain()
        for s_key in sorted(lhoods):
            for m_key, val in lhoods[s_key].items():
                self._scalar("Likelihoods", f"{s_key}/{m_key}", val)

    def write_prd_scores(self, prd: Dict[str, float]) -> None:
        self._drain()
        for key, val in prd.items():
            self._scalar("PRD", key, val)

    def flush(self) -> None:
        self._drain()
        self._csv_file.flush()
        if self.writer is not None:
            self.writer.flush()

    def close(self) -> None:
        self.flush()
        self._csv_file.close()
        if self.writer is not None:
            self.writer.close()
