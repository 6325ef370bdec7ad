"""The experiment object: owns config, modalities, datasets, scalers,
residualizers, model and per-member parameters/optimizer states.

Reference: ``experiments/multimodal_cohort/experiment.py:64-313``
(``MultimodalExperiment``) — including ensemble mode (``num_models>1`` trains
one member per stratified fold with ``test_size=0``), scaler/residualizer
fitting on the train fold, and checkpoint reload via
:meth:`MultimodalExperiment.get_experiment`.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import numpy as np

from ..data.cohorts import get_short_clinical_names
from ..data import DataManager, Residualizer, StandardScaler
from ..models import build_model, make_modalities, powerset_subsets
from .checkpoint import find_checkpoint, restore_checkpoint
from .config import Config
from .train_step import init_train_state, make_optimizer


class MultimodalExperiment:
    def __init__(self, cfg: Config, init_models: bool = True):
        cfg.derive()
        self.cfg = cfg
        self.flags = cfg  # reference-compatible alias
        self.name = cfg.dataset
        self.modalities = make_modalities(cfg.input_dim, cfg.style_dim,
                                          cfg.likelihood)
        self.mod_names = list(self.modalities)
        self.num_modalities = cfg.num_mods
        self.subsets = powerset_subsets(tuple(self.mod_names))
        # residualization is off by default, as in the reference
        # (experiment.py:68-72, commented out)
        self.residualize_by: Dict[str, dict] = {}

        self.dataset_train = None
        self.dataset_test = None
        self.scalers = None
        self.residualizers = None
        self.set_datasets()

        clinical_names = None
        names_path = os.path.join(cfg.datasetdir, "clinical_names.npy")
        if os.path.exists(names_path):
            clinical_names = np.load(names_path, allow_pickle=True)
        self.short_clinical_names = get_short_clinical_names(
            cfg.dataset, clinical_names)

        self.model = build_model(cfg, self.modalities)
        self.params: List = []
        self.opt_states: List = []
        self.labels = ["ASD"]
        self.rec_weights = self.set_rec_weights()
        self.style_weights = self.set_style_weights()
        if init_models:
            self.set_models()

    # ------------------------------------------------------------- weights
    def set_rec_weights(self):
        """All 1.0 (``experiment.py:281-287``)."""
        return {name: 1.0 for name in self.mod_names}

    def set_style_weights(self):
        """``beta_style`` per modality (``experiment.py:289-292``)."""
        return {name: self.cfg.beta_style for name in self.mod_names}

    # ------------------------------------------------------------ datasets
    def set_scalers(self, dataset, residualizers=None):
        """Fit a StandardScaler per modality on the train samples where the
        modality is present (``experiment.py:146-166``)."""
        scalers = {}
        for mod in self.mod_names:
            idxs = [i for i in range(len(dataset))
                    if dataset._present[mod][dataset._true_idx(i)]]
            rows = dataset._row_idx[mod][
                dataset.indices[idxs] if dataset.indices is not None
                else np.asarray(idxs)]
            data = np.asarray(dataset.data[mod][rows], dtype=np.float64)
            if residualizers is not None and mod in residualizers:
                import pandas as pd
                names = np.load(os.path.join(
                    self.cfg.datasetdir,
                    self.modalities[mod].names_file), allow_pickle=True)
                names = [str(c).replace("&", "_").replace("-", "_")
                         for c in names]
                true = (dataset.indices[idxs]
                        if dataset.indices is not None else idxs)
                meta = dataset.metadata.iloc[true].reset_index(drop=True)
                df = pd.concat(
                    [meta, pd.DataFrame(data, columns=names)], axis=1)
                data = residualizers[mod].transform(df)[names].values
            scaler = StandardScaler()
            scaler.fit(data)
            scalers[mod] = scaler
        return scalers

    def set_residualizers(self, dataset):
        """Fit OLS residualizers for configured modalities
        (``experiment.py:168-190``); empty by default."""
        import pandas as pd
        residualizers = {}
        for mod, spec in self.residualize_by.items():
            idxs = [i for i in range(len(dataset))
                    if dataset._present[mod][dataset._true_idx(i)]]
            true = (dataset.indices[idxs]
                    if dataset.indices is not None else np.asarray(idxs))
            rows = dataset._row_idx[mod][true]
            data = np.asarray(dataset.data[mod][rows], dtype=np.float64)
            names = np.load(os.path.join(
                self.cfg.datasetdir, self.modalities[mod].names_file),
                allow_pickle=True)
            names = [str(c).replace("&", "_").replace("-", "_")
                     for c in names]
            meta = dataset.metadata.iloc[true].reset_index(drop=True)
            df = pd.concat([meta, pd.DataFrame(data, columns=names)], axis=1)
            res = Residualizer(by_continuous=spec["continuous"],
                               by_categorical=spec["categorical"])
            res.fit(df, names)
            residualizers[mod] = res
        return residualizers

    def set_datasets(self):
        """Build train/test datasets, fitting scalers/residualizers per
        ensemble member (``experiment.py:195-254``)."""
        from ..data import MultimodalDataset

        cfg = self.cfg
        validation = None
        n_models = 1
        test_size = 0.2
        if cfg.num_models > 1:
            validation = cfg.num_models
            test_size = 0
            n_models = validation

        manager = DataManager(
            cfg.dataset, cfg.datasetdir, list(self.modalities),
            overwrite=True, allow_missing_blocks=cfg.allow_missing_blocks,
            validation=validation, test_size=test_size, seed=cfg.data_seed)
        self.manager = manager

        train, test, scalers_all, res_all = [], [], [], []
        for model_idx in range(n_models):
            train_dataset = manager.train_dataset
            train_idx = None
            test_input_path = manager.fetcher.test_input_path
            test_metadata_path = manager.fetcher.test_metadata_path
            test_idx = None
            if validation is not None:
                fold = train_dataset[model_idx]
                train_idx = fold["train_idx"]
                test_input_path = manager.fetcher.train_input_path
                test_metadata_path = manager.fetcher.train_metadata_path
                test_idx = fold["valid_idx"]
                train_dataset = fold["train"]
            residualizers = self.set_residualizers(train_dataset)
            scalers = self.set_scalers(train_dataset, residualizers)
            res_all.append(residualizers)
            scalers_all.append(scalers)
            transform = ({mod: res.transform
                          for mod, res in residualizers.items()}
                         or None)
            train.append(MultimodalDataset(
                manager.fetcher.train_input_path,
                manager.fetcher.train_metadata_path, train_idx,
                transform=transform, on_the_fly_transform=scalers))
            test.append(MultimodalDataset(
                test_input_path, test_metadata_path, test_idx,
                transform=transform, on_the_fly_transform=scalers))
        if n_models == 1:
            train, test = train[0], test[0]
            scalers_all, res_all = scalers_all[0], res_all[0]
        self.dataset_train = train
        self.dataset_test = test
        self.scalers = scalers_all
        self.residualizers = res_all

    # --------------------------------------------------------------- models
    def _example_batch(self, model_idx: int = 0):
        dataset = self.dataset_train
        if self.cfg.num_models > 1:
            dataset = dataset[model_idx]
        # a complete-subset example drives init
        full = dataset.idx_per_modality_subset[-1]
        idxs = full[:min(len(full), 2)] or [0]
        data, _, _ = dataset.gather(idxs)
        return data

    def set_models(self):
        """Initialize per-member params (``experiment.py:123-130``)."""
        self.params = []
        for model_idx in range(self.cfg.num_models):
            params, _ = init_train_state(
                self.cfg, self.model, self._example_batch(model_idx),
                seed=self.cfg.seed + model_idx)
            self.params.append(params)

    def set_optimizers(self):
        """Adam states per member (``experiment.py:256-279``)."""
        optimizer = make_optimizer(self.cfg)
        self.optimizer = optimizer
        self.opt_states = [optimizer.init(p) for p in self.params]
        total = sum(int(x.size) for p in self.params
                    for x in jax.tree_util.tree_leaves(p))
        print("num parameters: " + str(total))

    # ------------------------------------------------------------- reload
    @classmethod
    def get_experiment(cls, flags_file: str, checkpoints_dir: str,
                       load_epoch: Optional[int] = None):
        """Rebuild an experiment from its saved config and latest checkpoint
        (``experiment.py:93-121``)."""
        cfg = Config.load(flags_file)
        exp = cls(cfg)
        for model_idx in range(cfg.num_models):
            path, _ = find_checkpoint(checkpoints_dir, model_idx,
                                      cfg.num_models, load_epoch,
                                      cfg.model_save)
            print(path)
            exp.params[model_idx] = restore_checkpoint(
                path, exp.params[model_idx])
        return exp, cfg
