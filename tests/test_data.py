"""Data-layer tests: synthetic cohort contract, fetcher artifacts, dataset
indexing with missing blocks, sampler homogeneity, stratification balance,
preprocessing."""

import os

import numpy as np
import pandas as pd
import pytest

from multivae_tpu.data import (
    DataManager,
    MissingModalitySampler,
    MultilabelStratifiedKFold,
    MultilabelStratifiedShuffleSplit,
    MultimodalDataset,
    Residualizer,
    StandardScaler,
    discretizer,
    fetch_multiblock,
    make_synthetic_cohort,
)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cohort"))
    truth = make_synthetic_cohort(d, n_subjects=120, n_scores=5, n_rois=24,
                                  missing_rate=0.25, seed=3)
    return d, truth


class TestSynthetic:
    def test_artifacts_written(self, cohort):
        d, _ = cohort
        for f in ["clinical_data.npy", "clinical_subjects.npy",
                  "clinical_names.npy", "rois_data.npy", "rois_subjects.npy",
                  "rois_names.npy", "metadata.tsv"]:
            assert os.path.exists(os.path.join(d, f)), f

    def test_missing_blocks(self, cohort):
        d, truth = cohort
        clin = np.load(os.path.join(d, "clinical_subjects.npy"),
                       allow_pickle=True)
        rois = np.load(os.path.join(d, "rois_subjects.npy"),
                       allow_pickle=True)
        assert len(clin) == 120
        assert len(rois) == int(truth["has_rois"].sum()) == 90


class TestFetcher:
    def test_split_artifacts_and_missing_to_train(self, cohort):
        d, _ = cohort
        item = fetch_multiblock(d, allow_missing_blocks=True, overwrite=True)
        idx_train = dict(np.load(item.train_input_path, allow_pickle=True))
        idx_test = dict(np.load(item.test_input_path, allow_pickle=True))
        # test split only holds complete subjects
        assert all(v is not None for v in idx_test["rois"])
        # missing-block subjects appended to train
        n_missing_train = sum(v is None for v in idx_train["rois"])
        assert n_missing_train == 30
        # sizes: 90 common * 0.8 + 30 missing = 102 train, 18 test
        assert len(idx_train["clinical"]) == 102
        assert len(idx_test["clinical"]) == 18
        meta_train = pd.read_table(item.train_metadata_path)
        assert len(meta_train) == 102

    def test_stratification_balances_sites(self, cohort):
        d, _ = cohort
        item = fetch_multiblock(d, allow_missing_blocks=False, overwrite=True)
        meta_train = pd.read_table(item.train_metadata_path)
        meta_test = pd.read_table(item.test_metadata_path)
        p_train = meta_train["site"].value_counts(normalize=True)
        p_test = meta_test["site"].value_counts(normalize=True)
        for site in p_train.index:
            assert abs(p_train[site] - p_test.get(site, 0)) < 0.2

    def test_no_overwrite_reuses(self, cohort):
        d, _ = cohort
        item1 = fetch_multiblock(d, allow_missing_blocks=True, overwrite=True)
        mtime = os.path.getmtime(item1.train_input_path)
        item2 = fetch_multiblock(d, allow_missing_blocks=True)
        assert os.path.getmtime(item2.train_input_path) == mtime


class TestDataset:
    def test_getitem_contract(self, cohort):
        d, _ = cohort
        item = fetch_multiblock(d, allow_missing_blocks=True, overwrite=True)
        ds = MultimodalDataset(item.train_input_path,
                               item.train_metadata_path)
        sample, label, metadata = ds[0]
        assert "clinical" in sample
        assert sample["clinical"].shape == (5,)
        assert "participant_id" in metadata
        assert label in (0, 1)

    def test_missing_modality_absent_from_dict(self, cohort):
        d, _ = cohort
        item = fetch_multiblock(d, allow_missing_blocks=True, overwrite=True)
        ds = MultimodalDataset(item.train_input_path,
                               item.train_metadata_path)
        missing = [i for i in range(len(ds))
                   if not ds._present["rois"][ds._true_idx(i)]]
        assert len(missing) == 30
        sample, _, _ = ds[missing[0]]
        assert "rois" not in sample

    def test_gather_matches_items(self, cohort):
        d, _ = cohort
        item = fetch_multiblock(d, allow_missing_blocks=True, overwrite=True)
        ds = MultimodalDataset(item.train_input_path,
                               item.train_metadata_path)
        full = ds.idx_per_modality_subset[-1][:4]
        data, labels, meta = ds.gather(full)
        assert data["clinical"].shape == (4, 5)
        assert data["rois"].shape == (4, 24)
        for j, i in enumerate(full):
            s, l, m = ds[i]
            np.testing.assert_allclose(data["clinical"][j], s["clinical"])
            np.testing.assert_allclose(data["rois"][j], s["rois"])
            assert labels[j] == l
            assert meta.iloc[j]["participant_id"] == m["participant_id"]

    def test_on_the_fly_scaler(self, cohort):
        d, _ = cohort
        item = fetch_multiblock(d, allow_missing_blocks=True, overwrite=True)
        raw = MultimodalDataset(item.train_input_path,
                                item.train_metadata_path)
        scaler = StandardScaler()
        full_idx = raw.idx_per_modality_subset[-1]
        data, _, _ = raw.gather(full_idx)
        scaler.fit(data["clinical"])
        ds = MultimodalDataset(item.train_input_path,
                               item.train_metadata_path,
                               on_the_fly_transform={"clinical": scaler})
        got, _, _ = ds.gather(full_idx)
        np.testing.assert_allclose(
            got["clinical"], scaler.transform(data["clinical"]), rtol=1e-5)


class TestDataManager:
    def test_train_test(self, cohort):
        d, _ = cohort
        dm = DataManager("synthetic", d, ["clinical", "rois"],
                         allow_missing_blocks=True, overwrite=True)
        assert len(dm.train_dataset) == 102
        assert len(dm.test_dataset) == 18

    def test_validation_folds(self, cohort):
        d, _ = cohort
        dm = DataManager("synthetic", d, ["clinical", "rois"],
                         allow_missing_blocks=True, validation=3,
                         test_size=0, overwrite=True)
        for fold in range(3):
            tr = dm.train_dataset[fold]["train"]
            va = dm.train_dataset[fold]["valid"]
            # valid folds contain only complete subjects; missing go to train
            assert all(tr._present["rois"][tr._true_idx(i)] or True
                       for i in range(len(tr)))
            va_missing = [i for i in range(len(va))
                          if not va._present["rois"][va._true_idx(i)]]
            assert va_missing == []
            # 90 complete (72 train / 18 valid) + 30 missing in train
            assert len(tr) + len(va) == 120
            assert len(va) == 18


class TestSampler:
    def test_batches_are_subset_homogeneous(self, cohort):
        d, _ = cohort
        item = fetch_multiblock(d, allow_missing_blocks=True, overwrite=True)
        ds = MultimodalDataset(item.train_input_path,
                               item.train_metadata_path)
        sampler = MissingModalitySampler(ds, batch_size=16)
        seen = set()
        for batch in sampler:
            present_sets = {
                tuple(m for m in ds.modalities
                      if ds._present[m][ds._true_idx(i)]) for i in batch}
            assert len(present_sets) == 1
            seen.update(batch)
        assert seen == set(range(len(ds)))

    def test_complete_batches_first(self, cohort):
        d, _ = cohort
        item = fetch_multiblock(d, allow_missing_blocks=True, overwrite=True)
        ds = MultimodalDataset(item.train_input_path,
                               item.train_metadata_path)
        sampler = MissingModalitySampler(ds, batch_size=16)
        sizes = [len(b) for b in sampler]
        first_incomplete = next(
            (i for i, s in enumerate(sizes) if s < 16), len(sizes))
        assert all(s < 16 for s in sizes[first_incomplete:])

    def test_epochs_differ(self, cohort):
        d, _ = cohort
        item = fetch_multiblock(d, allow_missing_blocks=True, overwrite=True)
        ds = MultimodalDataset(item.train_input_path,
                               item.train_metadata_path)
        sampler = MissingModalitySampler(ds, batch_size=16)
        e1 = [tuple(b) for b in sampler]
        e2 = [tuple(b) for b in sampler]
        assert e1 != e2


class TestStratify:
    def test_shuffle_split_balances(self):
        rng = np.random.default_rng(0)
        y = pd.DataFrame({
            "age": discretizer(rng.uniform(5, 18, 200)),
            "sex": rng.integers(0, 2, 200),
            "site": rng.integers(0, 3, 200),
        })
        splitter = MultilabelStratifiedShuffleSplit(2, test_size=0.25,
                                                    random_state=1)
        splits = list(splitter.split(np.arange(200), y))
        assert len(splits) == 2
        for train, test in splits:
            assert len(train) + len(test) == 200
            assert len(set(train) & set(test)) == 0
            assert abs(len(test) - 50) <= 4
            for col in y.columns:
                p_tr = pd.Series(y[col].values[train]).value_counts(
                    normalize=True)
                p_te = pd.Series(y[col].values[test]).value_counts(
                    normalize=True)
                for cat in p_tr.index:
                    assert abs(p_tr[cat] - p_te.get(cat, 0)) < 0.15

    def test_kfold_partitions(self):
        rng = np.random.default_rng(0)
        y = pd.DataFrame({"site": rng.integers(0, 3, 90)})
        kf = MultilabelStratifiedKFold(3, shuffle=True, random_state=0)
        all_test = []
        for train, test in kf.split(np.arange(90), y):
            assert len(set(train) & set(test)) == 0
            all_test.extend(test)
        assert sorted(all_test) == list(range(90))


class TestResidualizer:
    def test_removes_covariate_effect(self):
        rng = np.random.default_rng(0)
        n = 300
        age = rng.uniform(5, 18, n)
        site = rng.choice(["a", "b", "c"], n)
        site_eff = {"a": 0.0, "b": 2.0, "c": -1.0}
        y = (3.0 * age + np.array([site_eff[s] for s in site])
             + 0.01 * rng.normal(size=n))
        df = pd.DataFrame({"age": age, "site": site, "feat": y})
        res = Residualizer(by_continuous=["age"], by_categorical=["site"])
        out = res.fit_transform(df, ["feat"])
        assert np.abs(np.corrcoef(out["feat"], age)[0, 1]) < 0.05
        assert np.std(out["feat"]) < 0.1
        # inverse round-trips
        back = res.inverse_transform(out)
        np.testing.assert_allclose(back["feat"], df["feat"], rtol=1e-6)
