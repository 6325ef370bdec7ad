"""Digital Avatars Analysis (DAA).

Reference: ``experiments/workflow.py:185-539`` (``daa_exp``). The pipeline:
perturb one clinical score at a time with artificial values, decode ROI
"avatars" through the trained model, regress each avatar ROI on the perturbed
score per validation round, and vote Bonferroni-significant score→ROI
associations across rounds (and ensemble members).

TPU-first redesign of the two hot loops:

* the reference's ``M=1000`` averaging passes and the
  ``n_samples × n_scores`` decode sweep (``workflow.py:388-419``) are Python
  loops of full model calls; here they are ``lax.map``-batched vmapped forward
  passes — every (sample, score) decode keeps its own batch of ``n_subjects``
  rows so the joint-mixture partition semantics match the reference's
  per-call behavior exactly;
* the ``n_scores × n_rois`` statsmodels regression stage
  (``workflow.py:448-505``) becomes closed-form einsum algebra
  (:func:`multivae_tpu.analysis.stats.hierarchical_regression_batch`).
"""

from __future__ import annotations

import os
from functools import partial
from types import SimpleNamespace
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from numpy.lib.format import open_memmap

from ..utils.colors import print_result, print_subtitle, print_text
from ..utils.jit_cache import cached_jit
from .stats import (
    fixed_regression_batch,
    fixed_regression_from_stats,
    hierarchical_regression_batch,
    hierarchical_regression_from_stats,
    mixed_regression_from_stats,
)

SAMPLING_STRATEGIES = ("linear", "uniform", "gaussian", "likelihood")
ARTIFACT_MODES = ("full", "stats-only", "sampled")
SUFFSTATS_FILE = "regression_suffstats.npz"
SAMPLED_AVATARS_FILE = "rois_digital_avatars_sampled.npy"
SAMPLED_ROIS_FILE = "sampled_rois_idx.npy"


@partial(jax.jit, static_argnames=("roundtrip_dtype",))
def _device_suffstats(avatars, scores_values, roundtrip_dtype=None):
    """Per-(subject, score, ROI) regression sufficient statistics, on device.

    Every regression design the DAA stage supports (hierarchical / fixed /
    mixed — ``workflow.py:448-505``) depends on the avatar tensor only
    through ``Σ_p y``, ``Σ_p x·y`` and ``Σ_p y²`` per (subject, score, ROI)
    cell, so ``artifact="stats-only"`` reduces the ``[B, S, P, R]`` avatars
    to three ``[B, S, R]`` tensors on device (~2 MB/round at reference
    scale instead of ~93 MB) and never ships the avatar tensor to the host
    — the dominant DAA wall-clock cost on relay-attached TPU hosts.

    ``avatars``: ``[B, n_scores, n_samples, R]`` (the sweep layout);
    ``scores_values``: ``[n_samples, B, n_scores]``. ``roundtrip_dtype``
    (e.g. ``"float16"``) first rounds the avatars through the full mode's
    wire dtype so stats-only reproduces full-mode numbers at a matched
    ``fetch_dtype``.
    """
    y = avatars.astype(jnp.float32)
    if roundtrip_dtype is not None:
        y = y.astype(jnp.dtype(roundtrip_dtype)).astype(jnp.float32)
    x = jnp.transpose(scores_values.astype(jnp.float32),
                      (1, 2, 0))                         # [B, S, P]
    ysum = y.sum(axis=2)                                 # [B, S, R]
    xysum = jnp.einsum("bsp,bspr->bsr", x, y)            # [B, S, R]
    yysum = jnp.einsum("bspr,bspr->bsr", y, y)           # [B, S, R]
    return ysum, xysum, yysum


def params_namespace(n_validation, n_subjects, M, n_samples, reg_method,
                     sampling_strategy, sample_latents, seed):
    """Result-directory naming namespace (``workflow.py:251-262``)."""
    return SimpleNamespace(
        n_validation=n_validation, n_subjects=n_subjects, M=M,
        n_samples=n_samples, reg_method=reg_method,
        sampling=sampling_strategy, sample_latents=sample_latents, seed=seed)


def resdir_name(params: SimpleNamespace) -> str:
    return "_".join("_".join([key, str(val)])
                    for key, val in params.__dict__.items())


def require_resdir(resdir: str) -> str:
    """Validate that a reconstructed DAA result dir exists; on a mismatch
    say what IS there instead of failing later with a raw
    FileNotFoundError on the first artifact read (the downstream commands
    — anova, daa-analysis, daa-robustness — rebuild the dir name from
    their own grid args, which must match the ``daa`` run's)."""
    if os.path.isdir(resdir):
        return resdir
    daadir = os.path.dirname(resdir)
    have = sorted(os.listdir(daadir)) if os.path.isdir(daadir) else []
    hint = ("pass the same --n-validation/--n-samples/--n-subjects/--M/"
            "--reg-method/--sampling-strategy/--sample-latents/--seed "
            "values the `daa` run used")
    if have:
        raise ValueError(f"no DAA results at {os.path.basename(resdir)}; "
                         f"{hint}. Available under {daadir}: {have}")
    raise ValueError(f"{daadir} has no DAA results — run `daa` first")


def complete_indices(dataset) -> np.ndarray:
    """Dataset indices whose samples carry every modality."""
    return np.asarray(dataset.idx_per_modality_subset[-1])


def full_batch(dataset, idxs):
    data, _, metadata = dataset.gather(idxs)
    return {k: jnp.asarray(v) for k, v in data.items()}, metadata


_analytic_jit_cache: Dict[tuple, tuple] = {}


def analytic_reconstruction_stats(model, params, data):
    """Exact expectation of the reference's M-pass averaging.

    For linear decoders with a per-feature output scale the Monte-Carlo mean
    over reparameterized passes (``workflow.py:388-398``) has a closed form:
    the decode of the latent means (joint via the deterministic mixture
    partition). One forward pass replaces M=1000. Jitted per model (eager
    execution would pay one device round-trip per op through the relay).
    """
    def _build():
        def _run(params, data):
            latents = model.apply({"params": params}, data,
                                  method="inference")
            joint_mu = latents["joint"][0]
            outs = []
            for mod in model.modalities:
                s_mu, _ = latents["modalities"][mod.name + "_style"]
                loc, scale = model.apply(
                    {"params": params}, s_mu, joint_mu,
                    method=lambda m, s, c, _n=mod.name: m.decoders[_n](s, c))
                outs.append((loc, scale))
            (c_loc, c_scale), (r_loc, _) = outs
            return c_loc, c_scale, r_loc

        return jax.jit(_run)

    return cached_jit(_analytic_jit_cache, model, ("analytic",),
                      _build)(params, data)


def reconstruction_stats(model, params, data, M: int, rng,
                         chunk: int = 32, cfg=None,
                         exact: object = "auto"):
    """Mean clinical loc/scale and rois loc over ``M`` stochastic
    reconstruction passes (``workflow.py:385-398``).

    On the fused-supported flagship config the average is computed in closed
    form (see :func:`analytic_reconstruction_stats`); otherwise Monte Carlo.
    ``exact=False`` forces the Monte-Carlo M-pass path even on fused configs
    (strict parity with the reference's estimator, which carries MC error at
    matched M); ``exact=True`` forces the closed form.
    """
    if exact is True:
        if cfg is not None:
            from ..ops.fused_daa import supports_fused_sweep
            if not supports_fused_sweep(cfg, model, data):
                # E[decoder(z)] != decoder(E[z]) once the decoder is
                # nonlinear — the closed form is only valid on the linear
                # flagship family
                raise ValueError(
                    "exact_reconstruction=True requires a linear-decoder "
                    "(fused-supported) configuration; use the Monte-Carlo "
                    "estimator (exact_reconstruction=False) instead")
        return analytic_reconstruction_stats(model, params, data)
    if exact != False and cfg is not None:  # noqa: E712  ("auto" path)
        # the closed form holds for every method: the joint latent mean is
        # deterministic (the mixture partition is a static row map) and the
        # flagship decoders are linear — E[decode(z)] = decode(E[z])
        from ..ops.fused_daa import supports_fused_sweep
        if supports_fused_sweep(cfg, model, data):
            return analytic_reconstruction_stats(model, params, data)

    def _build():
        def _run(params, data, rng):
            def one(key):
                out = model.apply({"params": params}, data,
                                  sample_latents=True,
                                  rngs={"sample": key})
                return (out["rec"]["clinical"][0],
                        out["rec"]["clinical"][1],
                        out["rec"]["rois"][0])

            keys = jax.random.split(rng, M)
            locs, scales, rois = jax.lax.map(one, keys,
                                             batch_size=min(chunk, M))
            return locs.mean(0), scales.mean(0), rois.mean(0)

        return jax.jit(_run)

    return cached_jit(_analytic_jit_cache, model,
                      ("mc", int(M), int(chunk)), _build)(params, data, rng)


def avatar_sweep(model, params, data, scores_values, sample_latents: bool,
                 rng, chunk: int = 16, cfg=None):
    """Decode ROI avatars for every (sample, score) perturbation.

    ``scores_values``: ``[n_samples, B, n_scores]`` artificial values (the
    likelihood-strategy layout; other strategies are transposed into it).
    Returns avatars ``[B, n_scores, n_samples, n_rois]`` matching the
    reference memmap layout (``workflow.py:380-419``).

    Each (sample, score) cell is one vmapped forward pass over the original
    ``B``-row batch, so mixture-selection partitioning is identical to the
    reference's per-call ``model(modified_data)``.
    """
    if cfg is not None:
        from ..ops.fused_daa import fused_avatar_sweep, supports_fused_sweep
        if supports_fused_sweep(cfg, model, data):
            interpret = jax.default_backend() == "cpu"
            return fused_avatar_sweep(model, params, data, scores_values,
                                      sample_latents, rng, cfg,
                                      interpret=interpret)
    def _build():
        names = [m.name for m in model.modalities]

        def _run(params, clinical, other, scores_values, rng):
            n_samples, b, n_scores = scores_values.shape
            eye = jnp.eye(n_scores, dtype=clinical.dtype)

            def one(args):
                cell, key = args
                sample_idx = cell // n_scores
                score_idx = cell % n_scores
                col = scores_values[sample_idx, :, score_idx]  # [B]
                mask = eye[score_idx]  # [n_scores]
                cdata = (clinical * (1.0 - mask)[None, :]
                         + col[:, None] * mask[None, :])
                out = model.apply({"params": params},
                                  {names[0]: cdata, names[1]: other},
                                  sample_latents=sample_latents,
                                  rngs={"sample": key})
                return out["rec"][names[1]][0]  # [B, n_rois]

            cells = jnp.arange(n_samples * n_scores)
            keys = jax.random.split(rng, n_samples * n_scores)
            rois = jax.lax.map(one, (cells, keys),
                               batch_size=min(chunk, n_samples * n_scores))
            # [n_samples*n_scores, B, R] -> [B, n_scores, n_samples, R]
            rois = rois.reshape(n_samples, n_scores, b, -1)
            return jnp.transpose(rois, (2, 1, 0, 3))

        return jax.jit(_run)

    fn = cached_jit(_analytic_jit_cache, model,
                    ("sweep", bool(sample_latents), int(chunk)), _build)
    return fn(params, jnp.asarray(data["clinical"]),
              jnp.asarray(data["rois"]),
              jnp.asarray(scores_values), rng)


def avatar_sweep_sharded(model, params, data, scores_values,
                         sample_latents: bool, rng, mesh, cfg=None):
    """Multi-device avatar sweep: the (sample, score) cell grid shards over
    the mesh's ``data`` axis (SURVEY §2.6 — the DAA grid is this workload's
    long axis; there are no sequences to parallelize).

    Each device decodes its slice of perturbation cells with replicated
    params; results gather back to the host layout
    ``[B, n_scores, n_samples, n_rois]``. On fused-supported configs the
    per-device body is the Pallas grid kernel (``shard_map`` over cells),
    so multi-chip keeps the single-chip kernel's speed per device; the rng
    stream matches the single-device sweep cell-for-cell, making outputs
    reproducible across device counts.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_samples, b, n_scores = scores_values.shape
    n_dev = mesh.shape["data"]
    n_cells = n_samples * n_scores
    pad = (-n_cells) % n_dev
    names = [m.name for m in model.modalities]
    clinical = jnp.asarray(data[names[0]])
    rois = jnp.asarray(data[names[1]])
    scores_values = jnp.asarray(scores_values)

    from ..ops.fused_daa import build_cell_grid
    cdata = build_cell_grid(clinical, scores_values)
    if pad:
        cdata = jnp.concatenate([cdata, cdata[:pad]], axis=0)

    fused = False
    if cfg is not None:
        from ..ops.fused_daa import supports_fused_sweep
        fused = supports_fused_sweep(cfg, model, data)

    cell_sharding = NamedSharding(mesh, P("data"))

    if fused:
        from ..ops.fused_daa import (
            dims_from, flatten_params, rois_posteriors, split_params,
            sweep_cells)
        # interpret on CPU meshes; the mesh's devices decide (the default
        # backend may differ, e.g. a virtual CPU mesh next to a TPU chip)
        interpret = mesh.devices.flat[0].platform == "cpu"
        dims = dims_from(cfg, b)
        sp = split_params(flatten_params(params, model), dims)
        posteriors = rois_posteriors(model, params, rois)
        # same eps stream as the single-device fused sweep, zero-padded
        eps = jax.random.normal(rng, (n_cells, b, dims.cd + dims.s2),
                                jnp.float32)
        if pad:
            eps = jnp.concatenate(
                [eps, jnp.zeros((pad,) + eps.shape[1:], eps.dtype)])

        def shard_body(sp_repl, post_repl, cd, ep):
            return sweep_cells(sp_repl, post_repl, cd, ep, dims,
                               sample_latents, interpret=interpret,
                               method=cfg.method)

        # check_vma off: pallas_call out_shapes carry no vma annotation
        sweep = jax.jit(jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=P("data"), check_vma=False))
        out = sweep(sp, posteriors,
                    jax.device_put(cdata, cell_sharding),
                    jax.device_put(eps, cell_sharding))[:n_cells]
        out = out.reshape(n_samples, n_scores, b, -1)
        return jnp.transpose(out, (2, 1, 0, 3))

    # general path: one vmapped model call per cell, cells sharded.
    # key stream prefix-matches the single-device sweep (split(rng, n_cells));
    # pad cells reuse leading keys and are dropped after the gather
    keys = jax.random.split(rng, n_cells)
    if pad:
        keys = jnp.concatenate([keys, keys[:pad]], axis=0)

    def one(cell_clinical, key):
        out = model.apply({"params": params},
                          {names[0]: cell_clinical, names[1]: rois},
                          sample_latents=sample_latents,
                          rngs={"sample": key})
        return out["rec"][names[1]][0]

    sweep = jax.jit(
        jax.vmap(one),
        in_shardings=(cell_sharding, cell_sharding),
        out_shardings=cell_sharding)
    out = sweep(jax.device_put(cdata, cell_sharding),
                jax.device_put(keys, cell_sharding))[:n_cells]
    out = out.reshape(n_samples, n_scores, b, -1)
    return jnp.transpose(out, (2, 1, 0, 3))


def _drain_pending(memmap, pending, n_models: int):
    """Fetch a round's avatar tensor (blocking) and widen into the float32
    on-disk artifact."""
    model_idx, val_idx, avatars = pending
    host = np.asarray(avatars, dtype=np.float32)
    if n_models == 1:
        memmap[val_idx] = host
    else:
        memmap[model_idx, val_idx] = host


def sample_artificial_scores(strategy: str, clinical_values: np.ndarray,
                             n_samples: int, n_subjects: int,
                             rng: np.random.Generator):
    """Population-level artificial score values for the non-likelihood
    strategies (``workflow.py:337-354``). Returns
    ``[n_subjects, n_scores, n_samples]``."""
    n_scores = clinical_values.shape[1]
    min_per_score, max_per_score = np.quantile(
        clinical_values, [0.05, 0.95], 0)
    if strategy == "linear":
        grid = np.linspace(min_per_score, max_per_score, n_samples)  # [P, S]
        return np.repeat(grid.T[np.newaxis], n_subjects, axis=0)
    if strategy == "uniform":
        return rng.uniform(min_per_score[None, :, None],
                           max_per_score[None, :, None],
                           size=(n_subjects, n_scores, n_samples))
    if strategy == "gaussian":
        return rng.normal(0.0, 1.0, size=(n_subjects, n_scores, n_samples))
    raise ValueError(f"unknown sampling strategy {strategy}")


def run_daa(experiment, cfg, datasetdir: str, daadir: str,
            sampling_strategy: str = "likelihood", n_validation: int = 5,
            n_samples: int = 200, n_subjects: int = 50, M: int = 1000,
            trust_level: float = 0.75, seed: Optional[int] = 1037,
            reg_method: str = "hierarchical", sample_latents: bool = True,
            vote_prop: float = 1.0, chunk: int = 16,
            use_sharding="auto", exact_reconstruction="auto",
            fetch_dtype: str = "float16", artifact: str = "full",
            sampled_rois: int = 16) -> str:
    """Full DAA pipeline; returns the result directory.

    ``use_sharding``: shard the avatar perturbation grid over the device
    mesh (``"auto"`` enables it whenever more than one device is present;
    the DAA grid is this workload's long axis, SURVEY §2.6).
    ``exact_reconstruction``: replace the reference's M-pass Monte-Carlo
    reconstruction average by its closed form on supported configs
    (``"auto"``/True) or force the MC estimator for strict parity
    (``False``).
    ``fetch_dtype``: wire dtype for the device->host avatar transfer. The
    avatar artifact is the DAA wall-clock bottleneck on relay-attached
    TPUs (~1.9 GB at reference scale over ~15 MB/s); ``float16`` halves
    the bytes and the values (standardized ROI decodes, O(1) scale) keep
    ~3 significant digits — regression outputs agree to tolerance. The
    on-disk artifact stays float32 (parity contract); use ``float32`` to
    force an exact fetch. Each round's fetch is deferred until after the
    next round's dispatch so compute and transfer overlap where the
    platform allows (note: ``copy_to_host_async`` is a no-op through the
    axon relay, so there the win is the halved bytes; on directly-attached
    hosts the overlap is real).
    ``artifact``: ``"full"`` (default) writes the reference's
    ``rois_digital_avatars.npy`` memmap; ``"stats-only"`` reduces each
    round to the per-(subject, score, ROI) regression sufficient
    statistics on device and never fetches the avatar tensor — the
    regression/voting outputs (``pvalues.npy``/``coefs.npy``/
    ``all_coefs.npy``/``significant_rois.tsv``) are unchanged to
    float tolerance (the only difference is the f32-on-device vs
    f64-on-host level-1 reduction) and the downstream ``anova`` /
    ``daa-robustness`` workflows still work; ``"sampled"`` is
    stats-only PLUS a device-side random subsample of ``sampled_rois``
    ROI columns fetched per round (``rois_digital_avatars_sampled.npy``
    + ``sampled_rois_idx.npy``), enough for ``daa-analysis``'s
    KDE/scatter diagnostics (``analyze_avatars.py:17-104`` plots 3
    random ROIs) without the multi-GB full-artifact transfer — at
    reference scale ~70 MB instead of ~1.9 GB crosses the wire. Only a
    byte-exact replay of the full artifact still needs ``"full"``."""
    if sampling_strategy not in SAMPLING_STRATEGIES:
        raise ValueError("sampling_strategy must be either linear, uniform"
                         "gaussian or likelihood")
    if artifact not in ARTIFACT_MODES:
        raise ValueError(f"artifact must be one of {ARTIFACT_MODES}, "
                         f"got: {artifact}")
    if isinstance(use_sharding, str):
        use_sharding = (len(jax.devices()) > 1 if use_sharding == "auto"
                        else use_sharding.lower() in ("true", "1", "yes"))
    if isinstance(exact_reconstruction, str) \
            and exact_reconstruction != "auto":
        exact_reconstruction = exact_reconstruction.lower() in (
            "true", "1", "yes")
    mesh = None
    if use_sharding and len(jax.devices()) > 1:
        from ..parallel import data_mesh
        mesh = data_mesh(len(jax.devices()))
        print_text(f"avatar grid sharded over {len(jax.devices())} devices")
    n_models = cfg.num_models
    clinical_names = np.load(os.path.join(datasetdir, "clinical_names.npy"),
                             allow_pickle=True)
    rois_names = np.load(os.path.join(datasetdir, "rois_names.npy"),
                         allow_pickle=True)
    n_scores = len(clinical_names)
    n_rois = len(rois_names)
    print_text(f"number of ROIs: {n_rois}")
    print_text(f"number of clinical scores: {n_scores}")

    params_ns = params_namespace(n_validation, n_subjects, M, n_samples,
                                 reg_method, sampling_strategy,
                                 sample_latents, seed)
    resdir = os.path.join(daadir, resdir_name(params_ns))
    os.makedirs(resdir, exist_ok=True)

    np_rng = np.random.default_rng(seed)
    base_key = jax.random.PRNGKey(seed if seed is not None else 0)

    # clamp to the available complete test subjects before sizing the memmap
    testset0 = (experiment.dataset_test if n_models == 1
                else experiment.dataset_test[0])
    n_subjects = min(n_subjects, len(complete_indices(testset0)))

    stats_only = artifact in ("stats-only", "sampled")
    roi_sub = None
    if artifact == "sampled":
        # own rng stream: the subset choice must not advance np_rng, so
        # subject selection (and therefore every regression input) stays
        # identical to a full/stats-only run at the same seed
        sub_rng = np.random.default_rng((seed if seed is not None else 0)
                                        + 17)
        k_rois = min(int(sampled_rois), n_rois)
        roi_sub = np.sort(sub_rng.choice(n_rois, size=k_rois,
                                         replace=False)).astype(np.int32)
        roi_sub_dev = jnp.asarray(roi_sub)
    rois_digital_avatars = None
    if not stats_only:
        da_file = os.path.join(resdir, "rois_digital_avatars.npy")
        shape = (n_models, n_validation, n_subjects, n_scores, n_samples,
                 n_rois)
        if n_models == 1:
            shape = shape[1:]
        rois_digital_avatars = open_memmap(da_file, dtype="float32",
                                           mode="w+", shape=shape)
    elif artifact == "sampled":
        print_text(f"artifact=sampled: device-side regression sufficient "
                   f"statistics + a {len(roi_sub)}-ROI avatar subsample "
                   f"per round (serves daa-analysis without the full "
                   f"artifact transfer)")
    else:
        print_text("artifact=stats-only: reducing each round to regression "
                   "sufficient statistics on device (daa-analysis needs "
                   "artifact=full or sampled; anova/daa-robustness are "
                   "unaffected)")

    all_sampled_scores, all_metadatas, all_rois_reconstructions = [], [], []
    all_suffstats = []  # per model: list of per-round (ysum, xysum, yysum)
    all_sub_avatars = []  # sampled mode: per model, per-round [B, S, P, K]
    metadata_columns = None
    pending = None  # (model_idx, val_idx, device avatars) awaiting fetch

    for model_idx in range(n_models):
        trainset = experiment.dataset_train
        testset = experiment.dataset_test
        if n_models > 1:
            trainset = trainset[model_idx]
            testset = testset[model_idx]
        params = experiment.params[model_idx]
        model = experiment.model
        print_text(f"train data: {len(trainset)}")
        print_text(f"test data: {len(testset)}")

        train_data, _ = full_batch(trainset, complete_indices(trainset))
        clinical_values = np.asarray(train_data["clinical"])

        scores_grid = None
        if sampling_strategy != "likelihood":
            print_text("Build the artificial values using population level "
                       "statistics")
            scores_grid = sample_artificial_scores(
                sampling_strategy, clinical_values, n_samples, n_subjects,
                np_rng)  # [B, S, P]

        test_complete = complete_indices(testset)
        sampled_scores, metadatas, rois_recs = [], [], []
        suffstats_rounds, sub_avatar_rounds = [], []
        for val_idx in range(n_validation):
            print_text(f"validation round {val_idx + 1}/{n_validation}")
            sel = np_rng.choice(test_complete, size=n_subjects,
                                replace=False)
            data, metadata = full_batch(testset, sel)
            metadata_columns = list(metadata.columns)
            metadatas.append(metadata.to_numpy())

            key = jax.random.fold_in(base_key, 1000 * model_idx + val_idx)
            k_rec, k_sample, k_sweep = jax.random.split(key, 3)
            loc_hat, scale_hat, rois_reconstruction = reconstruction_stats(
                model, params, data, M, k_rec, chunk=chunk, cfg=cfg,
                exact=exact_reconstruction)
            rois_recs.append(rois_reconstruction)  # device; drained once

            if sampling_strategy == "likelihood":
                eps = jax.random.normal(
                    k_sample, (n_samples,) + loc_hat.shape, loc_hat.dtype)
                scores_values = loc_hat[None] + scale_hat[None] * eps
            else:
                # [B, S, P] -> [P, B, S]
                scores_values = jnp.transpose(
                    jnp.asarray(scores_grid, dtype=jnp.float32), (2, 0, 1))

            if mesh is not None:
                avatars = avatar_sweep_sharded(
                    model, params, data, scores_values, sample_latents,
                    k_sweep, mesh, cfg=cfg)
            else:
                avatars = avatar_sweep(model, params, data, scores_values,
                                       sample_latents, k_sweep, chunk=chunk,
                                       cfg=cfg)
            if stats_only:
                # reduce on device; only three [B, S, R] tensors cross the
                # wire. The wire-dtype roundtrip keeps stats-only numbers
                # matched to a full-mode run at the same fetch_dtype.
                rt = None if fetch_dtype == "float32" else fetch_dtype
                suffstats_rounds.append(_device_suffstats(
                    avatars, jnp.asarray(scores_values),
                    roundtrip_dtype=rt))  # device; drained once per model
                if roi_sub is not None:
                    # keep the subsampled columns at the full artifact's
                    # wire dtype so their values match a full-mode run's
                    # on-disk columns exactly
                    sub = avatars[..., roi_sub_dev]
                    if fetch_dtype != "float32":
                        sub = sub.astype(jnp.dtype(fetch_dtype))
                    sub_avatar_rounds.append(sub)  # device; drained once
            else:
                if fetch_dtype != "float32":
                    # halve the device->host bytes; widened to f32 on write
                    avatars = avatars.astype(jnp.dtype(fetch_dtype))
                try:
                    # start the transfer now; it overlaps the next round's
                    # dispatch and the blocking np.asarray below drains it
                    avatars.copy_to_host_async()
                except Exception:
                    pass  # backend without async host copies
                if pending is not None:
                    _drain_pending(rois_digital_avatars, pending, n_models)
                pending = (model_idx, val_idx, avatars)
            sampled_scores.append(scores_values)  # device [P, B, S]
        # ONE batched drain per model of the per-round small tensors
        # (reconstruction means, sampled scores, sufficient statistics):
        # a blocking fetch per round costs a relay round-trip each — 3-5 x
        # n_validation of them dominated contended stats-only runs, where
        # no large artifact transfer is left to hide them behind
        rois_recs = jax.device_get(rois_recs)
        suffstats_rounds = jax.device_get(suffstats_rounds)
        if roi_sub is not None:
            all_sub_avatars.append(
                [np.asarray(a, dtype=np.float32)
                 for a in jax.device_get(sub_avatar_rounds)])
        # stored layout: [B, n_samples, n_scores] (workflow.py:420-422)
        sampled_scores = [np.swapaxes(s, 0, 1)
                          for s in jax.device_get(sampled_scores)]
        all_sampled_scores.append(sampled_scores)
        all_metadatas.append(metadatas)
        all_rois_reconstructions.append(rois_recs)
        all_suffstats.append(suffstats_rounds)

    if pending is not None:
        _drain_pending(rois_digital_avatars, pending, n_models)
    if n_models == 1:
        all_sampled_scores = all_sampled_scores[0]
        all_metadatas = all_metadatas[0]
        all_rois_reconstructions = all_rois_reconstructions[0]
    all_sampled_scores = np.asarray(all_sampled_scores)
    all_rois_reconstructions = np.asarray(all_rois_reconstructions)
    if stats_only:
        # [(n_models,) n_validation, B, S, R] per statistic
        stat_names = ("ysum", "xysum", "yysum")
        stacked = {name: np.asarray([[rnd[i] for rnd in rounds]
                                     for rounds in all_suffstats])
                   for i, name in enumerate(stat_names)}
        if n_models == 1:
            stacked = {k: v[0] for k, v in stacked.items()}
        np.savez(os.path.join(resdir, SUFFSTATS_FILE), **stacked)
        if roi_sub is not None:
            # [(n_models,) n_validation, B, S, P, K] float32 + the ROI
            # index map back into rois_names
            sub_arr = np.asarray(all_sub_avatars, dtype=np.float32)
            if n_models == 1:
                sub_arr = sub_arr[0]
            np.save(os.path.join(resdir, SAMPLED_AVATARS_FILE), sub_arr)
            np.save(os.path.join(resdir, SAMPLED_ROIS_FILE), roi_sub)
    else:
        rois_digital_avatars.flush()
        del rois_digital_avatars
    np.save(os.path.join(resdir, "sampled_scores.npy"), all_sampled_scores)
    np.save(os.path.join(resdir, "metadatas.npy"),
            np.asarray(all_metadatas, dtype=object))
    np.save(os.path.join(resdir, "rois_reconstructions.npy"),
            all_rois_reconstructions)

    compute_significativity(
        resdir, cfg, clinical_names, rois_names, params_ns,
        metadata_columns, trust_level, vote_prop, reg_method)
    return resdir


def compute_significativity(resdir: str, cfg, clinical_names, rois_names,
                            params_ns, metadata_columns, trust_level: float,
                            vote_prop: float, reg_method: str):
    """Regression + voting stage (``workflow.py:443-539``); reads the saved
    avatar artifacts so it can be re-run standalone."""
    n_models = cfg.num_models
    n_scores = len(clinical_names)
    n_rois = len(rois_names)
    n_validation = params_ns.n_validation
    n_samples = params_ns.n_samples

    da_file = os.path.join(resdir, "rois_digital_avatars.npy")
    suff_file = os.path.join(resdir, SUFFSTATS_FILE)
    rois_da = suffstats = None
    if os.path.exists(da_file):
        rois_da = np.load(da_file, mmap_mode="r")
    elif os.path.exists(suff_file):
        # stats-only run: finish the regressions from the device-reduced
        # sufficient statistics (the avatar tensor was never materialized)
        with np.load(suff_file) as fh:
            suffstats = {k: fh[k] for k in ("ysum", "xysum", "yysum")}
    else:
        raise FileNotFoundError(
            f"{resdir} holds neither the avatar artifact "
            f"('rois_digital_avatars.npy', written by daa --artifact full) "
            f"nor the sufficient statistics ('{SUFFSTATS_FILE}', written "
            f"by --artifact stats-only); re-run the daa workflow (or "
            f"restore the deleted artifact) before the regression stage")
    all_sampled_scores = np.load(os.path.join(resdir, "sampled_scores.npy"))
    all_metadatas = np.load(os.path.join(resdir, "metadatas.npy"),
                            allow_pickle=True)
    all_rois_recs = np.load(os.path.join(resdir, "rois_reconstructions.npy"))
    if n_models == 1:
        if rois_da is not None:
            rois_da = rois_da[np.newaxis]
        else:
            suffstats = {k: v[np.newaxis] for k, v in suffstats.items()}
        all_sampled_scores = all_sampled_scores[np.newaxis]
        all_metadatas = all_metadatas[np.newaxis]
        all_rois_recs = all_rois_recs[np.newaxis]

    participant_id_idx = metadata_columns.index("participant_id")
    site_idx = metadata_columns.index("site")
    modified_rois_names = [str(n).replace("&", "_").replace("-", "_")
                           for n in rois_names]

    print_subtitle("Compute statistics (regression): digital avatar wrt "
                   "sampled scores...")
    coefs = np.zeros((n_models, n_validation, n_scores, n_rois))
    pvalues = np.zeros((n_models, n_validation, n_scores, n_rois))
    all_coefs = []
    for model_idx in range(n_models):
        all_coefs.append([])
        for val_idx in range(n_validation):
            avatars = (np.asarray(rois_da[model_idx, val_idx])
                       if rois_da is not None else None)
            scores_values = all_sampled_scores[model_idx, val_idx]
            metadata = all_metadatas[model_idx][val_idx]
            rois_rec = all_rois_recs[model_idx, val_idx]
            all_coefs[model_idx].append([])
            for score_idx in range(n_scores):
                x = scores_values[:, :, score_idx]          # [B, P]
                if avatars is not None:
                    y = avatars[:, score_idx, :, :]         # [B, P, R]
                else:
                    ss = {k: v[model_idx, val_idx, :, score_idx]
                          for k, v in suffstats.items()}    # each [B, R]
                if reg_method == "hierarchical":
                    if avatars is not None:
                        pvals, cfs, betas = \
                            hierarchical_regression_batch(x, y)
                    else:
                        pvals, cfs, betas = \
                            hierarchical_regression_from_stats(
                                x, ss["ysum"], ss["xysum"])
                    # per-score record: participant_id, site, per-roi betas
                    # (contract consumed by the ANOVA workflow,
                    # workflow.py:628-637)
                    rec = np.concatenate([
                        metadata[:, [participant_id_idx, site_idx]],
                        betas.astype(object)], axis=1)
                    all_coefs[model_idx][val_idx].append(rec)
                elif reg_method == "fixed":
                    if avatars is not None:
                        diff = (y - rois_rec[:, None, :]).reshape(-1,
                                                                  n_rois)
                        pvals, cfs = fixed_regression_batch(
                            x.reshape(-1), diff)
                    else:
                        pvals, cfs = fixed_regression_from_stats(
                            x, ss["ysum"], ss["xysum"], ss["yysum"],
                            offset_g=rois_rec)
                else:  # mixed — REML, all rois profiled together
                    if avatars is not None:
                        from .stats import mixed_regression_batch
                        pvals, cfs = mixed_regression_batch(x, y)
                    else:
                        pvals, cfs = mixed_regression_from_stats(
                            x, ss["ysum"], ss["xysum"], ss["yysum"])
                pvalues[model_idx, val_idx, score_idx] = pvals
                coefs[model_idx, val_idx, score_idx] = cfs

    out_pvalues, out_coefs = pvalues, coefs
    out_all_coefs = all_coefs
    if n_models == 1:
        out_pvalues = pvalues[0]
        out_coefs = coefs[0]
        out_all_coefs = all_coefs[0]
    np.save(os.path.join(resdir, "pvalues.npy"), out_pvalues)
    np.save(os.path.join(resdir, "coefs.npy"), out_coefs)
    if reg_method == "hierarchical":
        np.save(os.path.join(resdir, "all_coefs.npy"),
                np.asarray(out_all_coefs, dtype=object))
    print_text(f"p_values: {out_pvalues.shape}")
    print_text(f"regression coefficients: {out_coefs.shape}")

    print_subtitle("Compute statistics significativity...")
    significativity_thr = 0.05 / n_rois / n_scores
    vote_level = n_validation * trust_level
    print_text(f"voting trust level: {vote_level} / {n_validation}")
    idx_sign = ((pvalues < significativity_thr).sum(axis=1) >= vote_level)
    idx_sign = idx_sign.sum(0) >= vote_prop * n_models

    data = {"metric": [], "roi": [], "score": []}
    for idx, score in enumerate(clinical_names):
        rois_idx = np.where(idx_sign[idx])
        for name in np.asarray(rois_names)[rois_idx]:
            name, metric = str(name).rsplit("_", 1)
            data["score"].append(score)
            data["metric"].append(metric)
            data["roi"].append(name)
    df = pd.DataFrame.from_dict(data)
    significant_file = os.path.join(resdir, "significant_rois.tsv")
    df.to_csv(significant_file, sep="\t", index=False)
    print_result(f"significant ROIs: {significant_file}")
    if len(df):
        print(df.groupby(["metric", "score"]).count())
    return df
