"""Epoch runner: the reference's ``run_epochs`` (``experiments/run_epochs.py:
138-256``) rebuilt around jitted steps.

Per member: each epoch trains over subset-homogeneous batches and evaluates on
the test split, logging the reference's scalar families; checkpoints land in
``checkpoints/[model_i/]<epoch:04d>/model`` every 5 epochs and at the end.
NLL (IWAE) and PRD evaluation run at the configured cadence.

Host/device split: the sampler materializes numpy batches (vectorized
gathers); each distinct (presence pattern, batch size) pair compiles once and
is then replayed from the jit cache.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..data import MissingModalitySampler, simple_batches
from ..utils.filehandling import model_checkpoint_dir, model_log_dir
from .checkpoint import save_checkpoint, save_networks
from .logging import MetricLogger
from .train_step import make_eval_step, make_train_step


def _to_device(batch: Dict[str, np.ndarray]):
    return {k: jax.numpy.asarray(v) for k, v in batch.items()}


def train_one_epoch(exp, model_idx, step_fn, logger: Optional[MetricLogger],
                    rng, log_every: int = 1, fused_scan_fn=None,
                    step_fn_remainder=None, shard_multiple: int = 1):
    cfg = exp.cfg
    dataset = exp.dataset_train
    sub_indices = None
    if cfg.num_models > 1:
        dataset = dataset[model_idx]
        sub_indices = dataset.indices
    sampler = MissingModalitySampler(dataset, batch_size=cfg.batch_size,
                                     indices=sub_indices)
    params = exp.params[model_idx]
    opt_state = exp.opt_states[model_idx]
    n_steps = 0
    mod_names = [m.name for m in exp.model.modalities]

    all_batches = list(sampler)
    fused_batches, general_batches = [], []
    for idxs in all_batches:
        data, _, _ = dataset.gather(idxs)
        # fused epoch-scan handles full-size complete-modality batches; the
        # remainder (missing-modality groups, last partial batches) takes the
        # general per-step path
        if (fused_scan_fn is not None and len(idxs) == cfg.batch_size
                and all(m in data for m in mod_names)):
            fused_batches.append(data)
        else:
            general_batches.append(data)

    if fused_batches:
        stacked = {m: jax.numpy.asarray(
            np.stack([b[m] for b in fused_batches]))
            for m in mod_names}
        rng, sub = jax.random.split(rng)
        rngs = jax.random.split(sub, len(fused_batches))
        params, opt_state, losses = fused_scan_fn(params, opt_state,
                                                  stacked, rngs)
        n_steps += len(fused_batches)
        if logger is not None:
            for i, loss in enumerate(jax.device_get(losses)):
                if i % log_every == 0:
                    logger.write_training_logs({"loss": loss})

    for iteration, data in enumerate(general_batches):
        rng, sub = jax.random.split(rng)
        n_rows = len(next(iter(data.values())))
        fn = step_fn
        if (step_fn_remainder is not None
                and n_rows % shard_multiple != 0):
            # a sharded batch axis must divide the mesh; remainder batches
            # take the unsharded step
            fn = step_fn_remainder
        params, opt_state, loss, metrics = fn(
            params, opt_state, _to_device(data), sub)
        n_steps += 1
        if logger is not None and iteration % log_every == 0:
            # one host transfer for the whole metric dict (per-item
            # np.asarray costs a ~2ms relay round-trip EACH)
            logger.write_training_logs(jax.device_get(metrics))
    exp.params[model_idx] = params
    exp.opt_states[model_idx] = opt_state
    return rng, n_steps


def test_one_epoch(exp, model_idx, eval_fn, logger: Optional[MetricLogger],
                   rng, epoch: int):
    cfg = exp.cfg
    dataset = exp.dataset_test
    if cfg.num_models > 1:
        dataset = dataset[model_idx]
    params = exp.params[model_idx]
    batches = simple_batches(len(dataset), cfg.batch_size,
                             np.random.default_rng(cfg.seed + epoch))
    for idxs in batches:
        data, _, _ = dataset.gather(idxs)
        if not data:
            continue
        rng, sub = jax.random.split(rng)
        loss, metrics = eval_fn(params, _to_device(data), sub)
        if logger is not None:
            logger.write_testing_logs(jax.device_get(metrics))

    if ((epoch + 1) % cfg.eval_freq == 0 or (epoch + 1) == cfg.end_epoch):
        if cfg.calc_nll:
            from ..eval.likelihood import estimate_likelihoods
            lhoods = estimate_likelihoods(exp, model_idx)
            if logger is not None:
                logger.write_lhood_logs(lhoods)
        if cfg.calc_prd and ((epoch + 1) % cfg.eval_freq_fid == 0):
            from ..eval.sample_quality import calc_prd_score
            prd = calc_prd_score(exp, model_idx)
            if logger is not None:
                logger.write_prd_scores(prd)
    return rng


def resume_from_checkpoints(exp) -> int:
    """Restore params (and optimizer state when present) from the latest
    checkpoints; returns the epoch to resume from.

    The reference's restart story is ``--start_epoch``/``--load_saved``
    (``utils/BaseFlags.py:12,20``) plus latest-checkpoint discovery; here the
    optimizer state is restored too, so resume is exact.
    """
    from .checkpoint import find_checkpoint, restore_checkpoint, \
        restore_opt_state

    cfg = exp.cfg
    latest = 0
    for model_idx in range(cfg.num_models):
        path, epoch = find_checkpoint(cfg.dir_checkpoints, model_idx,
                                      cfg.num_models, None, cfg.model_save)
        exp.params[model_idx] = restore_checkpoint(
            path, exp.params[model_idx])
        restored = restore_opt_state(os.path.dirname(path),
                                     exp.opt_states[model_idx])
        if restored is not None:
            exp.opt_states[model_idx] = restored
        latest = max(latest, epoch + 1)
    cfg.start_epoch = latest
    return latest


def run_epochs(exp, use_tensorboard: bool = True, log_every: int = 1,
               progress: bool = True, profile_dir: str | None = None):
    """Train every ensemble member (``run_epochs.py:222-256``).

    ``profile_dir`` captures a ``jax.profiler`` trace of the first trained
    epoch (the reference has no tracing at all; SURVEY §5).
    """
    cfg = exp.cfg
    if cfg.load_saved:
        resume_from_checkpoints(exp)
    cfg.save(os.path.join(cfg.dir_experiment_run, "flags.json"))
    mesh = None
    if cfg.data_parallel > 1:
        # shard the batch over a data mesh (new capability; the fused
        # single-device kernel is bypassed in this mode)
        from ..parallel import data_mesh
        mesh = data_mesh(cfg.data_parallel)
    step_fn = make_train_step(cfg, exp.model, mesh=mesh)
    eval_fn = make_eval_step(cfg, exp.model)
    step_fn_remainder = (make_train_step(cfg, exp.model)
                         if mesh is not None else None)
    fused_scan_fn = None
    if cfg.fused_training and mesh is None:
        from ..ops import fused_generic as _fg
        from ..ops import fused_step as _fs
        example = {m.name: None for m in exp.model.modalities}
        interpret = jax.default_backend() == "cpu"
        if _fs.supports_fused(cfg, exp.model, example):
            # hand-derived flagship kernel (fastest)
            from .train_step import make_optimizer
            fused_scan_fn = _fs.make_fused_scan_train_step(
                cfg, exp.model, make_optimizer(cfg), interpret=interpret)
        elif _fg.supports_generic_fused(cfg, exp.model, example):
            # autodiff-in-Pallas epoch kernel (any method/architecture)
            fused_scan_fn = _fg.make_generic_fused_epoch(
                cfg, exp.model, interpret=interpret)
    print("training epochs progress:")
    for model_idx in range(cfg.num_models):
        logger = MetricLogger(model_log_dir(cfg, model_idx),
                              use_tensorboard=use_tensorboard)
        logger.add_text("FLAGS", cfg.describe())
        rng = jax.random.PRNGKey(cfg.seed + 1000 * model_idx)
        t0 = time.time()
        for epoch in range(cfg.start_epoch, cfg.end_epoch):
            if (profile_dir is not None and model_idx == 0
                    and epoch == cfg.start_epoch):
                jax.profiler.start_trace(profile_dir)
            rng, n_steps = train_one_epoch(
                exp, model_idx, step_fn, logger, rng, log_every,
                fused_scan_fn=fused_scan_fn,
                step_fn_remainder=step_fn_remainder,
                shard_multiple=cfg.data_parallel)
            rng = test_one_epoch(exp, model_idx, eval_fn, logger, rng, epoch)
            if (profile_dir is not None and model_idx == 0
                    and epoch == cfg.start_epoch):
                jax.profiler.stop_trace()
            if (epoch + 1) % 5 == 0 or (epoch + 1) == cfg.end_epoch:
                ckpt_dir = model_checkpoint_dir(cfg, model_idx, epoch)
                save_checkpoint(ckpt_dir, exp.params[model_idx],
                                exp.opt_states[model_idx], cfg.model_save)
                save_networks(os.path.dirname(ckpt_dir)
                              if cfg.num_models > 1 else cfg.dir_checkpoints,
                              exp.params[model_idx])
            if progress:
                frac = (epoch + 1 - cfg.start_epoch) / max(
                    cfg.end_epoch - cfg.start_epoch, 1)
                elapsed = time.time() - t0
                print(f"\r  model {model_idx}: epoch {epoch + 1}/"
                      f"{cfg.end_epoch} ({100 * frac:.1f}%) "
                      f"[{elapsed:.1f}s]", end="", flush=True)
        if progress:
            print()
        logger.close()
