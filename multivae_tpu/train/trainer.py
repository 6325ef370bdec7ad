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
from .train_step import (
    make_ensemble_scan_train_step,
    make_eval_step,
    make_scan_eval_step,
    make_train_step,
    stack_trees,
    unstack_tree,
)


def _to_device(batch: Dict[str, np.ndarray]):
    return {k: jax.numpy.asarray(v) for k, v in batch.items()}


def make_group_fused_epoch(cfg, model, key):
    """Pallas epoch trainer for a remainder-group ``key = (mods, rows)``, or
    ``None`` when the group is not kernel-eligible.

    THE one group-kernel policy, shared by the per-epoch driver's
    ``remainder_scan_factory`` and ``chunked.ChunkRunner`` so both drivers
    route the same groups to the same kernels (their numerical-equivalence
    pin, ``tests/test_chunked.py``, depends on it): complete partial-size
    groups take the method kernel, single-present groups (the
    ``allow_missing_blocks`` cohort reality, ``README.md:76-79`` +
    ``multiblock_fetcher.py:102-119``) the presence kernel — both work for
    any static row count, so at reference missingness EVERY training batch
    runs inside Pallas."""
    if not getattr(cfg, "fused_training", True):
        return None
    from ..ops import fused_methods as _fm
    from ..ops import fused_presence as _fp

    mods, _rows = key
    mod_names = [m.name for m in model.modalities]
    example = {m: None for m in mods}
    interpret = jax.default_backend() == "cpu"
    if len(mods) == len(mod_names):
        if _fm.supports_method_fused(cfg, model, example):
            return _fm.make_method_fused_epoch(cfg, model,
                                               interpret=interpret)
        return None
    if _fp.supports_presence_fused(cfg, model, example):
        mod_idx = mod_names.index(mods[0])
        return _fp.make_presence_fused_epoch(cfg, model, mod_idx,
                                             interpret=interpret)
    return None


def canonical_group_order(keys, mod_names, batch_size):
    """Deterministic processing order for (presence pattern, rows) groups.

    The complete-modality full-size group runs first — aligning the
    sequential driver with the ensemble path's scannable prefix
    (:func:`train_one_epoch_ensemble`) — then the remaining keys in sorted
    order. A fixed, epoch-independent order is what lets the chunked
    driver (train/chunked.py) compile one program for every epoch."""
    full = (tuple(sorted(mod_names)), batch_size)
    ordered = [full] if full in keys else []
    return ordered + sorted(k for k in keys if k != full)


def train_one_epoch(exp, model_idx, step_fn, logger: Optional[MetricLogger],
                    rng, log_every: int = 1, fused_scan_fn=None,
                    step_fn_remainder=None, shard_multiple: int = 1,
                    epoch: int = 0, remainder_scan_factory=None):
    cfg = exp.cfg
    dataset = exp.dataset_train
    sub_indices = None
    if cfg.num_models > 1:
        dataset = dataset[model_idx]
        sub_indices = dataset.indices
    # per-epoch reshuffle (the reference's DataLoader re-samples every epoch)
    sampler = MissingModalitySampler(dataset, batch_size=cfg.batch_size,
                                     indices=sub_indices,
                                     seed=cfg.seed + epoch)
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
        params, opt_state, losses, metrics = fused_scan_fn(
            params, opt_state, stacked, rngs)
        n_steps += len(fused_batches)
        if logger is not None:
            # full scalar families come back from the kernel per step
            # (utils/TBLogger.py:84-101 parity on the fused path)
            metrics = jax.device_get(metrics)
            for i in range(0, len(fused_batches), log_every):
                logger.write_training_logs(
                    {k: v[i] for k, v in metrics.items()})

    # pre-draw the per-batch keys in enumeration order (the sequential rng
    # stream), then run the remainder batches grouped by presence pattern —
    # one scanned dispatch + one metric fetch per group instead of one of
    # each per batch (per-batch dispatch ~10-25 ms and fetch ~25 ms through
    # the relay dominate small-cohort epochs). Group order follows first
    # appearance; like the fused-prefix split above, this reorders batches
    # relative to the sampler's emission — any seeded order is valid SGD.
    subs = []
    for _ in general_batches:
        rng, sub = jax.random.split(rng)
        subs.append(sub)
    groups: Dict = {}
    for i, data in enumerate(general_batches):
        key = (tuple(sorted(data)), len(next(iter(data.values()))))
        groups.setdefault(key, []).append(i)
    # canonical group order (not first appearance) so the chunked driver
    # (train/chunked.py) can replay the exact same update sequence
    for key in canonical_group_order(groups, mod_names, cfg.batch_size):
        idx_list = groups[key]
        if remainder_scan_factory is not None:
            # every group takes the scan path (n=1 groups included): the
            # factory may return a presence-/method-fused Pallas kernel, and
            # the chunked driver runs ALL groups through these fns — keeping
            # the drivers' update sequences identical requires doing so here
            scan_fn = remainder_scan_factory(key)
            stacked = {m: jax.numpy.asarray(
                np.stack([general_batches[i][m] for i in idx_list]))
                for m in key[0]}
            rngs_g = jax.numpy.stack([subs[i] for i in idx_list])
            params, opt_state, losses, metrics = scan_fn(
                params, opt_state, stacked, rngs_g)
            n_steps += len(idx_list)
            if logger is not None:
                metrics = jax.device_get(metrics)
                # same cadence as the per-batch path: log the steps whose
                # global enumeration index hits the log_every grid
                for j, i in enumerate(idx_list):
                    if i % log_every == 0:
                        logger.write_training_logs(
                            {k: v[j] for k, v in metrics.items()})
            continue
        for i in idx_list:
            data = general_batches[i]
            n_rows = len(next(iter(data.values())))
            fn = step_fn
            if (step_fn_remainder is not None
                    and n_rows % shard_multiple != 0):
                # a sharded batch axis must divide the mesh; remainder
                # batches take the unsharded step
                fn = step_fn_remainder
            params, opt_state, loss, metrics = fn(
                params, opt_state, _to_device(data), subs[i])
            n_steps += 1
            if logger is not None and i % log_every == 0:
                # one host transfer for the whole metric dict (per-item
                # np.asarray costs a ~2ms relay round-trip EACH)
                logger.write_training_logs(jax.device_get(metrics))
    exp.params[model_idx] = params
    exp.opt_states[model_idx] = opt_state
    return rng, n_steps


def resolve_ensemble(cfg, model) -> bool:
    """Whether to train ensemble members simultaneously over a model axis.

    ``cfg.ensemble_parallel`` may be True/False or ``"auto"``: auto enables
    the parallel path when members can actually spread over a (model, data)
    mesh, and otherwise (single chip, or indivisible device/model counts)
    only when the sequential path would NOT get the fused Pallas epoch
    kernel anyway (the fused kernel is the faster per-member option)."""
    if cfg.num_models <= 1:
        return False
    if getattr(cfg, "tensor_parallel", 1) > 1:
        # the ensemble drivers are not TP-aware; members train
        # sequentially, each tensor-sharded over the tp mesh
        return False
    if cfg.ensemble_parallel is True:
        return True
    if cfg.ensemble_parallel is False:
        return False
    if ensemble_mesh(cfg) is not None:
        return True
    if cfg.fused_training:
        from ..ops import fused_generic as _fg
        from ..ops import fused_methods as _fm
        from ..ops import fused_step as _fs
        example = {m.name: None for m in model.modalities}
        if (_fs.supports_fused(cfg, model, example)
                or _fm.supports_method_fused(cfg, model, example)
                or _fg.supports_generic_fused(cfg, model, example)):
            return False
    return True


def ensemble_mesh(cfg):
    """(model, data) mesh for ensemble training, or None on a single device
    (the vmapped step still batches all members into one dispatch)."""
    n_dev = len(jax.devices())
    if n_dev <= 1 or n_dev % cfg.num_models != 0:
        return None
    from ..parallel import make_mesh
    return make_mesh(n_model=cfg.num_models, n_data=n_dev // cfg.num_models)


def train_one_epoch_ensemble(exp, ens_scan_fn, step_fn, loggers, rngs,
                             log_every: int = 1, epoch: int = 0):
    """All-members epoch: one scanned+vmapped dispatch for the common
    complete-batch prefix, per-member general steps for the remainder.

    Per member the batch order and rng stream match the sequential
    (non-fused) path exactly, so training is numerically equivalent to the
    member loop it replaces (``run_epochs.py:228-241``)."""
    cfg = exp.cfg
    mod_names = [m.name for m in exp.model.modalities]
    n_models = cfg.num_models

    streams = []
    for m in range(n_models):
        dataset = exp.dataset_train[m]
        sampler = MissingModalitySampler(dataset, batch_size=cfg.batch_size,
                                         indices=dataset.indices,
                                         seed=cfg.seed + epoch)
        batches = []
        for idxs in sampler:
            data, _, _ = dataset.gather(idxs)
            batches.append(data)
        streams.append(batches)

    def is_scannable(data):
        return (len(next(iter(data.values()))) == cfg.batch_size
                and all(name in data for name in mod_names))

    # the common segment takes each member's first n_common scannable
    # batches IN STREAM ORDER (not necessarily a leading run — the sampler
    # permutes complete partial-subset batches among them). The effective
    # update sequence is unchanged by the split point: scannables run in
    # stream order either here or at the head of the canonical remainder
    # ((all-mods, B) sorts first), with the same per-stream-index rng subs.
    # Counting ALL scannables makes n_common a per-cohort constant
    # (floor(|all-mods subset|/B)), which keeps the chunked ensemble
    # driver's program structure identical across epochs.
    scan_idx = [[i for i, b in enumerate(batches) if is_scannable(b)]
                for batches in streams]
    n_common = min(len(s) for s in scan_idx)
    common_idx = [s[:n_common] for s in scan_idx]

    # per-member rng subs drawn in the same order as the sequential path
    subs = []
    for m in range(n_models):
        member_subs = []
        r = rngs[m]
        for _ in range(len(streams[m])):
            r, s = jax.random.split(r)
            member_subs.append(s)
        rngs[m] = r
        subs.append(member_subs)

    n_steps = 0
    if n_common > 0:
        stacked_params = stack_trees(exp.params)
        stacked_opt = stack_trees(exp.opt_states)
        grid = {name: jax.numpy.asarray(np.stack(
            [np.stack([streams[m][i][name] for i in common_idx[m]])
             for m in range(n_models)])) for name in mod_names}
        rng_grid = jax.numpy.stack(
            [jax.numpy.stack([subs[m][i] for i in common_idx[m]])
             for m in range(n_models)])
        stacked_params, stacked_opt, losses, metrics = ens_scan_fn(
            stacked_params, stacked_opt, grid, rng_grid)
        exp.params = unstack_tree(stacked_params, n_models)
        exp.opt_states = unstack_tree(stacked_opt, n_models)
        n_steps += n_common * n_models
        metrics = jax.device_get(metrics)
        for m in range(n_models):
            if loggers[m] is None:
                continue
            for pos, i in enumerate(common_idx[m]):
                if i % log_every == 0:  # cadence keys off the stream index
                    loggers[m].write_training_logs(
                        {k: v[m, pos] for k, v in metrics.items()})

    # remainder: missing-modality groups / partial batches, per member —
    # processed in the same canonical group order as the sequential driver
    # so both paths apply identical update sequences
    for m in range(n_models):
        params = exp.params[m]
        opt_state = exp.opt_states[m]
        in_common = set(common_idx[m])
        rgroups: Dict = {}
        for i in range(len(streams[m])):
            if i in in_common:
                continue
            data = streams[m][i]
            key = (tuple(sorted(data)), len(next(iter(data.values()))))
            rgroups.setdefault(key, []).append(i)
        for key in canonical_group_order(rgroups, mod_names,
                                         cfg.batch_size):
            for i in rgroups[key]:
                data = streams[m][i]
                params, opt_state, loss, metrics = step_fn(
                    params, opt_state, _to_device(data), subs[m][i])
                n_steps += 1
                if loggers[m] is not None and i % log_every == 0:
                    loggers[m].write_training_logs(
                        jax.device_get(metrics))
        exp.params[m] = params
        exp.opt_states[m] = opt_state
    return rngs, n_steps


def test_one_epoch(exp, model_idx, eval_fn, logger: Optional[MetricLogger],
                   rng, epoch: int, scan_eval_fn=None):
    cfg = exp.cfg
    dataset = exp.dataset_test
    if cfg.num_models > 1:
        dataset = dataset[model_idx]
    params = exp.params[model_idx]
    mod_names = [m.name for m in exp.model.modalities]
    batches = simple_batches(len(dataset), cfg.batch_size,
                             np.random.default_rng(cfg.seed + epoch))
    scannable, others = [], []
    for idxs in batches:
        data, _, _ = dataset.gather(idxs)
        if not data:
            continue
        if (scan_eval_fn is not None and len(idxs) == cfg.batch_size
                and all(m in data for m in mod_names)):
            scannable.append(data)
        else:
            others.append(data)
    if scannable:
        # whole test pass in one dispatch + one host fetch
        stacked = {m: jax.numpy.asarray(
            np.stack([d[m] for d in scannable])) for m in mod_names}
        rng, sub = jax.random.split(rng)
        rngs = jax.random.split(sub, len(scannable))
        _, metrics = scan_eval_fn(params, stacked, rngs)
        if logger is not None:
            metrics = jax.device_get(metrics)
            for i in range(len(scannable)):
                logger.write_testing_logs(
                    {k: v[i] for k, v in metrics.items()})
    # remainder test batches: grouped by (presence pattern, rows) in sorted
    # key order and scanned — one dispatch + one fetch per group instead of
    # one per batch, and the same canonical order the chunked driver uses.
    # rng subs are drawn in emission order, exactly as a per-batch loop.
    esubs = []
    for _ in others:
        rng, sub = jax.random.split(rng)
        esubs.append(sub)
    egroups: Dict = {}
    for i, data in enumerate(others):
        key = (tuple(sorted(data)), len(next(iter(data.values()))))
        egroups.setdefault(key, []).append(i)
    for key in sorted(egroups):
        idx_list = egroups[key]
        if scan_eval_fn is not None:
            stacked = {m: jax.numpy.asarray(
                np.stack([others[i][m] for i in idx_list]))
                for m in key[0]}
            _, metrics = scan_eval_fn(
                params, stacked, jax.numpy.stack([esubs[i]
                                                  for i in idx_list]))
            if logger is not None:
                metrics = jax.device_get(metrics)
                for j in range(len(idx_list)):
                    logger.write_testing_logs(
                        {k: v[j] for k, v in metrics.items()})
        else:
            for i in idx_list:
                loss, metrics = eval_fn(params, _to_device(others[i]),
                                        esubs[i])
                if logger is not None:
                    logger.write_testing_logs(jax.device_get(metrics))

    if eval_breaks_after(cfg, epoch + 1) or (epoch + 1) == cfg.end_epoch:
        run_eval_cadence(exp, model_idx, logger, epoch + 1)
    return rng


# evals riding the eval_freq cadence; calc_prd rides eval_freq_fid.
# THE one flag registry — eval_cadence_active, eval_breaks_after and
# run_eval_cadence all derive from it, so a new eval flag added here is
# automatically honored by the per-epoch driver AND the chunked drivers'
# chunk-boundary planning (train/chunked.py chunk_plan).
_EVAL_FREQ_FLAGS = ("calc_nll", "calc_clf", "calc_coherence")


def _any_eval_freq_flag(cfg) -> bool:
    return any(getattr(cfg, f, False) for f in _EVAL_FREQ_FLAGS)


def eval_cadence_active(cfg) -> bool:
    """Any eval hooked onto the ``eval_freq``/``eval_freq_fid`` cadence?"""
    return bool(_any_eval_freq_flag(cfg) or cfg.calc_prd)


def eval_breaks_after(cfg, epoch_done: int) -> bool:
    """Must the host run eval code after ``epoch_done`` epochs?

    The chunk-boundary predicate used by ``train/chunked.py:chunk_plan``
    — kept here next to the flag registry so cadence flags cannot
    silently diverge between the drivers."""
    if _any_eval_freq_flag(cfg) and epoch_done % cfg.eval_freq == 0:
        return True
    return bool(cfg.calc_prd and epoch_done % cfg.eval_freq_fid == 0)


def run_eval_cadence(exp, model_idx: int, logger, epoch_done: int) -> None:
    """Shared ``eval_freq`` cadence: IWAE likelihoods / PRD (reference
    ``run_epochs.py:211-219``) plus latent-probe classification and
    conditional-generation coherence (the evals the reference *intended* —
    ``representation.py:19-134``, ``coherence.py:15-119`` — but that crash
    upstream; fixed-forward behind ``calc_clf`` / ``calc_coherence``).

    Cadence gating lives HERE, per family: the ``eval_freq`` family
    (nll/clf/coherence) fires at ``eval_freq`` multiples, PRD at
    ``eval_freq_fid`` multiples, and both at the final epoch — so the
    drivers may call this at every epoch ``eval_breaks_after`` flags and
    each family still runs only on its own cadence (previously PRD was
    silently skipped at fid-only epochs when ``eval_freq_fid`` was not a
    multiple of ``eval_freq``)."""
    cfg = exp.cfg
    final = epoch_done == cfg.end_epoch
    on_freq = final or epoch_done % cfg.eval_freq == 0
    on_fid = cfg.calc_prd and (final or epoch_done % cfg.eval_freq_fid == 0)
    # one conditional-generation pass per cadence hit, shared between the
    # PRD and coherence evals (its rng is fixed, so both previously
    # dispatched the exact same device pass twice)
    _cond = []

    def cond_samples():
        if not _cond:
            from ..eval.sample_quality import generate_conditional_samples
            _cond.append(generate_conditional_samples(exp, model_idx))
        return _cond[0]

    if cfg.calc_nll and on_freq:
        from ..eval.likelihood import estimate_likelihoods
        lhoods = estimate_likelihoods(exp, model_idx)
        if logger is not None:
            logger.write_lhood_logs(lhoods)
    if on_fid:
        from ..eval.sample_quality import calc_prd_score
        prd = calc_prd_score(exp, model_idx, samples=cond_samples())
        if logger is not None:
            logger.write_prd_scores(prd)
    if getattr(cfg, "calc_clf", False) and on_freq:
        from ..eval.representation import (
            test_clf_lr_all_subsets, train_clf_lr_all_subsets)
        clfs = train_clf_lr_all_subsets(exp, model_idx)
        accs = test_clf_lr_all_subsets(exp, clfs, model_idx)
        if logger is not None and accs:
            logger.write_lr_eval(accs)
    if getattr(cfg, "calc_coherence", False) and on_freq:
        from ..eval.coherence import (
            evaluate_coherence, train_modality_classifiers)
        # the modality classifiers fit on the (static) train split —
        # train once per model and reuse across cadence hits
        cache = getattr(exp, "_modality_clfs", None)
        if cache is None:
            cache = exp._modality_clfs = {}
        if model_idx not in cache:
            cache[model_idx] = train_modality_classifiers(exp, model_idx)
        gen_eval = {}
        if cache[model_idx] is not None:
            gen_eval = evaluate_coherence(exp, model_idx,
                                          clfs=cache[model_idx],
                                          samples=cond_samples())
        if logger is not None and gen_eval:
            logger.write_coherence_logs(gen_eval)


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


def _run_member_chunked(exp, model_idx, fused_scan_fn, logger,
                        log_every: int = 1, progress: bool = True,
                        profile_dir: str | None = None, mesh=None):
    """Train one member with K epochs per device dispatch
    (:mod:`multivae_tpu.train.chunked`).

    Numerically identical to the per-epoch driver — same batch partition,
    same rng split chain, same sorted group order — but the whole
    train+test epoch body runs inside one nested ``lax.scan`` chained up
    to the next host event (NLL/PRD cadence, end of training). Checkpoint
    boundaries (every 5 epochs, ``run_epochs.py:243-256``) do not end a
    chunk: the scan's outer axis iterates 5-epoch segments and emits each
    boundary's params/opt as stacked snapshots, fetched after the NEXT
    chunk's dispatch so the transfer overlaps compute. At reference scale
    (550 epochs) this cuts the host loop from ~6 round-trips/epoch to ~2
    dispatches + 1 deferred fetch per ``epoch_chunk`` epochs."""
    from .chunked import (
        ChunkRunner,
        chunk_plan,
        make_resident,
        plan_eval_epoch,
        plan_train_epoch,
    )

    cfg = exp.cfg
    dataset = (exp.dataset_train[model_idx] if cfg.num_models > 1
               else exp.dataset_train)
    testset = (exp.dataset_test[model_idx] if cfg.num_models > 1
               else exp.dataset_test)
    mod_names = [m.name for m in exp.model.modalities]
    res_train = make_resident(dataset, mod_names)
    res_eval = make_resident(testset, mod_names)
    rng = jax.random.PRNGKey(cfg.seed + 1000 * model_idx)
    params = exp.params[model_idx]
    opt_state = exp.opt_states[model_idx]
    runners: Dict = {}
    t0 = time.time()
    epoch = cfg.start_epoch
    # Deferred checkpoints for the boundaries inside the chunk the device
    # just finished: (networks_dir, stacked_params, stacked_opt, entries)
    # where the snapshots are the chunk scan's own [n_seg, ...] ys and
    # entries lists (segment_index, ckpt_dir) per checkpoint boundary.
    # Draining AFTER the next chunk's dispatch overlaps the param
    # transfers and disk writes with device compute — the relay has no
    # async host copies, so dispatch-then-fetch deferral is the only
    # overlap available (same pattern as the DAA avatar fetch,
    # analysis/daa.py). At reference scale the 110 checkpoint fetches are
    # a large share of the training-loop wall clock. Metrics are NOT
    # deferred: small arrays fetched promptly take ~25 ms vs ~170 ms on
    # the deferred slow path (BASELINE.md).
    pending = None

    def drain(p):
        networks_dir, snap_p, snap_o, entries = p
        host_p = jax.device_get(snap_p)  # [n_seg, ...]; one fetch per leaf
        # snap_o follows cfg.save_optimizer: [n_seg, ...] ("all"),
        # [1, ...] holding only the newest boundary ("latest" — whenever
        # entries is non-empty the last segment's end IS the last
        # boundary), or None ("none")
        host_o = None if snap_o is None else jax.device_get(snap_o)
        row = None
        for si, ckpt_dir in entries:
            row = jax.tree_util.tree_map(lambda t: t[si], host_p)
            if host_o is None:
                opt_row = None
            elif cfg.save_optimizer == "latest":
                opt_row = (jax.tree_util.tree_map(lambda t: t[0], host_o)
                           if (si, ckpt_dir) == entries[-1] else None)
            else:
                opt_row = jax.tree_util.tree_map(lambda t: t[si], host_o)
            save_checkpoint(ckpt_dir, row, opt_row, cfg.model_save)
        # the enc_/dec_ dumps are overwritten at every save
        # (BaseMMVae.py:315-322) — only the last boundary's state is
        # observable, so write it once per chunk
        save_networks(networks_dir, row)

    while epoch < cfg.end_epoch:
        profile_first = (profile_dir is not None and model_idx == 0
                         and epoch == cfg.start_epoch)
        n_seg, seg_len = chunk_plan(cfg, epoch, profile_first=profile_first)
        k = n_seg * seg_len
        plans = [plan_train_epoch(cfg, dataset, mod_names, e,
                                  fused_scan_fn is not None)
                 for e in range(epoch, epoch + k)]
        eplans = [plan_eval_epoch(cfg, testset, mod_names, e)
                  for e in range(epoch, epoch + k)]
        struct = (plans[0].structure(), eplans[0].structure())
        # presence groups are fixed per cohort so every epoch shares the
        # partition structure; keep the guard anyway and shrink the chunk
        # to the structurally-identical prefix if it ever differs
        same = 1
        while same < k and (plans[same].structure(),
                            eplans[same].structure()) == struct:
            same += 1
        if same < k:  # keep whole segments; else a single short segment
            n_seg, seg_len = ((same // seg_len, seg_len)
                              if same >= seg_len else (1, same))
            k = n_seg * seg_len
            plans, eplans = plans[:k], eplans[:k]
        runner = runners.get(struct)
        if runner is None:
            runner = ChunkRunner(cfg, exp.model, struct[0], struct[1],
                                 fused_scan_fn, res_train, res_eval,
                                 params, opt_state, mesh=mesh)
            runners[struct] = runner
        xs = runner.stack_xs(plans, eplans, n_seg, seg_len)
        if profile_first:
            if pending is not None:
                drain(pending)  # keep prior host work out of the trace
                pending = None
            jax.profiler.start_trace(profile_dir)
        params, opt_state, rng, flat, snap_p, snap_o = runner(
            params, opt_state, rng, xs)
        if pending is not None:
            # previous chunk's boundary checkpoints: their snapshots
            # completed with that chunk, so this ~MBs fetch + disk write
            # runs while the chunk just dispatched computes
            drain(pending)
            pending = None
        # checkpoint boundaries inside this chunk fall on segment ends;
        # the scan emitted their params/opt as snap_p/snap_o rows
        entries = []
        for si in range(n_seg):
            e_seg = epoch + (si + 1) * seg_len - 1
            if (e_seg + 1) % 5 == 0 or (e_seg + 1) == cfg.end_epoch:
                entries.append(
                    (si, model_checkpoint_dir(cfg, model_idx, e_seg)))
        if entries:
            networks_dir = (os.path.dirname(entries[-1][1])
                            if cfg.num_models > 1 else cfg.dir_checkpoints)
            pending = (networks_dir, snap_p, snap_o, entries)
        epoch += k
        exp.params[model_idx] = params
        exp.opt_states[model_idx] = opt_state
        e = epoch - 1  # chunk boundary == last trained epoch
        # metrics are fetched EAGERLY: a small array fetched promptly after
        # its producing dispatch takes ~25 ms through the relay vs ~170 ms
        # on the deferred slow path (round-2 measurement, BASELINE.md)
        flat = np.asarray(flat)
        if profile_first:
            jax.profiler.stop_trace()
        runner.write_logs(logger, flat, plans, log_every)
        if (eval_breaks_after(cfg, e + 1) or (e + 1) == cfg.end_epoch) \
                and eval_cadence_active(cfg):
            run_eval_cadence(exp, model_idx, logger, e + 1)
        if progress:
            frac = (epoch - cfg.start_epoch) / max(
                cfg.end_epoch - cfg.start_epoch, 1)
            elapsed = time.time() - t0
            print(f"\r  model {model_idx}: epoch {epoch}/"
                  f"{cfg.end_epoch} ({100 * frac:.1f}%) "
                  f"[{elapsed:.1f}s]", end="", flush=True)
    if pending is not None:
        drain(pending)
    if progress:
        print()


def _run_ensemble_chunked(exp, ens_scan_fn, loggers, log_every: int = 1,
                          progress: bool = True, mesh=None):
    """All members, K epochs per dispatch
    (:mod:`multivae_tpu.train.chunked_ensemble`).

    Numerically identical to the per-epoch ensemble runner — same batch
    partition, same per-stream-index rng subs, same canonical group order
    — with the same segment-snapshot checkpointing as the single-member
    chunked driver (every member's boundary params/opt emitted by the
    chunk scan, fetched after the next chunk's dispatch)."""
    from .chunked import chunk_plan, make_resident, plan_eval_epoch
    from .chunked_ensemble import EnsembleChunkRunner, plan_ensemble_epoch

    cfg = exp.cfg
    mod_names = [m.name for m in exp.model.modalities]
    res_train = [make_resident(exp.dataset_train[m], mod_names)
                 for m in range(cfg.num_models)]
    res_eval = [make_resident(exp.dataset_test[m], mod_names)
                for m in range(cfg.num_models)]
    rngs = jax.numpy.stack([jax.random.PRNGKey(cfg.seed + 1000 * m)
                            for m in range(cfg.num_models)])
    params = stack_trees(exp.params)
    opt_state = stack_trees(exp.opt_states)
    runners: Dict = {}
    t0 = time.time()
    epoch = cfg.start_epoch
    pending = None

    def drain(p):
        snap_p, snap_o, entries = p
        host_p = jax.device_get(snap_p)  # [n_seg, M, ...]
        host_o = None if snap_o is None else jax.device_get(snap_o)
        last_si = entries[-1][0]
        for si, e_seg in entries:
            for m in range(cfg.num_models):
                ckpt_dir = model_checkpoint_dir(cfg, m, e_seg)
                row_p = jax.tree_util.tree_map(lambda t: t[si][m], host_p)
                if host_o is None:
                    row_o = None
                elif cfg.save_optimizer == "latest":
                    row_o = (jax.tree_util.tree_map(
                        lambda t: t[0][m], host_o)
                        if si == last_si else None)
                else:
                    row_o = jax.tree_util.tree_map(lambda t: t[si][m],
                                                   host_o)
                save_checkpoint(ckpt_dir, row_p, row_o, cfg.model_save)
                if si == last_si:
                    save_networks(os.path.dirname(ckpt_dir), row_p)

    while epoch < cfg.end_epoch:
        n_seg, seg_len = chunk_plan(cfg, epoch)
        k = n_seg * seg_len
        plans, eplans, ncs = [], [], []
        for e in range(epoch, epoch + k):
            nc, mplans = plan_ensemble_epoch(cfg, exp.dataset_train,
                                             mod_names, e)
            plans.append(mplans)
            ncs.append(nc)
            eplans.append([plan_eval_epoch(cfg, exp.dataset_test[m],
                                           mod_names, e)
                           for m in range(cfg.num_models)])
        n_common = ncs[0]
        struct = (n_common,
                  tuple(p.structure() for p in plans[0]),
                  tuple(p.structure() for p in eplans[0]))
        same = 1
        while same < k and (
                ncs[same],
                tuple(p.structure() for p in plans[same]),
                tuple(p.structure() for p in eplans[same])) == struct:
            same += 1
        if same < k:  # keep whole segments; else a single short segment
            n_seg, seg_len = ((same // seg_len, seg_len)
                              if same >= seg_len else (1, same))
            k = n_seg * seg_len
            plans, eplans = plans[:k], eplans[:k]
        runner = runners.get(struct)
        if runner is None:
            runner = EnsembleChunkRunner(
                cfg, exp.model, struct[1], struct[2], n_common, ens_scan_fn,
                res_train, res_eval, params, opt_state, mesh=mesh)
            runners[struct] = runner
        xs = runner.stack_xs(plans, eplans, n_seg, seg_len)
        params, opt_state, rngs, flat, snap_p, snap_o = runner(
            params, opt_state, rngs, xs)
        if pending is not None:
            drain(pending)
            pending = None
        entries = []
        for si in range(n_seg):
            e_seg = epoch + (si + 1) * seg_len - 1
            if (e_seg + 1) % 5 == 0 or (e_seg + 1) == cfg.end_epoch:
                entries.append((si, e_seg))
        if entries:
            pending = (snap_p, snap_o, entries)
        epoch += k
        flat = np.asarray(flat)
        runner.write_logs(loggers, flat, plans, log_every)
        e = epoch - 1
        if (eval_breaks_after(cfg, e + 1) or (e + 1) == cfg.end_epoch) \
                and eval_cadence_active(cfg):
            # chunk_plan breaks chunks at the eval cadence, so this runs
            # at exactly the epochs test_one_epoch would (same row order:
            # test logs, then likelihoods)
            exp.params = unstack_tree(params, cfg.num_models)
            for m in range(cfg.num_models):
                run_eval_cadence(exp, m, loggers[m], e + 1)
        if progress:
            frac = (epoch - cfg.start_epoch) / max(
                cfg.end_epoch - cfg.start_epoch, 1)
            print(f"\r  ensemble: epoch {epoch}/{cfg.end_epoch} "
                  f"({100 * frac:.1f}%) [{time.time() - t0:.1f}s]",
                  end="", flush=True)
    if pending is not None:
        drain(pending)
    exp.params = unstack_tree(params, cfg.num_models)
    exp.opt_states = unstack_tree(opt_state, cfg.num_models)
    if progress:
        print()


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
    if resolve_ensemble(cfg, exp.model):
        return run_epochs_ensemble(exp, use_tensorboard=use_tensorboard,
                                   log_every=log_every, progress=progress,
                                   profile_dir=profile_dir)
    mesh = None
    tp_m = None
    if cfg.tensor_parallel > 1:
        # GSPMD tensor parallelism: params shard over the hidden dim on a
        # ("data", "tensor") mesh; composes with data_parallel. The Pallas
        # kernels are single-device/data-parallel layouts, so TP runs the
        # general jitted path (at 256-wide MLPs TP is a scaling surface,
        # not a single-chip win — SURVEY §2.6).
        from ..parallel import tp_mesh
        from .train_step import make_tp_scan_train_step, make_tp_train_step
        tp_m = tp_mesh(cfg.tensor_parallel, n_data=cfg.data_parallel)
        # per-step path: shard the batch over the data axis when its rows
        # divide it (full batches), replicate otherwise (missing-modality
        # groups, last partial batches) — mirrors the remainder policy
        _tp_sharded = make_tp_train_step(cfg, exp.model, tp_m,
                                         donate=cfg.donate_buffers,
                                         shard_batch=True)
        _tp_repl = make_tp_train_step(cfg, exp.model, tp_m,
                                      donate=cfg.donate_buffers,
                                      shard_batch=False)

        def step_fn(params, opt_state, batch, rng):
            rows = len(next(iter(batch.values())))
            fn = (_tp_sharded if rows % cfg.data_parallel == 0
                  else _tp_repl)
            return fn(params, opt_state, batch, rng)

        step_fn_remainder = None
    elif cfg.data_parallel > 1:
        # shard the batch over a data mesh (new capability; the fused
        # single-device kernel is bypassed in this mode)
        from ..parallel import data_mesh
        mesh = data_mesh(cfg.data_parallel)
    if tp_m is None:
        step_fn = make_train_step(cfg, exp.model, mesh=mesh,
                                  donate=cfg.donate_buffers)
        step_fn_remainder = (make_train_step(cfg, exp.model,
                                             donate=cfg.donate_buffers)
                             if mesh is not None else None)
    eval_fn = make_eval_step(cfg, exp.model)
    scan_eval_fn = make_scan_eval_step(cfg, exp.model)
    fused_scan_fn = None
    if cfg.fused_training and tp_m is not None:
        fused_scan_fn = make_tp_scan_train_step(
            cfg, exp.model, tp_m, donate=cfg.donate_buffers,
            shard_batch=cfg.batch_size % cfg.data_parallel == 0)
    elif cfg.fused_training:
        from ..ops import fused_generic as _fg
        from ..ops import fused_step as _fs
        example = {m.name: None for m in exp.model.modalities}
        interpret = jax.default_backend() == "cpu"
        from ..ops import fused_methods as _fm
        if mesh is None:
            if _fs.supports_fused(cfg, exp.model, example):
                # hand-derived flagship kernel (fastest)
                from .train_step import make_optimizer
                fused_scan_fn = _fs.make_fused_scan_train_step(
                    cfg, exp.model, make_optimizer(cfg),
                    interpret=interpret)
            elif _fm.supports_method_fused(cfg, exp.model, example):
                # split-param kernel with in-kernel autodiff: moe/poe/jsd
                # on the flagship architecture at hand-kernel speed
                fused_scan_fn = _fm.make_method_fused_epoch(
                    cfg, exp.model, interpret=interpret)
            elif _fg.supports_generic_fused(cfg, exp.model, example):
                # autodiff-in-Pallas epoch kernel (any method/architecture)
                fused_scan_fn = _fg.make_generic_fused_epoch(
                    cfg, exp.model, interpret=interpret)
        elif ((_fs.supports_fused(cfg, exp.model, example)
               or _fm.supports_method_fused(cfg, exp.model, example))
              and cfg.batch_size % cfg.data_parallel == 0):
            # data-parallel keeps the Pallas kernel: per-step fwd+bwd on
            # each device's row slice under shard_map, gradient psum over
            # ICI (mirrors the DAA sweep composition, analysis/daa.py)
            from ..ops.fused_sharded import make_fused_dp_scan_train_step
            fused_scan_fn = make_fused_dp_scan_train_step(cfg, exp.model,
                                                          mesh)
        if fused_scan_fn is None and (
                mesh is None or cfg.batch_size % cfg.data_parallel == 0):
            # universal fallback: XLA lax.scan over the epoch's complete
            # batches — one device dispatch per epoch for EVERY config
            # (dropout, deep decoders, per-sample scales, data-parallel),
            # instead of one ~2 ms dispatch per step
            from .train_step import make_scan_train_step
            fused_scan_fn = make_scan_train_step(cfg, exp.model, mesh=mesh,
                                                 donate=cfg.donate_buffers)
    # per-(presence pattern, rows) scanned remainder steps, compiled once
    # per run and reused across epochs/members. Gated on fused_training so
    # disabling it restores true per-step dispatch (debugging/instrumentation
    # parity with the reference's loop); groups whose rows divide the data
    # mesh keep their sharding, and donation follows cfg.donate_buffers.
    remainder_scan_cache: Dict = {}

    def remainder_scan_factory(key):
        scan_fn = remainder_scan_cache.get(key)
        if scan_fn is None:
            if tp_m is not None:
                from .train_step import make_tp_scan_train_step as _mk
                scan_fn = _mk(cfg, exp.model, tp_m,
                              donate=cfg.donate_buffers,
                              shard_batch=key[1] % cfg.data_parallel == 0)
            else:
                if mesh is None:
                    # presence-/method-fused Pallas kernel when eligible
                    scan_fn = make_group_fused_epoch(cfg, exp.model, key)
                if scan_fn is None:
                    from .train_step import (make_scan_train_step,
                                             mesh_for_rows)
                    scan_fn = make_scan_train_step(
                        cfg, exp.model, mesh=mesh_for_rows(mesh, key[1]),
                        donate=cfg.donate_buffers)
            remainder_scan_cache[key] = scan_fn
        return scan_fn

    if not cfg.fused_training:
        remainder_scan_factory = None
    # K-epochs-per-dispatch driver whenever an epoch-level scan fn exists
    # (single-device or data-parallel — any mesh-eligible fused_scan_fn is
    # already batch-divisible); numerically identical to the loop below
    use_chunked = (cfg.epoch_chunk > 1 and fused_scan_fn is not None
                   and tp_m is None)  # the chunked driver is not TP-aware
    print("training epochs progress:")
    for model_idx in range(cfg.num_models):
        logger = MetricLogger(model_log_dir(cfg, model_idx),
                              use_tensorboard=use_tensorboard)
        logger.add_text("FLAGS", cfg.describe())
        if use_chunked:
            _run_member_chunked(exp, model_idx, fused_scan_fn, logger,
                                log_every=log_every, progress=progress,
                                profile_dir=profile_dir, mesh=mesh)
            logger.close()
            continue
        base_rng = jax.random.PRNGKey(cfg.seed + 1000 * model_idx)
        t0 = time.time()
        for epoch in range(cfg.start_epoch, cfg.end_epoch):
            if (profile_dir is not None and model_idx == 0
                    and epoch == cfg.start_epoch):
                jax.profiler.start_trace(profile_dir)
            # epoch-keyed rng: each epoch's stream is a pure function of
            # (seed, model_idx, epoch), so a resumed run replays the exact
            # stream of the uninterrupted run from cfg.start_epoch on —
            # the property the crash-resume fault test pins. The chunked
            # drivers fold identically inside their scans.
            rng = jax.random.fold_in(base_rng, epoch)
            rng, n_steps = train_one_epoch(
                exp, model_idx, step_fn, logger, rng, log_every,
                fused_scan_fn=fused_scan_fn,
                step_fn_remainder=step_fn_remainder,
                shard_multiple=cfg.data_parallel, epoch=epoch,
                remainder_scan_factory=remainder_scan_factory)
            test_one_epoch(exp, model_idx, eval_fn, logger, rng,
                           epoch, scan_eval_fn=scan_eval_fn)
            if (profile_dir is not None and model_idx == 0
                    and epoch == cfg.start_epoch):
                jax.profiler.stop_trace()
            if (epoch + 1) % 5 == 0 or (epoch + 1) == cfg.end_epoch:
                ckpt_dir = model_checkpoint_dir(cfg, model_idx, epoch)
                host_p = jax.device_get(exp.params[model_idx])  # fetch once
                # per-epoch driver: every boundary is the newest at write
                # time, so "latest" keeps writing opt_state here
                save_checkpoint(ckpt_dir, host_p,
                                exp.opt_states[model_idx]
                                if cfg.save_optimizer != "none" else None,
                                cfg.model_save)
                save_networks(os.path.dirname(ckpt_dir)
                              if cfg.num_models > 1 else cfg.dir_checkpoints,
                              host_p)
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


def run_epochs_ensemble(exp, use_tensorboard: bool = True,
                        log_every: int = 1, progress: bool = True,
                        profile_dir: str | None = None):
    """Ensemble-parallel epoch runner: all members advance together each
    epoch via :func:`make_ensemble_scan_train_step` (model axis over the
    mesh when devices allow, one vmapped dispatch otherwise).

    Replaces the sequential member loop of the reference
    (``run_epochs.py:228-241``) — the "natural TPU win" of SURVEY §2.6.
    Per-member logs, checkpoints and eval cadence are identical to the
    sequential path."""
    cfg = exp.cfg
    mesh = ensemble_mesh(cfg)
    chunk_mesh = mesh
    ens_scan_fn = None
    if cfg.fused_training and mesh is not None:
        from ..ops import fused_methods as _fm
        from ..ops import fused_step as _fs
        example = {m.name: None for m in exp.model.modalities}
        if (_fs.supports_fused(cfg, exp.model, example)
                or _fm.supports_method_fused(cfg, exp.model, example)):
            # members shard over the model axis and each runs the
            # resident-VMEM Pallas epoch kernel — full single-chip kernel
            # speed per member, zero collectives (the members are
            # independent; replaces run_epochs.py:228-241). Uses one
            # device per member (the first data-column of the mesh); the
            # kernel's ~10x per-member speedup beats spreading the general
            # step over the extra data-axis devices at this model scale.
            from ..ops.fused_sharded import make_fused_ensemble_epoch
            mdevs = np.asarray(mesh.devices)[:, 0]
            mmesh = jax.sharding.Mesh(mdevs, ("model",))
            ens_scan_fn = make_fused_ensemble_epoch(cfg, exp.model, mmesh)
            # the chunked driver must place its whole program on the same
            # devices the kernel pins (it device_puts onto mmesh inside)
            chunk_mesh = mmesh
    if ens_scan_fn is None:
        ens_scan_fn = make_ensemble_scan_train_step(cfg, exp.model,
                                                    mesh=mesh)
    loggers = [MetricLogger(model_log_dir(cfg, m),
                            use_tensorboard=use_tensorboard)
               for m in range(cfg.num_models)]
    for logger in loggers:
        logger.add_text("FLAGS", cfg.describe())
    mesh_desc = (f"mesh model={mesh.shape['model']} data={mesh.shape['data']}"
                 if mesh is not None else "single device, vmapped members")
    print(f"training epochs progress (ensemble of {cfg.num_models}, "
          f"{mesh_desc}):")
    # K-epochs-per-dispatch driver (profiling uses the per-epoch loop so
    # the first-epoch trace stays a single clean dispatch window)
    if cfg.epoch_chunk > 1 and profile_dir is None:
        _run_ensemble_chunked(exp, ens_scan_fn, loggers,
                              log_every=log_every, progress=progress,
                              mesh=chunk_mesh)
        for logger in loggers:
            logger.close()
        return
    # per-epoch-only machinery (unused on the chunked default path)
    step_fn = make_train_step(cfg, exp.model, donate=cfg.donate_buffers)
    eval_fn = make_eval_step(cfg, exp.model)
    scan_eval_fn = make_scan_eval_step(cfg, exp.model)
    base_rngs = [jax.random.PRNGKey(cfg.seed + 1000 * m)
                 for m in range(cfg.num_models)]
    t0 = time.time()
    for epoch in range(cfg.start_epoch, cfg.end_epoch):
        if profile_dir is not None and epoch == cfg.start_epoch:
            jax.profiler.start_trace(profile_dir)
        # epoch-keyed rng (see the single-member loop): resume replays the
        # uninterrupted stream exactly
        rngs = [jax.random.fold_in(b, epoch) for b in base_rngs]
        rngs, _ = train_one_epoch_ensemble(exp, ens_scan_fn, step_fn,
                                           loggers, rngs, log_every,
                                           epoch=epoch)
        for m in range(cfg.num_models):
            test_one_epoch(exp, m, eval_fn, loggers[m], rngs[m],
                           epoch, scan_eval_fn=scan_eval_fn)
        if profile_dir is not None and epoch == cfg.start_epoch:
            jax.profiler.stop_trace()
        if (epoch + 1) % 5 == 0 or (epoch + 1) == cfg.end_epoch:
            for m in range(cfg.num_models):
                ckpt_dir = model_checkpoint_dir(cfg, m, epoch)
                host_p = jax.device_get(exp.params[m])  # fetch once
                save_checkpoint(ckpt_dir, host_p,
                                exp.opt_states[m]
                                if cfg.save_optimizer != "none" else None,
                                cfg.model_save)
                save_networks(os.path.dirname(ckpt_dir), host_p)
        if progress:
            frac = (epoch + 1 - cfg.start_epoch) / max(
                cfg.end_epoch - cfg.start_epoch, 1)
            print(f"\r  ensemble: epoch {epoch + 1}/{cfg.end_epoch} "
                  f"({100 * frac:.1f}%) [{time.time() - t0:.1f}s]",
                  end="", flush=True)
    if progress:
        print()
    for logger in loggers:
        logger.close()
