"""Chunked epoch driver: K epochs per device dispatch.

Through the axon relay each dispatch costs ~10-25 ms and each metric fetch
~25 ms; at reference scale (550 epochs x ~6 round-trips/epoch) the relay,
not compute, dominates wall clock (BASELINE.md round 3: ~350 s wall for
~5 s of kernel time). This driver chains the epochs between two host
events into ONE jitted nested ``lax.scan`` whose inner body is the full
epoch — fused Pallas train kernel, grouped remainder scans, and the test
pass — so a chunk costs 2-3 relay round-trips regardless of its length.
Checkpoint boundaries (every 5 epochs, ``run_epochs.py:243-256``) do not
even end a chunk: the outer scan iterates 5-epoch segments and emits each
boundary's params/opt as stacked snapshot outputs, which the host fetches
AFTER dispatching the next chunk (overlapping the transfer with compute);
only NLL/PRD cadence and the end of training require the host loop.

Two properties of the data pipeline make the chunk a single static
program:

* **Shape stationarity** — presence groups are fixed per cohort, so every
  epoch has the same batch partition ``(pattern, rows) -> n_batches``
  (``data/sampler.py``); only the row membership reshuffles.
* **Row determinism** — ``MultimodalDataset.gather`` is a pure row lookup
  plus fitted per-row scalers (``data/dataset.py:157-178``), so the fully
  transformed blocks can live **resident on the device** and each epoch
  ships only int32 row indices (~KBs) instead of re-uploading the gathered
  float batches (~1.3 MB/epoch over the ~15 MB/s relay).

The per-epoch RNG split chain runs *inside* the traced body in exactly the
order of :func:`trainer.train_one_epoch` / :func:`trainer.test_one_epoch`,
and remainder groups execute in sorted-key order in both drivers, so
chunked and per-epoch training are numerically identical (same ops, same
order, same keys) — pinned by ``tests/test_chunked.py``.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import MissingModalitySampler, simple_batches


# --------------------------------------------------------------------- plans

class EpochPlan:
    """Host-side partition of one training epoch into index arrays.

    ``fused_rows[m]`` is ``int32 [n_fused, B]`` of rows into the resident
    block of modality ``m``; ``groups`` maps the sorted remainder keys
    ``(present modalities, rows)`` to ``(rows_per_mod, enum_idx)`` where
    ``enum_idx`` is each batch's position in the general-batch enumeration
    (the rng-assignment order of the per-epoch driver).
    """

    def __init__(self, fused_rows, groups, n_general, epoch: int = 0):
        self.fused_rows = fused_rows            # {mod: [n_fused, B]} | None
        self.groups = groups                    # {key: (rows, enum_idx)}
        self.n_general = n_general
        self.epoch = epoch                      # absolute epoch (rng keying)

    @property
    def n_fused(self):
        if self.fused_rows is None:
            return 0
        return next(iter(self.fused_rows.values())).shape[0]

    def structure(self):
        return (self.n_fused,
                tuple((k, v[1].shape[0]) for k, v in self.groups.items()),
                self.n_general)


class EvalPlan:
    """Same, for the test pass (``scan`` batches are full complete-modality
    ones; ``groups`` hold the remainder with per-batch emission positions)."""

    def __init__(self, scan_rows, groups, n_others):
        self.scan_rows = scan_rows              # {mod: [n_sc, B]} | None
        self.groups = groups                    # {key: (rows, emit_idx)}
        self.n_others = n_others

    @property
    def n_scan(self):
        if self.scan_rows is None:
            return 0
        return next(iter(self.scan_rows.values())).shape[0]

    def structure(self):
        return (self.n_scan,
                tuple((k, v[1].shape[0]) for k, v in self.groups.items()),
                self.n_others)


def _batch_rows(dataset, idxs: np.ndarray, mod_names):
    """(present modalities, {mod: resident row indices}) for one batch."""
    true = (dataset.indices[idxs] if dataset.indices is not None else idxs)
    present = tuple(m for m in mod_names if dataset._present[m][true].all())
    rows = {m: dataset._row_idx[m][true].astype(np.int32) for m in present}
    return present, rows


def _group(items, mod_names, batch_size):
    """items: [(emit_idx, present, rows, n)] -> canonically ordered group
    dict (insertion order == the sequential driver's processing order)."""
    from .trainer import canonical_group_order

    grouped: Dict = {}
    for i, present, rows, n in items:
        grouped.setdefault((tuple(sorted(present)), n), []).append((i, rows))
    groups = {}
    for key in canonical_group_order(grouped, mod_names, batch_size):
        pairs = grouped[key]
        rows = {m: np.stack([r[m] for _, r in pairs]) for m in key[0]}
        idx = np.asarray([i for i, _ in pairs], dtype=np.int32)
        groups[key] = (rows, idx)
    return groups


def plan_train_epoch(cfg, dataset, mod_names, epoch: int,
                     fused_on: bool) -> EpochPlan:
    """Mirror of ``trainer.train_one_epoch``'s batch partition, as indices."""
    sampler = MissingModalitySampler(dataset, batch_size=cfg.batch_size,
                                     indices=dataset.indices,
                                     seed=cfg.seed + epoch)
    fused, general = [], []
    for idxs in sampler:
        idxs = np.asarray(idxs)
        present, rows = _batch_rows(dataset, idxs, mod_names)
        if (fused_on and len(idxs) == cfg.batch_size
                and len(present) == len(mod_names)):
            fused.append(rows)
        else:
            general.append((len(general), present, rows, len(idxs)))
    fused_rows = None
    if fused:
        fused_rows = {m: np.stack([b[m] for b in fused]) for m in mod_names}
    return EpochPlan(fused_rows,
                     _group(general, mod_names, cfg.batch_size),
                     len(general), epoch=epoch)


def plan_eval_epoch(cfg, dataset, mod_names, epoch: int) -> EvalPlan:
    """Mirror of ``trainer.test_one_epoch``'s batch partition, as indices."""
    batches = simple_batches(len(dataset), cfg.batch_size,
                             np.random.default_rng(cfg.seed + epoch))
    scannable, others = [], []
    for idxs in batches:
        idxs = np.asarray(idxs)
        present, rows = _batch_rows(dataset, idxs, mod_names)
        if not present:
            continue
        if len(idxs) == cfg.batch_size and len(present) == len(mod_names):
            scannable.append(rows)
        else:
            others.append((len(others), present, rows, len(idxs)))
    scan_rows = None
    if scannable:
        scan_rows = {m: np.stack([b[m] for b in scannable])
                     for m in mod_names}
    # a complete-modality full-size key cannot appear here (it would have
    # been scannable), so canonical order reduces to plain sorted
    return EvalPlan(scan_rows, _group(others, mod_names, cfg.batch_size),
                    len(others))


def make_resident(dataset, mod_names) -> Dict[str, np.ndarray]:
    """Fully transformed modality blocks, ready for on-device row gather.

    Applying the fitted scalers to the whole block once is exactly
    equivalent to transforming each gathered batch (``dataset.gather``,
    ``data/dataset.py:157-178``): the on-the-fly transforms are row-wise.
    """
    out = {}
    for m in mod_names:
        arr = np.asarray(dataset.data[m], dtype=np.float32)
        out[m] = np.asarray(dataset._apply_otf(m, arr), dtype=np.float32)
    return out


# ------------------------------------------------------------ chunk program

def _split_chain(rng, n: int):
    """n sequential ``rng, sub = split(rng)`` draws; matches the per-epoch
    driver's stream exactly (order is observable in the trained weights)."""
    keys = []
    for _ in range(n):
        rng, sub = jax.random.split(rng)
        keys.append(sub)
    return rng, (jnp.stack(keys) if keys else None)


def trim_opt_snapshots(cfg, snap_o):
    """Apply ``cfg.save_optimizer`` to the per-segment opt snapshots ON
    DEVICE (inside the chunk jit), so rows the host will not write to disk
    never cross the relay: "all" keeps every boundary, "latest" keeps only
    the newest (valid because whenever a chunk has checkpoint entries the
    last segment's end IS the last boundary), "none" drops them. The ONE
    policy point shared by the member and ensemble chunk programs."""
    if cfg.save_optimizer == "latest":
        return jax.tree_util.tree_map(lambda t: t[-1:], snap_o)
    if cfg.save_optimizer == "none":
        return None
    return snap_o


def _metric_keys(fn, *args) -> List[str]:
    """Metric-dict keys of a step fn via abstract evaluation (no compute).

    jax rebuilds dict outputs in sorted-key order on every jitted path, so
    sorted keys reproduce the per-epoch driver's CSV column order too."""
    out = jax.eval_shape(fn, *args)
    return sorted(out[-1])


class ChunkRunner:
    """Compiled K-epoch program + the host-side layout to unpack its metrics.

    Build once per (member, plan structure); ``__call__(params, opt_state,
    rng, xs)`` returns updated state, the threaded rng, and a ``[K, L]``
    float32 metric matrix whose columns follow ``self.segments`` — one
    ``(phase, names, n_steps)`` record per in-epoch dispatch group, in
    execution order.
    """

    def __init__(self, cfg, model, train_struct, eval_struct, fused_scan_fn,
                 resident_train, resident_eval, params, opt_state,
                 mesh=None):
        from .train_step import make_scan_eval_step, make_scan_train_step

        self.cfg = cfg
        self.train_struct = train_struct
        self.eval_struct = eval_struct
        n_fused, group_spec, n_general = train_struct
        n_esc, egroup_spec, n_eothers = eval_struct
        mod_names = [m.name for m in model.modalities]
        self.mod_names = mod_names
        # remainder groups follow the SAME policies as the per-epoch
        # driver's remainder_scan_factory: presence-/method-fused Pallas
        # kernels when eligible (trainer.make_group_fused_epoch), the
        # mesh_for_rows sharding rule otherwise — the drivers' numerical
        # equivalence depends on routing each group identically
        from .train_step import mesh_for_rows
        from .trainer import make_group_fused_epoch

        _scan_cache: Dict = {}

        def group_fn_for(key):
            fn = _scan_cache.get(key)
            if fn is None:
                if mesh is None:
                    fn = make_group_fused_epoch(cfg, model, key)
                if fn is None:
                    use_mesh = mesh_for_rows(mesh, key[1])
                    shared = ("general", use_mesh is not None)
                    fn = _scan_cache.get(shared)
                    if fn is None:
                        fn = _scan_cache[shared] = make_scan_train_step(
                            cfg, model, mesh=use_mesh, donate=False)
                _scan_cache[key] = fn
            return fn

        eval_fn = make_scan_eval_step(cfg, model)
        # residents are ARGUMENTS of the compiled chunk (not closure
        # constants): the program stays constant-free, so the persistent
        # compile cache hits across ensemble members and processes. On a
        # mesh they are replicated so every device can gather its rows.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            repl = NamedSharding(mesh, PartitionSpec())
            put = lambda a: jax.device_put(a, repl)  # noqa: E731
        else:
            put = jax.device_put
        self.resident = {m: put(np.asarray(resident_train[m]))
                         for m in resident_train}
        self.resident_eval = {m: put(np.asarray(resident_eval[m]))
                              for m in resident_eval}
        dims = {m: self.resident[m].shape[1] for m in self.resident}

        def tb(mods, rows, n_b):
            return ({m: jax.ShapeDtypeStruct((n_b, rows, dims[m]),
                                             jnp.float32) for m in mods},
                    jax.ShapeDtypeStruct((n_b, 2), jnp.uint32))

        # one (phase, metric names, n_steps) record per in-epoch dispatch
        self.segments: List[Tuple[str, List[str], int]] = []
        fused_keys: List[str] = []
        if n_fused:
            b, r = tb(mod_names, cfg.batch_size, n_fused)
            fused_keys = _metric_keys(fused_scan_fn, params, opt_state, b, r)
            self.segments.append(("train", fused_keys, n_fused))
        group_keys: List[List[str]] = []
        group_fns = []
        for (mods, rows), n_b in group_spec:
            b, r = tb(mods, rows, n_b)
            fn = group_fn_for((mods, rows))
            group_fns.append(fn)
            keys = _metric_keys(fn, params, opt_state, b, r)
            group_keys.append(keys)
            self.segments.append(("train", keys, n_b))
        esc_keys: List[str] = []
        if n_esc:
            b, r = tb(mod_names, cfg.batch_size, n_esc)
            esc_keys = _metric_keys(eval_fn, params, b, r)
            self.segments.append(("test", esc_keys, n_esc))
        egroup_keys: List[List[str]] = []
        for (mods, rows), n_b in egroup_spec:
            b, r = tb(mods, rows, n_b)
            keys = _metric_keys(eval_fn, params, b, r)
            egroup_keys.append(keys)
            self.segments.append(("test", keys, n_b))

        def make_epoch_body(resident_dev, eval_dev):
            return lambda carry, x: epoch_body(carry, x, resident_dev,
                                               eval_dev)

        def epoch_body(carry, x, resident_dev, eval_dev):
            # the carried key is the member's BASE key, never advanced:
            # each epoch's stream is fold_in(base, epoch), exactly the
            # per-epoch driver's derivation, so resume from any epoch
            # replays the uninterrupted run's stream bit-for-bit
            p, o, rng0 = carry
            rng = jax.random.fold_in(rng0, x["epoch"])
            outs = []
            if n_fused:
                rng, sub = jax.random.split(rng)
                frngs = jax.random.split(sub, n_fused)
                fb = {m: resident_dev[m][x["fused"][m]] for m in mod_names}
                p, o, _, fm = fused_scan_fn(p, o, fb, frngs)
                outs += [fm[k] for k in fused_keys]
            if n_general:
                rng, subs = _split_chain(rng, n_general)
            for gi, ((mods, rows), n_b) in enumerate(group_spec):
                gb = {m: resident_dev[m][x["groups"][gi][m]] for m in mods}
                p, o, _, gm = group_fns[gi](p, o, gb, subs[x["genum"][gi]])
                outs += [gm[k] for k in group_keys[gi]]
            if n_esc:
                rng, sub = jax.random.split(rng)
                erngs = jax.random.split(sub, n_esc)
                eb = {m: eval_dev[m][x["esc"][m]] for m in mod_names}
                _, em = eval_fn(p, eb, erngs)
                outs += [em[k] for k in esc_keys]
            if n_eothers:
                rng, esubs = _split_chain(rng, n_eothers)
            for gi, ((mods, rows), n_b) in enumerate(egroup_spec):
                eb = {m: eval_dev[m][x["egroups"][gi][m]] for m in mods}
                _, em = eval_fn(p, eb, esubs[x["eenum"][gi]])
                outs += [em[k] for k in egroup_keys[gi]]
            flat = (jnp.concatenate(
                [jnp.asarray(v, jnp.float32).reshape(-1) for v in outs])
                if outs else jnp.zeros((0,), jnp.float32))
            return (p, o, rng0), flat

        def run_chunk(params, opt_state, rng, resident_dev, eval_dev, xs):
            # xs leaves are [n_seg, seg_len, ...]: an outer scan over
            # checkpoint-cadence segments whose ys are the boundary
            # params/opt snapshots (stacked into fresh buffers by the scan
            # itself — no extra copy dispatch), and an inner scan over the
            # segment's epochs. One dispatch therefore spans MANY
            # checkpoint boundaries; the host fetches the stacked
            # snapshots afterwards, overlapped with the next chunk.
            body = make_epoch_body(resident_dev, eval_dev)

            def seg_body(carry, seg_xs):
                carry, flat = jax.lax.scan(body, carry, seg_xs)
                p, o, _ = carry
                return carry, (flat, p, o)

            (params, opt_state, rng), (flat, snap_p, snap_o) = jax.lax.scan(
                seg_body, (params, opt_state, rng), xs)
            flat = flat.reshape(-1, flat.shape[-1])  # [n_seg*seg_len, L]
            # the opt tree is ~2x the params; at reference scale it is the
            # dominant checkpoint transfer over the relay
            return (params, opt_state, rng, flat, snap_p,
                    trim_opt_snapshots(cfg, snap_o))

        donate = (0, 1) if cfg.donate_buffers else ()
        self._compiled = jax.jit(run_chunk, donate_argnums=donate)

    def __call__(self, params, opt_state, rng, xs):
        return self._compiled(params, opt_state, rng, self.resident,
                              self.resident_eval, xs)

    # ------------------------------------------------------------- host side
    def stack_xs(self, plans: List[EpochPlan], eplans: List[EvalPlan],
                 n_seg: int, seg_len: int):
        """Stack ``n_seg*seg_len`` per-epoch index plans into the chunk's
        xs pytree, shaped ``[n_seg, seg_len, ...]`` for the nested scan."""
        n_fused, group_spec, _ = self.train_struct
        n_esc, egroup_spec, _ = self.eval_struct

        def seg(arrs):
            a = np.stack(arrs)
            return a.reshape((n_seg, seg_len) + a.shape[1:])

        xs: Dict = {"epoch": seg([np.int32(p.epoch) for p in plans])}
        if n_fused:
            xs["fused"] = {m: seg([p.fused_rows[m] for p in plans])
                           for m in self.mod_names}
        xs["groups"], xs["genum"] = [], []
        for key, _ in group_spec:
            xs["groups"].append(
                {m: seg([p.groups[key][0][m] for p in plans])
                 for m in key[0]})
            xs["genum"].append(seg([p.groups[key][1] for p in plans]))
        if n_esc:
            xs["esc"] = {m: seg([p.scan_rows[m] for p in eplans])
                         for m in self.mod_names}
        xs["egroups"], xs["eenum"] = [], []
        for key, _ in egroup_spec:
            xs["egroups"].append(
                {m: seg([p.groups[key][0][m] for p in eplans])
                 for m in key[0]})
            xs["eenum"].append(seg([p.groups[key][1] for p in eplans]))
        return xs

    def write_logs(self, logger, flat_np: np.ndarray,
                   plans: List[EpochPlan], log_every: int = 1) -> None:
        """Replay the per-epoch drivers' logger write sequence from the
        fetched ``[K, L]`` metric matrix."""
        if logger is None:
            return
        n_fused, group_spec, _ = self.train_struct
        for k in range(flat_np.shape[0]):
            row = flat_np[k]
            off = 0
            seg_values = []
            for phase, names, n in self.segments:
                metrics = {}
                for name in names:
                    metrics[name] = row[off:off + n]
                    off += n
                seg_values.append((phase, n, metrics))
            si = 0
            if n_fused:
                _, n, metrics = seg_values[si]
                si += 1
                for i in range(0, n_fused, log_every):
                    logger.write_training_logs(
                        {name: metrics[name][i] for name in metrics})
            for key, n_b in group_spec:
                _, n, metrics = seg_values[si]
                si += 1
                enum_idx = plans[k].groups[key][1]
                for j in range(n_b):
                    if int(enum_idx[j]) % log_every == 0:
                        logger.write_training_logs(
                            {name: metrics[name][j] for name in metrics})
            for phase, n, metrics in seg_values[si:]:
                for j in range(n):
                    logger.write_testing_logs(
                        {name: metrics[name][j] for name in metrics})


def chunk_plan(cfg, epoch: int,
               profile_first: bool = False) -> Tuple[int, int]:
    """``(n_seg, seg_len)``: the segment structure of the next dispatch.

    A chunk is ``n_seg`` checkpoint-cadence segments of ``seg_len`` epochs
    each, chained into ONE device dispatch (``n_seg*seg_len`` epochs,
    capped at ``cfg.epoch_chunk``). Checkpoint boundaries (every 5 epochs,
    ``run_epochs.py:243-256``; plus the final epoch) do NOT break the
    chunk: the scan emits the boundary params/opt snapshots itself, so
    only events that run host code — NLL/PRD cadence, end of training, a
    profiling capture — end a chunk. An aligned start (``epoch % 5 == 0``)
    yields 5-epoch segments; a misaligned (resume) start yields one short
    segment up to the next boundary, realigning the following chunks.
    """
    if profile_first:
        return 1, 1

    def breaks_after(e: int) -> bool:
        """Must the host run between epoch ``e`` and ``e + 1``?"""
        from .trainer import eval_breaks_after  # one shared predicate
        if (e + 1) >= cfg.end_epoch:
            return True
        return eval_breaks_after(cfg, e + 1)

    k = 1
    while k < min(cfg.epoch_chunk, cfg.end_epoch - epoch) \
            and not breaks_after(epoch + k - 1):
        k += 1
    if epoch % 5 == 0 and k >= 5:
        return k // 5, 5
    if epoch % 5 != 0:
        return 1, min(k, 5 - epoch % 5)
    return 1, k
