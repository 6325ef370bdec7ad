"""Chunked ensemble driver: K epochs of ALL members per device dispatch.

The ensemble epoch runner (``trainer.run_epochs_ensemble``, replacing the
reference's sequential member loop ``run_epochs.py:228-241``) used to pay
per-epoch host costs for every member: gathering + uploading each member's
batches, one dispatch per remainder batch, per-member eval dispatches and
metric fetches. This module applies the same transform as
:mod:`multivae_tpu.train.chunked` to the whole ensemble: the fully
transformed per-member modality blocks live resident on the device and the
K-epoch chunk — common-prefix ensemble kernel, per-member remainder-group
scans, per-member test pass — runs inside one nested ``lax.scan`` whose
outer axis emits the checkpoint-boundary params/opt snapshots (all members
stacked), fetched after the NEXT chunk's dispatch.

Numerics replicate ``train_one_epoch_ensemble`` / ``test_one_epoch``
exactly: per member, one rng split per stream batch drawn up front in
stream order (NOT the member-chunked driver's fused-block draw — the two
drivers have separately-pinned rng schemes), the common segment is each
member's first ``n_common`` scannable batches IN STREAM ORDER (not a
leading run — the sampler permutes complete partial-subset batches among
them; ``n_common`` is the per-cohort constant ``min_m floor(|all-modality
subset_m| / B)``, which keeps the program structure identical across
epochs), remainder groups run in canonical order keyed by their stream
indices, and the eval pass threads each member's rng after its training
stream.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import MissingModalitySampler
from .chunked import (
    EvalPlan,
    _batch_rows,
    _group,
    _metric_keys,
    _split_chain,
    trim_opt_snapshots,
)


# --------------------------------------------------------------------- plans

class MemberPlan:
    """One member's epoch partition: its slice of the common segment (the
    first ``n_common`` scannable batches in stream order, with their
    stream indices for rng/log bookkeeping) plus canonical remainder
    groups whose ``enum_idx`` are STREAM indices too (the ensemble driver
    keys rng subs and log cadence off them)."""

    def __init__(self, common_rows, common_idx, groups, stream_len,
                 epoch: int = 0):
        self.common_rows = common_rows          # {mod: [n_common, B]} | None
        self.common_idx = common_idx            # int32 [n_common] | None
        self.groups = groups                    # {key: (rows, stream_idx)}
        self.stream_len = stream_len
        self.epoch = epoch                      # absolute epoch (rng keying)

    def structure(self):
        return (tuple((k, v[1].shape[0]) for k, v in self.groups.items()),
                self.stream_len)


def plan_ensemble_epoch(cfg, datasets, mod_names,
                        epoch: int) -> Tuple[int, List[MemberPlan]]:
    """Mirror of ``train_one_epoch_ensemble``'s batch partition as indices.

    ``n_common = min over members of the total scannable-batch count`` —
    a per-cohort constant (``floor(|all-modality subset| / B)``), so every
    epoch of a run shares one program structure.
    """
    streams = []
    for dataset in datasets:
        sampler = MissingModalitySampler(dataset, batch_size=cfg.batch_size,
                                         indices=dataset.indices,
                                         seed=cfg.seed + epoch)
        items = []
        for idxs in sampler:
            idxs = np.asarray(idxs)
            present, rows = _batch_rows(dataset, idxs, mod_names)
            items.append((present, rows, len(idxs)))
        streams.append(items)

    def scannable(it):
        return it[2] == cfg.batch_size and len(it[0]) == len(mod_names)

    scan_idx = [[i for i, it in enumerate(items) if scannable(it)]
                for items in streams]
    n_common = min(len(s) for s in scan_idx) if streams else 0

    plans = []
    for items, sidx in zip(streams, scan_idx):
        common, cidx = None, None
        if n_common:
            cidx = np.asarray(sidx[:n_common], dtype=np.int32)
            common = {m: np.stack([items[i][1][m] for i in cidx])
                      for m in mod_names}
        in_common = set(sidx[:n_common])
        general = [(i, present, rows, n)
                   for i, (present, rows, n) in enumerate(items)
                   if i not in in_common]
        plans.append(MemberPlan(common, cidx,
                                _group(general, mod_names, cfg.batch_size),
                                len(items), epoch=epoch))
    return n_common, plans


# ------------------------------------------------------------ chunk program

class EnsembleChunkRunner:
    """Compiled K-epoch all-members program + host-side metric layout.

    ``__call__(params, opt_state, rngs, xs)`` with stacked ``[M, ...]``
    params/opt and ``rngs [M, 2]`` returns the updated state, the threaded
    rngs, a ``[K, L]`` float32 metric matrix, and per-segment boundary
    snapshots ``[n_seg, M, ...]`` (opt trimmed per ``cfg.save_optimizer``,
    as in the single-member runner).
    """

    def __init__(self, cfg, model, train_structs, eval_structs, n_common,
                 ens_scan_fn, residents_train, residents_eval,
                 params_stack, opt_stack, mesh=None):
        from .train_step import make_scan_eval_step, make_scan_train_step

        self.cfg = cfg
        self.n_common = n_common
        self.train_structs = tuple(train_structs)
        self.eval_structs = tuple(eval_structs)
        n_models = cfg.num_models
        mod_names = [m.name for m in model.modalities]
        self.mod_names = mod_names
        group_fn = make_scan_train_step(cfg, model, donate=False)
        eval_fn = make_scan_eval_step(cfg, model)

        # per-member resident blocks, padded to a shared row count and
        # stacked [M, N_max, d] so the chunk program has one argument per
        # modality (rows beyond a member's own length are never indexed)
        def stack_pad(blocks):
            n_max = max(b.shape[0] for b in blocks)
            return np.stack([np.pad(b, ((0, n_max - b.shape[0]), (0, 0)))
                             for b in blocks])

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            repl = NamedSharding(mesh, PartitionSpec())
            put = lambda a: jax.device_put(a, repl)  # noqa: E731
        else:
            put = jax.device_put
        self.resident = {
            m: put(stack_pad([np.asarray(r[m]) for r in residents_train]))
            for m in mod_names}
        self.resident_eval = {
            m: put(stack_pad([np.asarray(r[m]) for r in residents_eval]))
            for m in mod_names}
        dims = {m: self.resident[m].shape[2] for m in mod_names}

        def tb(mods, rows, n_b):
            return ({m: jax.ShapeDtypeStruct((n_b, rows, dims[m]),
                                             jnp.float32) for m in mods},
                    jax.ShapeDtypeStruct((n_b, 2), jnp.uint32))

        member_p = jax.tree_util.tree_map(lambda t: t[0], params_stack)
        member_o = jax.tree_util.tree_map(lambda t: t[0], opt_stack)
        # segment records in write order: ("common", None, keys, n, None),
        # ("train", m, keys, n_b, group_index) or ("test", m, keys, n_b,
        # None) — the group index disambiguates a member's identical
        # group shapes when replaying log cadence
        self.segments: List[Tuple] = []
        common_keys: List[str] = []
        if n_common:
            grid = {m: jax.ShapeDtypeStruct(
                (n_models, n_common, cfg.batch_size, dims[m]), jnp.float32)
                for m in mod_names}
            rgrid = jax.ShapeDtypeStruct((n_models, n_common, 2),
                                         jnp.uint32)
            common_keys = _metric_keys(ens_scan_fn, params_stack, opt_stack,
                                       grid, rgrid)
            self.segments.append(("common", None, common_keys, n_common,
                                  None))
        group_keys: List[List[List[str]]] = []
        for m_i, (group_spec, _) in enumerate(self.train_structs):
            per_member = []
            for gi, ((mods, rows), n_b) in enumerate(group_spec):
                b, r = tb(mods, rows, n_b)
                keys = _metric_keys(group_fn, member_p, member_o, b, r)
                per_member.append(keys)
                self.segments.append(("train", m_i, keys, n_b, gi))
            group_keys.append(per_member)
        esc_keys: List[str] = []
        egroup_keys: List[List[List[str]]] = []
        for m_i, (n_esc, egroup_spec, _) in enumerate(self.eval_structs):
            if n_esc:
                b, r = tb(mod_names, cfg.batch_size, n_esc)
                esc_keys = _metric_keys(eval_fn, member_p, b, r)
                self.segments.append(("test", m_i, esc_keys, n_esc, None))
            per_member = []
            for (mods, rows), n_b in egroup_spec:
                b, r = tb(mods, rows, n_b)
                keys = _metric_keys(eval_fn, member_p, b, r)
                per_member.append(keys)
                self.segments.append(("test", m_i, keys, n_b, None))
            egroup_keys.append(per_member)

        def epoch_body(carry, x, res, eres):
            # carried keys are the members' BASE keys, never advanced:
            # each epoch folds its absolute index in (the per-epoch
            # ensemble driver's exact derivation), so resume replays the
            # uninterrupted run's stream bit-for-bit
            p, o, rngs0 = carry
            rngs = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                rngs0, x["epoch"])
            outs = []
            # one split per stream batch per member, drawn up front in
            # stream order (train_one_epoch_ensemble's exact scheme)
            subs, new_rngs = [], []
            for m_i, (_, stream_len) in enumerate(self.train_structs):
                r, s = _split_chain(rngs[m_i], stream_len)
                subs.append(s)
                new_rngs.append(r)
            if n_common:
                grid = {m: jnp.stack(
                    [res[m][m_i][x["common"][m_i][m]]
                     for m_i in range(n_models)]) for m in mod_names}
                rgrid = jnp.stack([subs[m_i][x["cidx"][m_i]]
                                   for m_i in range(n_models)])
                p, o, _, cm = ens_scan_fn(p, o, grid, rgrid)
                outs += [cm[k] for k in common_keys]
            for m_i, (group_spec, _) in enumerate(self.train_structs):
                if not group_spec:
                    continue
                p_m = jax.tree_util.tree_map(lambda t: t[m_i], p)
                o_m = jax.tree_util.tree_map(lambda t: t[m_i], o)
                for gi, ((mods, rows), n_b) in enumerate(group_spec):
                    gb = {m: res[m][m_i][x["groups"][m_i][gi][m]]
                          for m in mods}
                    p_m, o_m, _, gm = group_fn(
                        p_m, o_m, gb, subs[m_i][x["genum"][m_i][gi]])
                    outs += [gm[k] for k in group_keys[m_i][gi]]
                p = jax.tree_util.tree_map(
                    lambda t, tm: t.at[m_i].set(tm), p, p_m)
                o = jax.tree_util.tree_map(
                    lambda t, tm: t.at[m_i].set(tm), o, o_m)
            # eval: per member, threading its rng after the train stream
            for m_i, (n_esc, egroup_spec, n_eo) in enumerate(
                    self.eval_structs):
                r = new_rngs[m_i]
                p_m = jax.tree_util.tree_map(lambda t: t[m_i], p)
                if n_esc:
                    r, sub = jax.random.split(r)
                    erngs = jax.random.split(sub, n_esc)
                    eb = {m: eres[m][m_i][x["esc"][m_i][m]]
                          for m in mod_names}
                    _, em = eval_fn(p_m, eb, erngs)
                    outs += [em[k] for k in esc_keys]
                if n_eo:
                    r, esubs = _split_chain(r, n_eo)
                for gi, ((mods, rows), n_b) in enumerate(egroup_spec):
                    eb = {m: eres[m][m_i][x["egroups"][m_i][gi][m]]
                          for m in mods}
                    _, em = eval_fn(p_m, eb, esubs[x["eenum"][m_i][gi]])
                    outs += [em[k] for k in egroup_keys[m_i][gi]]
                new_rngs[m_i] = r
            flat = (jnp.concatenate(
                [jnp.asarray(v, jnp.float32).reshape(-1) for v in outs])
                if outs else jnp.zeros((0,), jnp.float32))
            return (p, o, rngs0), flat

        def run_chunk(params, opt_state, rngs, res, eres, xs):
            def seg_body(carry, seg_xs):
                carry, flat = jax.lax.scan(
                    lambda c, x: epoch_body(c, x, res, eres), carry, seg_xs)
                p, o, _ = carry
                return carry, (flat, p, o)

            (params, opt_state, rngs), (flat, snap_p, snap_o) = jax.lax.scan(
                seg_body, (params, opt_state, rngs), xs)
            flat = flat.reshape(-1, flat.shape[-1])
            return (params, opt_state, rngs, flat, snap_p,
                    trim_opt_snapshots(cfg, snap_o))

        donate = (0, 1) if cfg.donate_buffers else ()
        self._compiled = jax.jit(run_chunk, donate_argnums=donate)

    def __call__(self, params, opt_state, rngs, xs):
        return self._compiled(params, opt_state, rngs, self.resident,
                              self.resident_eval, xs)

    # ------------------------------------------------------------- host side
    def stack_xs(self, plans: List[List[MemberPlan]],
                 eplans: List[List[EvalPlan]], n_seg: int, seg_len: int):
        """``plans[k][m]`` per epoch k / member m -> the chunk's xs pytree
        with every leaf shaped ``[n_seg, seg_len, ...]``."""
        n_models = self.cfg.num_models

        def seg(arrs):
            a = np.stack(arrs)
            return a.reshape((n_seg, seg_len) + a.shape[1:])

        xs: Dict = {"epoch": seg([np.int32(p[0].epoch) for p in plans])}
        if self.n_common:
            xs["common"] = [
                {m: seg([p[m_i].common_rows[m] for p in plans])
                 for m in self.mod_names} for m_i in range(n_models)]
            xs["cidx"] = [seg([p[m_i].common_idx for p in plans])
                          for m_i in range(n_models)]
        xs["groups"], xs["genum"] = [], []
        for m_i, (group_spec, _) in enumerate(self.train_structs):
            g_rows, g_enum = [], []
            for key, _ in group_spec:
                g_rows.append(
                    {m: seg([p[m_i].groups[key][0][m] for p in plans])
                     for m in key[0]})
                g_enum.append(seg([p[m_i].groups[key][1] for p in plans]))
            xs["groups"].append(g_rows)
            xs["genum"].append(g_enum)
        xs["esc"], xs["egroups"], xs["eenum"] = [], [], []
        for m_i, (n_esc, egroup_spec, _) in enumerate(self.eval_structs):
            xs["esc"].append(
                {m: seg([p[m_i].scan_rows[m] for p in eplans])
                 for m in self.mod_names} if n_esc else {})
            e_rows, e_enum = [], []
            for key, _ in egroup_spec:
                e_rows.append(
                    {m: seg([p[m_i].groups[key][0][m] for p in eplans])
                     for m in key[0]})
                e_enum.append(seg([p[m_i].groups[key][1] for p in eplans]))
            xs["egroups"].append(e_rows)
            xs["eenum"].append(e_enum)
        return xs

    def write_logs(self, loggers, flat_np: np.ndarray,
                   plans: List[List[MemberPlan]],
                   log_every: int = 1) -> None:
        """Replay ``train_one_epoch_ensemble``/``test_one_epoch``'s logger
        write sequence from the fetched ``[K, L]`` metric matrix."""
        for k in range(flat_np.shape[0]):
            row = flat_np[k]
            off = 0
            for kind, m_i, names, n, gi in self.segments:
                metrics = {}
                for name in names:
                    size = n * (self.cfg.num_models if kind == "common"
                                else 1)
                    metrics[name] = row[off:off + size]
                    off += size
                if kind == "common":
                    for m in range(self.cfg.num_models):
                        if loggers[m] is None:
                            continue
                        cidx = plans[k][m].common_idx
                        for pos in range(n):
                            if int(cidx[pos]) % log_every == 0:
                                loggers[m].write_training_logs(
                                    {name: metrics[name][m * n + pos]
                                     for name in metrics})
                elif kind == "train":
                    if loggers[m_i] is None:
                        continue
                    key = self.train_structs[m_i][0][gi][0]
                    stream_idx = plans[k][m_i].groups[key][1]
                    for j in range(n):
                        if int(stream_idx[j]) % log_every == 0:
                            loggers[m_i].write_training_logs(
                                {name: metrics[name][j]
                                 for name in metrics})
                else:  # test
                    if loggers[m_i] is None:
                        continue
                    for j in range(n):
                        loggers[m_i].write_testing_logs(
                            {name: metrics[name][j] for name in metrics})
