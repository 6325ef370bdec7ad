"""Experiment configuration.

The reference builds a ~50-field ``SimpleNamespace`` in
``experiments/workflow.py:98-121`` (field names inherited from
``utils/BaseFlags.py`` + ``multimodal_cohort/flags.py``) and pickles it as
``flags.rar``. Here the same surface is a typed dataclass serialized as JSON
(``flags.json``), with the reference's derived fields (method booleans,
``num_mods``, ``alpha_modalities``; ``workflow.py:125-145``) computed by
:meth:`Config.derive`.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional

METHODS = ("poe", "moe", "jsd", "joint_elbo")


@dataclass
class Config:
    # experiment identity / IO
    dataset: str = "synthetic"
    datasetdir: str = ""
    dir_experiment: str = "/tmp/multivae_tpu"
    str_experiment: str = ""
    dir_experiment_run: str = ""
    dir_checkpoints: str = ""
    dir_logs: str = ""
    model_save: str = "model"
    save_optimizer: str = "all"     # opt_state files in checkpoint dirs:
    # "all" writes one per boundary (exact `load_epoch` resume from ANY
    # checkpoint — a capability the reference lacks); "latest" writes only
    # the newest boundary of each training chunk, cutting the dominant
    # device->host checkpoint transfer ~3x on relay-attached hosts while
    # keeping crash-resume from the latest checkpoint exact (the newest
    # params dir always carries opt_state; older epochs resume with a
    # fresh optimizer — the reference's own semantics); "none" skips
    # optimizer persistence entirely.

    # model
    method: str = "joint_elbo"
    input_dim: List[int] = field(default_factory=lambda: [7, 444])
    class_dim: int = 20
    style_dim: List[int] = field(default_factory=lambda: [3, 20])
    factorized_representation: bool = True
    likelihood: str = "normal"
    num_hidden_layer_encoder: int = 1
    num_hidden_layer_decoder: int = 0
    hidden_dim: int = 256  # reference hardcodes 256 (networks.py:14)
    dropout_rate: float = 0.0
    initial_out_logvar: float = -3.0
    learn_output_scale: bool = True
    learn_output_sample_scale: bool = False
    # reference-surface no-op (never consumed by the reference's active
    # paths either: set in workflow.py:111 and read nowhere)
    include_prior_expert: bool = False

    # training
    num_models: int = 1
    batch_size: int = 256
    initial_learning_rate: float = 0.002
    beta_1: float = 0.9
    beta_2: float = 0.999
    start_epoch: int = 0
    end_epoch: int = 100
    beta: float = 1.0
    beta_style: float = 1.0
    beta_content: float = 1.0
    # reference-surface no-op (workflow.py:111 sets it; nothing reads it)
    kl_annealing: int = 0
    poe_unimodal_elbos: bool = True
    # accepted for reference-CLI compatibility but a documented NO-OP: the
    # reference used it to toggle torch.cuda.amp.GradScaler
    # (run_epochs.py:166-182); this stack trains in f32 (kernels may cast
    # matmuls to bf16 via `precision`) where loss-scaling has no role
    grad_scaling: bool = False
    seed: int = 42

    # data
    allow_missing_blocks: bool = True
    # surface-parity no-op: the reference declares --data_multiplications
    # ("number of pairs per sample", flags.py:15) but consumes it nowhere
    data_multiplications: int = 1
    data_seed: object = "defaults"
    # surface-parity no-op: set by the reference's train_exp
    # (workflow.py:121) and consumed nowhere upstream
    subsampled_reconstruction: bool = True

    # evaluation
    calc_nll: bool = False
    calc_prd: bool = False
    # latent-probe classification + conditional-generation coherence on the
    # NLL cadence — the reference INTENDED these (representation.py:19-134,
    # coherence.py:15-119) but both crash upstream on exp.mm_vae/exp.clfs;
    # wired fix-forward here (eval/representation.py, eval/coherence.py)
    calc_clf: bool = False
    calc_coherence: bool = False
    eval_freq: int = 25
    eval_freq_fid: int = 100
    # upstream num_samples_fid only caps how many generated samples the
    # vestigial coherence loop SAVES for FID (coherence.py:88,108); the
    # working sample dumps here take an explicit num_samples argument, so
    # the flag is surface-parity only
    num_samples_fid: int = 10000
    # probe-training row cap, honored by eval.representation
    # (reference representation.py:50-52)
    num_training_samples_lr: int = 500
    # upstream save_figure only feeds the vestigial image-grid plotting
    # (plotting.py:336-448, skipped per SURVEY §2.4); surface parity only
    save_figure: bool = False
    load_saved: bool = False

    # parallelism / performance (new capabilities; absent in the reference)
    data_parallel: int = 1          # devices along the batch axis
    tensor_parallel: int = 1        # devices along the hidden dimension
    # (GSPMD column/row param sharding over a ("data", "tensor") mesh;
    # composes with data_parallel; a scaling surface — at 256-wide MLPs
    # single-chip is faster, SURVEY §2.6)
    ensemble_parallel: object = "auto"  # train ensemble members together
    # over a model axis ("auto" / True / False; "auto" enables it whenever
    # it beats the sequential fused path — see trainer.resolve_ensemble)
    precision: str = "float32"      # fused-kernel matmul dtype; "bfloat16"
    # casts matmul operands (f32 accumulation stays) — measured slightly
    # SLOWER than f32 at this model's shapes, so f32 is the default
    donate_buffers: bool = True     # donate params/opt buffers in the train
    # step (verified stable through the axon relay; flip off if the
    # platform regresses to sporadic INVALID_ARGUMENT on donated buffers)
    fused_training: bool = True     # single-Pallas-kernel train step + epoch
    # scan on supported configs (ops/fused_step.py); per-step metric logging
    # then reduces to the loss (full metric families still logged at test)
    epoch_chunk: int = 50           # max epochs chained into ONE device
    # dispatch (train/chunked.py): the dominant cost of long trainings on
    # this relay-attached host is the ~6 host<->device round-trips per
    # epoch, not compute. Checkpoint boundaries inside a chunk are emitted
    # by the scan itself as device-side snapshots (~epoch_chunk/5 copies of
    # params+opt_state live on device per chunk — size accordingly), so
    # chunks end only at NLL/PRD cadence or the end of training; artifacts
    # and logs are unchanged and training is numerically identical to the
    # per-epoch driver. 1 disables.

    # derived (filled by derive())
    num_mods: int = 0
    modality_poe: bool = False
    modality_moe: bool = False
    modality_jsd: bool = False
    joint_elbo: bool = False
    div_weight: Optional[float] = None
    div_weight_uniform_content: Optional[float] = None
    alpha_modalities: List[float] = field(default_factory=list)

    def derive(self) -> "Config":
        """Fill derived fields; mirrors ``workflow.py:125-145``."""
        if self.method not in METHODS:
            raise ValueError(f"Method not implemented: {self.method}")
        if self.save_optimizer not in ("all", "latest", "none"):
            raise ValueError(
                f"save_optimizer must be all|latest|none, "
                f"got: {self.save_optimizer}")
        self.modality_poe = self.method == "poe"
        self.modality_moe = self.method == "moe"
        self.modality_jsd = self.method == "jsd"
        self.joint_elbo = self.method == "joint_elbo"
        if self.modality_poe:
            self.poe_unimodal_elbos = True
        self.num_mods = len(self.input_dim)
        if isinstance(self.style_dim, int):
            self.style_dim = [self.style_dim] * self.num_mods
        elif len(self.style_dim) != self.num_mods:
            self.style_dim = [self.style_dim[0]] * self.num_mods
        if not self.factorized_representation:
            self.style_dim = [0] * len(self.style_dim)
        if self.div_weight_uniform_content is None:
            self.div_weight_uniform_content = 1.0 / (self.num_mods + 1)
        if self.div_weight is None:
            self.div_weight = 1.0 / (self.num_mods + 1)
        self.alpha_modalities = [self.div_weight_uniform_content] + [
            self.div_weight for _ in range(self.num_mods)]
        if isinstance(self.ensemble_parallel, str):
            val = self.ensemble_parallel.lower()
            if val in ("true", "1", "yes"):
                self.ensemble_parallel = True
            elif val in ("false", "0", "no"):
                self.ensemble_parallel = False
            else:
                self.ensemble_parallel = "auto"
        return self

    # ---- persistence (reference: flags.rar via torch.save;
    #      utils/utils.py:115-125) ----
    def save(self, path: str) -> None:
        payload = dataclasses.asdict(self)
        with open(path, "w") as fh:
            json.dump(payload, fh, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as fh:
            payload = json.load(fh)
        known = {f.name for f in dataclasses.fields(cls)}
        cfg = cls(**{k: v for k, v in payload.items() if k in known})
        return cfg.derive()

    @classmethod
    def flags_path(cls, run_dir: str) -> str:
        return os.path.join(run_dir, "flags.json")

    def describe(self) -> str:
        return "\n".join(f"{k}: {v}" for k, v in
                         sorted(dataclasses.asdict(self).items()))
