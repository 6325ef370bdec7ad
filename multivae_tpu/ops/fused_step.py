"""Fully-fused MoPoE train step: one Pallas kernel per step — or per epoch.

Motivation: the flagship workload (2-modality MoPoE, 256-wide MLPs, batch 256)
is ~0.2 GFLOP per step but lowers to >100 XLA kernels; on TPU the step is
kernel-launch-bound, not FLOP-bound. Every tensor involved — params (~1 MB),
batch (~0.5 MB), activations — fits in VMEM, so the entire
encode → 2^M-subset PoE fusion → mixture selection → reparameterize → decode
→ ELBO → backward (hand-derived) → Adam pipeline runs inside Pallas. The
epoch kernel goes further: a grid over steps keeps params and Adam moments
resident in VMEM while batches stream in per grid step, so a whole epoch is
ONE device dispatch.

Performance notes (measured on v5e through the axon relay):
  * per-call dispatch ≈ 2 ms and per-XLA-kernel ≈ 17 µs — hence the fusion;
  * unaligned lane slices/concats (head offsets 20/40/43...) dominate a naive
    kernel, so head and decoder weights are pre-split OUTSIDE the kernel into
    per-head tensors; inside there are only whole-tensor matmuls
    (transposed operands contract via ``dot_general``, never ``.T``).

Supported configuration (the reference's HBN/EUAIMS training config,
``README.md:76-79``): ``method='joint_elbo'``, two modalities, one hidden
encoder layer, zero hidden decoder layers, factorized styles (both > 0),
normal likelihood, per-feature learned/frozen output scale (not per-sample),
no dropout, all modalities present in the batch. Everything else falls back
to the general jitted path.

The jnp reference (:func:`fused_loss_reference`) mirrors
``run_epochs.py:73-135`` + ``BaseMMVae.forward`` exactly (same formulas as
:mod:`multivae_tpu.ops`); the Pallas kernels' hand gradients are tested
against ``jax.grad`` of the reference and the epoch kernel against sequential
single steps.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2PI = math.log(2.0 * math.pi)
POE_EPS = 1e-8


class FusedDims(NamedTuple):
    b: int        # batch
    d1: int       # clinical width
    d2: int       # rois width
    h: int        # hidden width
    cd: int       # class (content) dim
    s1: int       # clinical style dim
    s2: int       # rois style dim


class FusedConsts(NamedTuple):
    beta: float
    beta_style: float
    beta_content: float


# packed layout (matches the flax param tree)
FLAT_NAMES = (
    "enc1_Wh", "enc1_bh", "enc1_Wo", "enc1_bo",
    "enc2_Wh", "enc2_bh", "enc2_Wo", "enc2_bo",
    "dec1_Wd", "dec1_bd", "dec1_olv",
    "dec2_Wd", "dec2_bd", "dec2_olv",
)

# per-step scalar families emitted by the kernels; templates are filled with
# the two modality names (m1, m2) and the joint subset key so fused-mode logs
# carry the SAME families as the general path (utils/TBLogger.py:84-101)
METRIC_TEMPLATES = (
    "loss", "joint_divergence",
    "log_prob/{m1}", "log_prob/{m2}",
    "kld/{m1}", "kld/{m2}", "kld/{joint}",
    "kld_style/{m1}_style", "kld_style/{m2}_style",
    "latent_mu/{m1}", "latent_logvar/{m1}",
    "latent_mu/{m1}_style", "latent_logvar/{m1}_style",
    "latent_mu/{m2}", "latent_logvar/{m2}",
    "latent_mu/{m2}_style", "latent_logvar/{m2}_style",
)
N_METRICS = len(METRIC_TEMPLATES)


def metric_names(model) -> Tuple[str, ...]:
    """Concrete metric keys for this model's modality names."""
    m1, m2 = (m.name for m in model.modalities)
    joint = "_".join(sorted([m1, m2]))
    return tuple(t.format(m1=m1, m2=m2, joint=joint)
                 for t in METRIC_TEMPLATES)


# split layout consumed by the kernels (no intra-kernel lane slicing)
SPLIT_NAMES = tuple(
    f"{e}_{part}" for e in ("enc1", "enc2")
    for part in ("Wh", "bh", "Wcmu", "bcmu", "Wclv", "bclv",
                 "Wsmu", "bsmu", "Wslv", "bslv")
) + tuple(
    f"{d}_{part}" for d in ("dec1", "dec2")
    for part in ("Wds", "Wdc", "bd", "olv")
)


def vmem_budget_ok(cfg, model) -> bool:
    """Whether params (+ Adam moments, in and out) fit the epoch kernels'
    resident-VMEM budget (same heuristic as ``fused_generic``).

    Counts every layer the config implies — deep encoder/decoder stacks add
    ``hidden_dim^2`` hidden-to-hidden matrices that the generic kernel must
    also hold resident, so they must weigh into the guard (a config passing
    here but overflowing VMEM would crash at Mosaic compile instead of
    taking the XLA-scan fallback)."""
    h = cfg.hidden_dim
    n_enc = cfg.num_hidden_layer_encoder
    n_dec = cfg.num_hidden_layer_decoder
    param_floats = 0
    for m in model.modalities:
        lat = cfg.class_dim + m.style_dim
        # encoder: dim->h, (n_enc-1) x h->h, then the fused 4-head
        # projection h -> 2*(class+style) (+ biases)
        param_floats += m.dim * h + h + max(n_enc - 1, 0) * (h * h + h)
        param_floats += h * 2 * lat + 2 * lat
        # decoder: lat->h / h->h chain / last->dim, or direct lat->dim;
        # +2*dim covers the loc bias and the per-feature output scale
        if n_dec > 0:
            param_floats += lat * h + h + (n_dec - 1) * (h * h + h)
            last = h
        else:
            last = lat
        param_floats += last * m.dim + 2 * m.dim
        if cfg.learn_output_sample_scale:
            param_floats += last * m.dim + m.dim
    return param_floats * 12 < 8e6


def supports_fused(cfg, model, batch) -> bool:
    """Whether (cfg, model, batch) matches the specialized kernel."""
    names = [m.name for m in model.modalities]
    return (
        vmem_budget_ok(cfg, model)
        and cfg.method == "joint_elbo"
        and len(model.modalities) == 2
        and all(n in batch for n in names)
        and cfg.num_hidden_layer_encoder == 1
        and cfg.num_hidden_layer_decoder == 0
        and cfg.factorized_representation
        and all(m.style_dim > 0 for m in model.modalities)
        and cfg.likelihood == "normal"
        and not cfg.learn_output_sample_scale
        and cfg.dropout_rate == 0.0
    )


def dims_from(cfg, batch_size: int) -> FusedDims:
    return FusedDims(b=batch_size, d1=cfg.input_dim[0], d2=cfg.input_dim[1],
                     h=cfg.hidden_dim, cd=cfg.class_dim,
                     s1=cfg.style_dim[0], s2=cfg.style_dim[1])


def flatten_params(params, model) -> Dict[str, jnp.ndarray]:
    """flax param tree -> packed named dict."""
    n1, n2 = (m.name for m in model.modalities)
    return {
        "enc1_Wh": params[f"enc_{n1}"]["hidden_0"]["kernel"],
        "enc1_bh": params[f"enc_{n1}"]["hidden_0"]["bias"],
        "enc1_Wo": params[f"enc_{n1}"]["heads"]["kernel"],
        "enc1_bo": params[f"enc_{n1}"]["heads"]["bias"],
        "enc2_Wh": params[f"enc_{n2}"]["hidden_0"]["kernel"],
        "enc2_bh": params[f"enc_{n2}"]["hidden_0"]["bias"],
        "enc2_Wo": params[f"enc_{n2}"]["heads"]["kernel"],
        "enc2_bo": params[f"enc_{n2}"]["heads"]["bias"],
        "dec1_Wd": params[f"dec_{n1}"]["out_mu"]["kernel"],
        "dec1_bd": params[f"dec_{n1}"]["out_mu"]["bias"],
        "dec1_olv": params[f"dec_{n1}"]["out_logvar"],
        "dec2_Wd": params[f"dec_{n2}"]["out_mu"]["kernel"],
        "dec2_bd": params[f"dec_{n2}"]["out_mu"]["bias"],
        "dec2_olv": params[f"dec_{n2}"]["out_logvar"],
    }


def unflatten_grads(grads: Dict[str, jnp.ndarray], params, model):
    """Packed named dict -> flax param-tree-shaped pytree."""
    n1, n2 = (m.name for m in model.modalities)
    return {
        f"enc_{n1}": {"hidden_0": {"kernel": grads["enc1_Wh"],
                                   "bias": grads["enc1_bh"]},
                      "heads": {"kernel": grads["enc1_Wo"],
                                "bias": grads["enc1_bo"]}},
        f"enc_{n2}": {"hidden_0": {"kernel": grads["enc2_Wh"],
                                   "bias": grads["enc2_bh"]},
                      "heads": {"kernel": grads["enc2_Wo"],
                                "bias": grads["enc2_bo"]}},
        f"dec_{n1}": {"out_mu": {"kernel": grads["dec1_Wd"],
                                 "bias": grads["dec1_bd"]},
                      "out_logvar": grads["dec1_olv"]},
        f"dec_{n2}": {"out_mu": {"kernel": grads["dec2_Wd"],
                                 "bias": grads["dec2_bd"]},
                      "out_logvar": grads["dec2_olv"]},
    }


def split_params(p: Dict[str, jnp.ndarray], dims: FusedDims):
    """Packed -> split layout (head columns and decoder input rows become
    separate tensors; done OUTSIDE the kernel where slicing is cheap)."""
    cd = dims.cd
    out = {}
    for e, s in (("enc1", dims.s1), ("enc2", dims.s2)):
        Wo, bo = p[f"{e}_Wo"], p[f"{e}_bo"]
        out[f"{e}_Wh"] = p[f"{e}_Wh"]
        out[f"{e}_bh"] = p[f"{e}_bh"]
        out[f"{e}_Wcmu"] = Wo[:, :cd]
        out[f"{e}_bcmu"] = bo[:cd]
        out[f"{e}_Wclv"] = Wo[:, cd:2 * cd]
        out[f"{e}_bclv"] = bo[cd:2 * cd]
        out[f"{e}_Wsmu"] = Wo[:, 2 * cd:2 * cd + s]
        out[f"{e}_bsmu"] = bo[2 * cd:2 * cd + s]
        out[f"{e}_Wslv"] = Wo[:, 2 * cd + s:]
        out[f"{e}_bslv"] = bo[2 * cd + s:]
    for d, s in (("dec1", dims.s1), ("dec2", dims.s2)):
        Wd = p[f"{d}_Wd"]
        out[f"{d}_Wds"] = Wd[:s]
        out[f"{d}_Wdc"] = Wd[s:]
        out[f"{d}_bd"] = p[f"{d}_bd"]
        out[f"{d}_olv"] = p[f"{d}_olv"]
    return out


def join_params(sp: Dict[str, jnp.ndarray], dims: FusedDims):
    """Split -> packed layout (inverse of :func:`split_params`)."""
    out = {}
    for e in ("enc1", "enc2"):
        out[f"{e}_Wh"] = sp[f"{e}_Wh"]
        out[f"{e}_bh"] = sp[f"{e}_bh"]
        out[f"{e}_Wo"] = jnp.concatenate(
            [sp[f"{e}_Wcmu"], sp[f"{e}_Wclv"], sp[f"{e}_Wsmu"],
             sp[f"{e}_Wslv"]], axis=1)
        out[f"{e}_bo"] = jnp.concatenate(
            [sp[f"{e}_bcmu"], sp[f"{e}_bclv"], sp[f"{e}_bsmu"],
             sp[f"{e}_bslv"]])
    for d in ("dec1", "dec2"):
        out[f"{d}_Wd"] = jnp.concatenate([sp[f"{d}_Wds"], sp[f"{d}_Wdc"]])
        out[f"{d}_bd"] = sp[f"{d}_bd"]
        out[f"{d}_olv"] = sp[f"{d}_olv"]
    return out


def _mixture_bounds(b: int) -> Tuple[int, int]:
    """Static row partition of the 3-subset uniform mixture
    (``utils/utils.py:63-85`` arithmetic for K=3)."""
    k = int(math.floor(b / 3.0))
    return k, 2 * k


# ===========================================================================
# jnp reference (identical math to the general model path; packed params)
# ===========================================================================
def fused_loss_reference(p: Dict[str, jnp.ndarray], x1, x2, eps_j, eps_s1,
                         eps_s2, dims: FusedDims, consts: FusedConsts,
                         learn_scale: bool = True):
    """Scalar MoPoE loss, straight-line jnp. ``eps_*`` are the reparam noise
    draws (making the function a pure deterministic map for grad checking)."""
    cd = dims.cd
    k1, k2 = _mixture_bounds(dims.b)
    b = float(dims.b)

    def encode(x, Wh, bh, Wo, bo, s):
        h = jax.nn.relu(x @ Wh + bh)
        heads = h @ Wo + bo
        return (h, heads[:, :cd], heads[:, cd:2 * cd],
                heads[:, 2 * cd:2 * cd + s], heads[:, 2 * cd + s:])

    h1, cmu1, clv1, smu1, slv1 = encode(x1, p["enc1_Wh"], p["enc1_bh"],
                                        p["enc1_Wo"], p["enc1_bo"], dims.s1)
    h2, cmu2, clv2, smu2, slv2 = encode(x2, p["enc2_Wh"], p["enc2_bh"],
                                        p["enc2_Wo"], p["enc2_bo"], dims.s2)

    t1 = 1.0 / (jnp.exp(clv1) + POE_EPS)
    t2 = 1.0 / (jnp.exp(clv2) + POE_EPS)
    tp = 1.0 / (1.0 + POE_EPS)
    mu_a, lv_a = cmu1, -jnp.log(t1)
    mu_b, lv_b = cmu2, -jnp.log(t2)
    ts = t1 + t2 + tp
    mu_c = (cmu1 * t1 + cmu2 * t2) / ts
    lv_c = -jnp.log(ts)

    joint_mu = jnp.concatenate([mu_a[:k1], mu_b[k1:k2], mu_c[k2:]])
    joint_lv = jnp.concatenate([lv_a[:k1], lv_b[k1:k2], lv_c[k2:]])
    zc = joint_mu + eps_j * jnp.exp(0.5 * joint_lv)
    zs1 = smu1 + eps_s1 * jnp.exp(0.5 * slv1)
    zs2 = smu2 + eps_s2 * jnp.exp(0.5 * slv2)

    def nll(x, zs, Wd, bd, olv):
        loc = jnp.concatenate([zs, zc], axis=1) @ Wd + bd
        if not learn_scale:
            olv = jax.lax.stop_gradient(olv)
        return jnp.sum(0.5 * LOG2PI + 0.5 * olv
                       + jnp.square(x - loc) * jnp.exp(-olv) * 0.5) / b

    nll1 = nll(x1, zs1, p["dec1_Wd"], p["dec1_bd"], p["dec1_olv"])
    nll2 = nll(x2, zs2, p["dec2_Wd"], p["dec2_bd"], p["dec2_olv"])

    def kl(mu, lv):
        return -0.5 * jnp.sum(1.0 - jnp.exp(lv) - jnp.square(mu) + lv) / b

    group_div = (kl(mu_a, lv_a) + kl(mu_b, lv_b) + kl(mu_c, lv_c)) / 3.0
    kld_style = kl(smu1, slv1) + kl(smu2, slv2)
    return (nll1 + nll2 + consts.beta
            * (consts.beta_style * consts.beta_style * kld_style
               + consts.beta_content * group_div))


# ===========================================================================
# shared forward+backward math on split params (pure function of values)
# ===========================================================================
def _fwd_bwd(dims: FusedDims, consts: FusedConsts, learn_scale: bool,
             matmul_bf16: bool, x1, x2, ej, es1, es2,
             sp: Dict[str, jnp.ndarray], row_offset=0,
             b_total: Optional[int] = None):
    """Loss + hand-derived gradients over the SPLIT param layout.

    ``row_offset``/``b_total`` support data-parallel sharding
    (:mod:`multivae_tpu.ops.fused_sharded`): when the batch rows are split
    across devices, ``dims.b`` is the LOCAL row count, ``b_total`` the
    global batch size (normalization + mixture-partition bounds), and
    ``row_offset`` (may be traced) the device's first global row index so
    the 3-subset mixture masks stay globally consistent. All sums here are
    then partial: ``psum`` over the data axis yields the exact full-batch
    loss/grads."""
    k1, k2 = _mixture_bounds(b_total or dims.b)
    b = float(b_total or dims.b)
    beta, beta_style, beta_content = consts

    def _cast(a, bb):
        if matmul_bf16:
            return a.astype(jnp.bfloat16), bb.astype(jnp.bfloat16)
        return a, bb

    def dot(a, bb):
        a, bb = _cast(a, bb)
        return jnp.dot(a, bb, preferred_element_type=jnp.float32)

    def dot_bt(a, bb):
        # [B, M] x [B, N] -> [M, N] (a.T @ b without the transpose relayout)
        a, bb = _cast(a, bb)
        return jax.lax.dot_general(a, bb, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def dot_nt(a, bb):
        # [B, N] x [M, N] -> [B, M] (a @ b.T without the transpose relayout)
        a, bb = _cast(a, bb)
        return jax.lax.dot_general(a, bb, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # ---------------- forward ----------------
    h1 = jnp.maximum(dot(x1, sp["enc1_Wh"]) + sp["enc1_bh"][None, :], 0.0)
    h2 = jnp.maximum(dot(x2, sp["enc2_Wh"]) + sp["enc2_bh"][None, :], 0.0)
    cmu1 = dot(h1, sp["enc1_Wcmu"]) + sp["enc1_bcmu"][None, :]
    clv1 = dot(h1, sp["enc1_Wclv"]) + sp["enc1_bclv"][None, :]
    smu1 = dot(h1, sp["enc1_Wsmu"]) + sp["enc1_bsmu"][None, :]
    slv1 = dot(h1, sp["enc1_Wslv"]) + sp["enc1_bslv"][None, :]
    cmu2 = dot(h2, sp["enc2_Wcmu"]) + sp["enc2_bcmu"][None, :]
    clv2 = dot(h2, sp["enc2_Wclv"]) + sp["enc2_bclv"][None, :]
    smu2 = dot(h2, sp["enc2_Wsmu"]) + sp["enc2_bsmu"][None, :]
    slv2 = dot(h2, sp["enc2_Wslv"]) + sp["enc2_bslv"][None, :]

    ev1 = jnp.exp(clv1)
    ev2 = jnp.exp(clv2)
    t1 = 1.0 / (ev1 + POE_EPS)
    t2 = 1.0 / (ev2 + POE_EPS)
    tp = 1.0 / (1.0 + POE_EPS)
    mu_a, lv_a = cmu1, -jnp.log(t1)
    mu_b, lv_b = cmu2, -jnp.log(t2)
    ts = t1 + t2 + tp
    mu_c = (cmu1 * t1 + cmu2 * t2) / ts
    lv_c = -jnp.log(ts)

    rows = jax.lax.broadcasted_iota(jnp.int32, (dims.b, 1), 0) + row_offset
    m_a = (rows < k1).astype(jnp.float32)
    m_b = jnp.logical_and(rows >= k1, rows < k2).astype(jnp.float32)
    m_c = (rows >= k2).astype(jnp.float32)
    joint_mu = m_a * mu_a + m_b * mu_b + m_c * mu_c
    joint_lv = m_a * lv_a + m_b * lv_b + m_c * lv_c

    sj = jnp.exp(0.5 * joint_lv)
    zc = joint_mu + ej * sj
    ss1 = jnp.exp(0.5 * slv1)
    ss2 = jnp.exp(0.5 * slv2)
    zs1 = smu1 + es1 * ss1
    zs2 = smu2 + es2 * ss2

    olv1 = sp["dec1_olv"]
    olv2 = sp["dec2_olv"]
    loc1 = dot(zs1, sp["dec1_Wds"]) + dot(zc, sp["dec1_Wdc"]) \
        + sp["dec1_bd"][None, :]
    loc2 = dot(zs2, sp["dec2_Wds"]) + dot(zc, sp["dec2_Wdc"]) \
        + sp["dec2_bd"][None, :]
    r1 = x1 - loc1
    r2 = x2 - loc2
    iv1 = jnp.exp(-olv1)
    iv2 = jnp.exp(-olv2)
    nll1 = jnp.sum(0.5 * LOG2PI + 0.5 * olv1
                   + 0.5 * jnp.square(r1) * iv1) / b
    nll2 = jnp.sum(0.5 * LOG2PI + 0.5 * olv2
                   + 0.5 * jnp.square(r2) * iv2) / b

    def kl_sum(mu, lv):
        return -0.5 * jnp.sum(1.0 - jnp.exp(lv) - jnp.square(mu) + lv) / b

    kld_a = kl_sum(mu_a, lv_a)
    kld_b = kl_sum(mu_b, lv_b)
    kld_c = kl_sum(mu_c, lv_c)
    kld_s1 = kl_sum(smu1, slv1)
    kld_s2 = kl_sum(smu2, slv2)
    group_div = (kld_a + kld_b + kld_c) / 3.0
    kld_style = kld_s1 + kld_s2
    loss = (nll1 + nll2
            + beta * (beta_style * beta_style * kld_style
                      + beta_content * group_div))
    # scalar families, ordered per METRIC_TEMPLATES
    metrics = [loss, group_div, nll1, nll2, kld_a, kld_b, kld_c,
               kld_s1, kld_s2,
               jnp.mean(cmu1), jnp.mean(clv1), jnp.mean(smu1),
               jnp.mean(slv1), jnp.mean(cmu2), jnp.mean(clv2),
               jnp.mean(smu2), jnp.mean(slv2)]

    # ---------------- backward ----------------
    g = {}
    g_loc1 = -r1 * iv1 / b
    g_loc2 = -r2 * iv2 / b
    g["dec1_Wds"] = dot_bt(zs1, g_loc1)
    g["dec1_Wdc"] = dot_bt(zc, g_loc1)
    g["dec2_Wds"] = dot_bt(zs2, g_loc2)
    g["dec2_Wdc"] = dot_bt(zc, g_loc2)
    g["dec1_bd"] = jnp.sum(g_loc1, axis=0)
    g["dec2_bd"] = jnp.sum(g_loc2, axis=0)
    if learn_scale:
        g["dec1_olv"] = jnp.sum(0.5 - 0.5 * jnp.square(r1) * iv1,
                                axis=0, keepdims=True) / b
        g["dec2_olv"] = jnp.sum(0.5 - 0.5 * jnp.square(r2) * iv2,
                                axis=0, keepdims=True) / b
    else:
        g["dec1_olv"] = jnp.zeros_like(olv1)
        g["dec2_olv"] = jnp.zeros_like(olv2)
    g_zs1 = dot_nt(g_loc1, sp["dec1_Wds"])
    g_zs2 = dot_nt(g_loc2, sp["dec2_Wds"])
    g_zc = dot_nt(g_loc1, sp["dec1_Wdc"]) + dot_nt(g_loc2, sp["dec2_Wdc"])

    g_jmu = g_zc
    g_jlv = g_zc * ej * 0.5 * sj

    cg = beta * beta_content / (3.0 * b)
    g_mu_a = m_a * g_jmu + cg * mu_a
    g_mu_b = m_b * g_jmu + cg * mu_b
    g_mu_c = m_c * g_jmu + cg * mu_c
    g_lv_a = m_a * g_jlv + cg * 0.5 * (jnp.exp(lv_a) - 1.0)
    g_lv_b = m_b * g_jlv + cg * 0.5 * (jnp.exp(lv_b) - 1.0)
    g_lv_c = m_c * g_jlv + cg * 0.5 * (jnp.exp(lv_c) - 1.0)

    g_cmu1 = g_mu_a + g_mu_c * (t1 / ts)
    g_cmu2 = g_mu_b + g_mu_c * (t2 / ts)
    g_t1 = g_mu_c * (cmu1 - mu_c) / ts - g_lv_c / ts
    g_t2 = g_mu_c * (cmu2 - mu_c) / ts - g_lv_c / ts
    g_clv1 = g_lv_a * ev1 * t1 + g_t1 * (-ev1 * t1 * t1)
    g_clv2 = g_lv_b * ev2 * t2 + g_t2 * (-ev2 * t2 * t2)

    cs = beta * beta_style * beta_style / b
    g_smu1 = g_zs1 + cs * smu1
    g_smu2 = g_zs2 + cs * smu2
    g_slv1 = g_zs1 * es1 * 0.5 * ss1 + cs * 0.5 * (jnp.exp(slv1) - 1.0)
    g_slv2 = g_zs2 * es2 * 0.5 * ss2 + cs * 0.5 * (jnp.exp(slv2) - 1.0)

    for e, h, (g_cmu, g_clv, g_smu, g_slv) in (
            ("enc1", h1, (g_cmu1, g_clv1, g_smu1, g_slv1)),
            ("enc2", h2, (g_cmu2, g_clv2, g_smu2, g_slv2))):
        g[f"{e}_Wcmu"] = dot_bt(h, g_cmu)
        g[f"{e}_Wclv"] = dot_bt(h, g_clv)
        g[f"{e}_Wsmu"] = dot_bt(h, g_smu)
        g[f"{e}_Wslv"] = dot_bt(h, g_slv)
        g[f"{e}_bcmu"] = jnp.sum(g_cmu, axis=0)
        g[f"{e}_bclv"] = jnp.sum(g_clv, axis=0)
        g[f"{e}_bsmu"] = jnp.sum(g_smu, axis=0)
        g[f"{e}_bslv"] = jnp.sum(g_slv, axis=0)
    g_h1 = (dot_nt(g_cmu1, sp["enc1_Wcmu"]) + dot_nt(g_clv1, sp["enc1_Wclv"])
            + dot_nt(g_smu1, sp["enc1_Wsmu"])
            + dot_nt(g_slv1, sp["enc1_Wslv"])) \
        * (h1 > 0.0).astype(jnp.float32)
    g_h2 = (dot_nt(g_cmu2, sp["enc2_Wcmu"]) + dot_nt(g_clv2, sp["enc2_Wclv"])
            + dot_nt(g_smu2, sp["enc2_Wsmu"])
            + dot_nt(g_slv2, sp["enc2_Wslv"])) \
        * (h2 > 0.0).astype(jnp.float32)
    g["enc1_Wh"] = dot_bt(x1, g_h1)
    g["enc2_Wh"] = dot_bt(x2, g_h2)
    g["enc1_bh"] = jnp.sum(g_h1, axis=0)
    g["enc2_bh"] = jnp.sum(g_h2, axis=0)
    return loss, metrics, g


# ===========================================================================
# Pallas kernel A: one step (forward + backward) per launch
# ===========================================================================
def _fused_kernel(dims, consts, learn_scale, matmul_bf16, *refs):
    n = len(SPLIT_NAMES)
    (x1_ref, x2_ref, ej_ref, es1_ref, es2_ref) = refs[:5]
    sp = {name: refs[5 + i][:] for i, name in enumerate(SPLIT_NAMES)}
    metrics_ref = refs[5 + n]
    g_refs = refs[5 + n + 1:]
    loss, metrics, g = _fwd_bwd(dims, consts, learn_scale, matmul_bf16,
                                x1_ref[:], x2_ref[:], ej_ref[:], es1_ref[:],
                                es2_ref[:], sp)
    for j, val in enumerate(metrics):
        metrics_ref[0, j] = val
    for i, name in enumerate(SPLIT_NAMES):
        g_refs[i][:] = g[name]


def fused_loss_and_grads(p: Dict[str, jnp.ndarray], x1, x2, eps_j, eps_s1,
                         eps_s2, dims: FusedDims, consts: FusedConsts,
                         learn_scale: bool = True, interpret: bool = False,
                         matmul_bf16: bool = False):
    """Run the single-step fused kernel on PACKED params; returns
    ``(loss, packed grads dict)``."""
    sp = split_params(p, dims)
    inputs = [x1, x2, eps_j, eps_s1, eps_s2] + [sp[n] for n in SPLIT_NAMES]
    out_shapes = ([jax.ShapeDtypeStruct((1, N_METRICS), jnp.float32)]
                  + [jax.ShapeDtypeStruct(sp[n].shape, jnp.float32)
                     for n in SPLIT_NAMES])
    kernel = partial(_fused_kernel, dims, consts, learn_scale, matmul_bf16)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[vmem] * len(inputs),
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vmem] * len(SPLIT_NAMES),
        interpret=interpret,
    )(*inputs)
    loss = outs[0][0, 0]
    grads_split = {n: g for n, g in zip(SPLIT_NAMES, outs[1:])}
    return loss, join_params(grads_split, dims), outs[0][0]


def make_fused_train_step(cfg, model, optimizer, interpret: bool = False,
                          donate: bool = False,
                          matmul_bf16: Optional[bool] = None):
    """jitted single-call fused step; drop-in for ``make_train_step`` on
    supported configs (full metric families emitted)."""
    import optax

    consts = FusedConsts(cfg.beta, cfg.beta_style, cfg.beta_content)
    names = [m.name for m in model.modalities]
    learn_scale = bool(cfg.learn_output_scale)
    if matmul_bf16 is None:
        matmul_bf16 = getattr(cfg, "precision", "float32") == "bfloat16"

    def step(params, opt_state, batch, rng):
        x1 = batch[names[0]]
        x2 = batch[names[1]]
        dims = dims_from(cfg, x1.shape[0])
        eps = jax.random.normal(
            rng, (dims.b, dims.cd + dims.s1 + dims.s2), jnp.float32)
        flat = flatten_params(params, model)
        loss, grads_named, mvec = fused_loss_and_grads(
            flat, x1, x2, eps[:, :dims.cd],
            eps[:, dims.cd:dims.cd + dims.s1],
            eps[:, dims.cd + dims.s1:], dims, consts,
            learn_scale=learn_scale, interpret=interpret,
            matmul_bf16=matmul_bf16)
        grads = unflatten_grads(grads_named, params, model)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {name: mvec[j]
                   for j, name in enumerate(metric_names(model))}
        return new_params, new_opt_state, loss, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


# ===========================================================================
# Pallas kernel B: a whole epoch per launch — grid over steps, params and
# Adam state resident in VMEM, batches streamed per grid step
# ===========================================================================
def _epoch_kernel(dims, consts, learn_scale, matmul_bf16, adam, *refs):
    n = len(SPLIT_NAMES)
    lr, b1, b2, adam_eps = adam
    x1_ref, x2_ref, ej_ref, es1_ref, es2_ref, count_ref = refs[:6]
    p_in = refs[6:6 + n]
    mu_in = refs[6 + n:6 + 2 * n]
    nu_in = refs[6 + 2 * n:6 + 3 * n]
    metrics_ref = refs[6 + 3 * n]
    p_out = refs[7 + 3 * n:7 + 4 * n]
    mu_out = refs[7 + 4 * n:7 + 5 * n]
    nu_out = refs[7 + 5 * n:7 + 6 * n]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for i in range(n):
            p_out[i][:] = p_in[i][:]
            mu_out[i][:] = mu_in[i][:]
            nu_out[i][:] = nu_in[i][:]

    sp = {name: p_out[i][:] for i, name in enumerate(SPLIT_NAMES)}
    loss, metrics, g = _fwd_bwd(dims, consts, learn_scale, matmul_bf16,
                                x1_ref[0], x2_ref[0], ej_ref[0], es1_ref[0],
                                es2_ref[0], sp)
    for j, val in enumerate(metrics):
        metrics_ref[step, j] = val

    # Adam (identical math to flat_adam / optax.adam, eps_root=0)
    t = (count_ref[0, 0] + step + 1).astype(jnp.float32)
    bc1 = 1.0 - jnp.exp(t * math.log(b1))
    bc2 = 1.0 - jnp.exp(t * math.log(b2))
    for i, name in enumerate(SPLIT_NAMES):
        gi = g[name]
        mu = b1 * mu_out[i][:] + (1.0 - b1) * gi
        nu = b2 * nu_out[i][:] + (1.0 - b2) * jnp.square(gi)
        mu_out[i][:] = mu
        nu_out[i][:] = nu
        p_out[i][:] = p_out[i][:] - lr * (mu / bc1) / (
            jnp.sqrt(nu / bc2) + adam_eps)


def fused_epoch(sp, mu, nu, count, x1s, x2s, ejs, es1s, es2s,
                dims: FusedDims, consts: FusedConsts, adam,
                learn_scale: bool = True, interpret: bool = False,
                matmul_bf16: bool = True):
    """One launch running ``n_steps`` fused train steps over SPLIT params.

    ``x1s``/``x2s``: ``[n_steps, B, d]`` batches; ``ejs``/``es*s``: reparam
    noise per step; ``count``: Adam step counter at entry. Returns
    ``(sp, mu, nu, metrics[n_steps, N_METRICS])`` — the full per-step scalar
    families (loss first; see METRIC_TEMPLATES).
    """
    n_steps = x1s.shape[0]
    n = len(SPLIT_NAMES)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    stream = lambda d: pl.BlockSpec((1, dims.b, d), lambda i: (i, 0, 0))
    count_arr = jnp.asarray(count, jnp.int32).reshape(1, 1)

    kernel = partial(_epoch_kernel, dims, consts, learn_scale, matmul_bf16,
                     adam)
    out_shapes = (
        [jax.ShapeDtypeStruct((n_steps, N_METRICS), jnp.float32)]
        + [jax.ShapeDtypeStruct(sp[name].shape, jnp.float32)
           for name in SPLIT_NAMES] * 3)
    # per-step metric scalars live in SMEM as a whole (n_steps, N_METRICS)
    # array — whole-array blocks sidestep the (8, 128) VMEM tiling
    # constraint for this scalars-per-step output
    out_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [whole] * (3 * n))
    inputs = ([x1s, x2s, ejs, es1s, es2s, count_arr]
              + [sp[name] for name in SPLIT_NAMES]
              + [mu[name] for name in SPLIT_NAMES]
              + [nu[name] for name in SPLIT_NAMES])
    in_specs = ([stream(dims.d1), stream(dims.d2), stream(dims.cd),
                 stream(dims.s1), stream(dims.s2),
                 pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [whole] * (3 * n))
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*inputs)
    metrics = outs[0]
    p_new = {name: outs[1 + i] for i, name in enumerate(SPLIT_NAMES)}
    mu_new = {name: outs[1 + n + i] for i, name in enumerate(SPLIT_NAMES)}
    nu_new = {name: outs[1 + 2 * n + i] for i, name in enumerate(SPLIT_NAMES)}
    return p_new, mu_new, nu_new, metrics


def make_fused_scan_train_step(cfg, model, optimizer=None,
                               interpret: bool = False,
                               matmul_bf16: Optional[bool] = None):
    """Epoch trainer on the grid kernel.

    ``(params, opt_state, batches, rngs) -> (params, opt_state, losses,
    metrics)`` with ``batches`` carrying a leading steps axis and
    ``metrics`` the full per-step scalar families (``{name: [n_steps]}``,
    same keys as the general path's ``total_loss``). ``opt_state`` is the
    :class:`multivae_tpu.train.train_step.FlatAdamState`; it is re-raveled
    into per-tensor Adam moments at the epoch boundary (cheap, once per
    launch). One device dispatch executes the whole epoch.
    """
    from jax.flatten_util import ravel_pytree

    consts = FusedConsts(cfg.beta, cfg.beta_style, cfg.beta_content)
    names = [m.name for m in model.modalities]
    learn_scale = bool(cfg.learn_output_scale)
    adam = (cfg.initial_learning_rate, cfg.beta_1, cfg.beta_2, 1e-8)
    if matmul_bf16 is None:
        # cfg.precision governs the kernel matmul dtype; at these shapes
        # (256-row matmuls) f32 measured slightly FASTER than bf16 on v5e —
        # the cast VPU cycles outweigh the MXU gain — and it is exact
        matmul_bf16 = getattr(cfg, "precision", "float32") == "bfloat16"

    def scan_steps(params, opt_state, batches, rngs):
        x1s = batches[names[0]]
        x2s = batches[names[1]]
        n_steps, b = x1s.shape[0], x1s.shape[1]
        dims = dims_from(cfg, b)
        e = dims.cd + dims.s1 + dims.s2
        eps = jax.vmap(
            lambda k: jax.random.normal(k, (b, e), jnp.float32))(rngs)
        ejs = eps[:, :, :dims.cd]
        es1s = eps[:, :, dims.cd:dims.cd + dims.s1]
        es2s = eps[:, :, dims.cd + dims.s1:]
        _, unravel = ravel_pytree(params)
        sp = split_params(flatten_params(params, model), dims)
        mu = split_params(flatten_params(unravel(opt_state.mu), model), dims)
        nu = split_params(flatten_params(unravel(opt_state.nu), model), dims)
        sp, mu, nu, mgrid = fused_epoch(
            sp, mu, nu, opt_state.count, x1s, x2s, ejs, es1s, es2s, dims,
            consts, adam, learn_scale=learn_scale, interpret=interpret,
            matmul_bf16=matmul_bf16)
        new_params = unflatten_grads(join_params(sp, dims), params, model)
        mu_tree = unflatten_grads(join_params(mu, dims), params, model)
        nu_tree = unflatten_grads(join_params(nu, dims), params, model)
        from ..train.train_step import FlatAdamState
        new_state = FlatAdamState(
            count=opt_state.count + n_steps,
            mu=ravel_pytree(mu_tree)[0],
            nu=ravel_pytree(nu_tree)[0])
        metrics = {name: mgrid[:, j]
                   for j, name in enumerate(metric_names(model))}
        return new_params, new_state, mgrid[:, 0], metrics

    return jax.jit(scan_steps)
