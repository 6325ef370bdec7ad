"""Fused Pallas kernels for the DAA hot loops (forward-only).

Reference loops: ``workflow.py:388-419`` — per validation round, ``M``
stochastic reconstruction passes (mean clinical loc/scale + rois loc) and an
``n_samples x n_scores`` avatar decode sweep, each a full model call. Here
both become ONE Pallas launch each, with model params resident in VMEM and a
grid over passes/cells:

* the ROI-encoder posteriors do not depend on the perturbed clinical column,
  so they are computed once outside and passed in;
* per avatar cell only the clinical encoder (2 matmuls), the 3-subset PoE
  fusion, mixture selection, reparameterization and the ROI decoder
  (2 matmuls) execute.

Supported for ALL FOUR methods on the flagship architecture
(:func:`supports_fused_sweep` — the method only changes the joint-fusion
block of the cell kernel). Deterministic (``sample_latents=False``) outputs
are tested to match the general path exactly per method.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_step import (
    POE_EPS,
    FusedDims,
    _mixture_bounds,
    dims_from,
    flatten_params,
    split_params,
)


def supports_fused_sweep(cfg, model, batch) -> bool:
    """The decode sweep fuses for any method on the flagship architecture
    (the method only selects the joint-fusion formula; decoding itself is
    method-independent)."""
    from .fused_methods import supports_method_fused
    from .fused_step import supports_fused

    return (supports_fused(cfg, model, batch)
            or supports_method_fused(cfg, model, batch))

ENC_NAMES = ("Wh", "bh", "Wcmu", "bcmu", "Wclv", "bclv",
             "Wsmu", "bsmu", "Wslv", "bslv")
DEC_NAMES = ("Wds", "Wdc", "bd", "olv")


def _avatar_kernel(dims: FusedDims, sample_latents: bool, pack: int,
                   method: str, *refs):
    """Grid over blocks of ``pack`` (sample, score) cells; decode ROI means.

    Packing widens every matmul from ``B`` to ``pack * B`` rows so the MXU
    sees usefully sized tiles (B is typically 25-50 subjects). The per-cell
    math is row-wise, so packed results are bit-identical to ``pack=1``;
    the mixture-partition masks repeat per cell (static constants)."""
    # inputs: cdata [1,pack*B,d1] stream, eps [1,pack*B,cd+s2] stream,
    #         enc1 params (10), dec2 params (4), rois posteriors tiled to
    #         pack*B rows (cmu2, clv2, smu2, slv2) whole
    # outputs: avatars [1,pack*B,d2] stream
    (cdata_ref, eps_ref) = refs[:2]
    e1 = {n: refs[2 + i] for i, n in enumerate(ENC_NAMES)}
    d2p = {n: refs[2 + 10 + i] for i, n in enumerate(DEC_NAMES)}
    cmu2_ref, clv2_ref, smu2_ref, slv2_ref = refs[16:20]
    out_ref = refs[20]

    cd = dims.cd
    k1, k2 = _mixture_bounds(dims.b)

    def dot(a, bb):
        return jnp.dot(a, bb, preferred_element_type=jnp.float32)

    x1 = cdata_ref[0]
    h1 = jnp.maximum(dot(x1, e1["Wh"][:]) + e1["bh"][:][None, :], 0.0)
    cmu1 = dot(h1, e1["Wcmu"][:]) + e1["bcmu"][:][None, :]
    clv1 = dot(h1, e1["Wclv"][:]) + e1["bclv"][:][None, :]

    cmu2 = cmu2_ref[:]
    clv2 = clv2_ref[:]
    t1 = 1.0 / (jnp.exp(clv1) + POE_EPS)
    t2 = 1.0 / (jnp.exp(clv2) + POE_EPS)
    tp = 1.0 / (1.0 + POE_EPS)
    ts = t1 + t2 + tp
    mu_c = (cmu1 * t1 + cmu2 * t2) / ts  # full-set PoE (+ prior expert)

    smu2 = smu2_ref[:]
    if sample_latents:
        # joint via deterministic mixture selection (inference sample=True);
        # the row partition repeats within each packed cell, so the mask is
        # an iota modulo the per-cell batch size. The mixture components
        # are method-selected (BaseMMVae.py:125-134): joint_elbo mixes both
        # eps-adjusted singletons + the PoE; moe mixes the raw experts;
        # jsd mixes the raw experts + a unit expert; poe IS the PoE.
        rows = jax.lax.broadcasted_iota(jnp.int32, (pack * dims.b, 1), 0)
        rows = jax.lax.rem(rows, dims.b)
        lv_c = -jnp.log(ts)
        if method == "joint_elbo":
            m_a = (rows < k1).astype(jnp.float32)
            m_b = jnp.logical_and(rows >= k1, rows < k2).astype(jnp.float32)
            m_c = (rows >= k2).astype(jnp.float32)
            joint_mu = m_a * cmu1 + m_b * cmu2 + m_c * mu_c
            lv_a = jnp.log(jnp.exp(clv1) + POE_EPS)
            lv_b = jnp.log(jnp.exp(clv2) + POE_EPS)
            joint_lv = m_a * lv_a + m_b * lv_b + m_c * lv_c
        elif method == "moe":
            kh = dims.b // 2
            m_a = (rows < kh).astype(jnp.float32)
            m_b = (rows >= kh).astype(jnp.float32)
            joint_mu = m_a * cmu1 + m_b * cmu2
            joint_lv = m_a * clv1 + m_b * clv2
        elif method == "jsd":
            m_a = (rows < k1).astype(jnp.float32)
            m_b = jnp.logical_and(rows >= k1, rows < k2).astype(jnp.float32)
            joint_mu = m_a * cmu1 + m_b * cmu2   # unit rows: mu = 0
            joint_lv = m_a * clv1 + m_b * clv2   # unit rows: logvar = 0
        else:  # poe
            joint_mu, joint_lv = mu_c, lv_c
        eps = eps_ref[0]
        zc = joint_mu + eps[:, :cd] * jnp.exp(0.5 * joint_lv)
        zs2 = smu2 + eps[:, cd:] * jnp.exp(0.5 * slv2_ref[:])
    else:
        # inference sample=False: joint is the MEAN over the selected
        # subset mixture (BaseMMVae.py:227-229), styles at their means
        if method == "joint_elbo":
            zc = (cmu1 + cmu2 + mu_c) / 3.0
        elif method == "moe":
            zc = (cmu1 + cmu2) / 2.0
        elif method == "jsd":
            zc = (cmu1 + cmu2) / 3.0  # + the zero-mean unit expert
        else:  # poe
            zc = mu_c
        zs2 = smu2

    loc = dot(zs2, d2p["Wds"][:]) + dot(zc, d2p["Wdc"][:]) \
        + d2p["bd"][:][None, :]
    out_ref[0] = loc


def build_cell_grid(clinical, scores_values):
    """Modified-clinical tensor for every (sample, score) perturbation cell:
    ``[n_samples * n_scores, B, d1]`` (tiny; built in XLA)."""
    n_samples, b, n_scores = scores_values.shape
    eye = jnp.eye(n_scores, dtype=clinical.dtype)           # [S, C]
    # cdata[p, s, b, c] = clinical[b, c]*(1-eye[s,c]) + scores[p,b,s]*eye[s,c]
    cdata = (clinical[None, None] * (1.0 - eye)[None, :, None, :]
             + scores_values.transpose(0, 2, 1)[:, :, :, None]
             * eye[None, :, None, :])
    return cdata.reshape(n_samples * n_scores, b, clinical.shape[-1])


def sweep_cells(sp, posteriors, cdata, eps, dims: FusedDims,
                sample_latents: bool, interpret: bool = False,
                cells_per_block: int | None = None,
                method: str = "joint_elbo"):
    """Run the avatar grid kernel over prepared cells.

    ``sp``: split params; ``posteriors``: cell-invariant rois posteriors
    ``(cmu2, clv2, smu2, slv2)``; ``cdata [n_cells, B, d1]`` perturbed
    clinical; ``eps [n_cells, B, cd+s2]`` reparam noise. Returns decoded
    ROI locs ``[n_cells, B, d2]``. This is the per-device body of the
    multi-chip sharded sweep (cells shard over the mesh; params and
    posteriors replicate).

    ``cells_per_block`` packs that many cells into each grid step (default:
    enough for ~512 matmul rows) — bit-identical results, bigger MXU tiles.
    """
    n_cells, b = cdata.shape[0], cdata.shape[1]
    pack = cells_per_block or max(1, 512 // b)
    # VMEM guard: streamed blocks (cdata, eps, out, double-buffered) plus
    # the tiled posteriors must stay well under the ~16 MB scoped limit
    row_bytes = 4 * (dims.d1 + dims.cd + dims.s2 + 2 * dims.d2
                     + 2 * dims.cd + 2 * dims.s2)
    max_rows = max(b, int(6e6) // max(row_bytes, 1))
    pack = min(pack, max_rows // b)
    pack = max(1, min(pack, n_cells))
    pad = (-n_cells) % pack
    if pad:
        cdata = jnp.concatenate([cdata, cdata[:pad]])
        eps = jnp.concatenate([eps, eps[:pad]])
    n_blocks = (n_cells + pad) // pack
    cdata = cdata.reshape(n_blocks, pack * b, dims.d1)
    eps = eps.reshape(n_blocks, pack * b, -1)
    posteriors = tuple(jnp.tile(x, (pack, 1)) for x in posteriors)

    e1 = [sp[f"enc1_{n}"] for n in ENC_NAMES]
    d2p = [sp[f"dec2_{n}"] for n in DEC_NAMES]
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    stream_in = lambda d: pl.BlockSpec((1, pack * b, d),
                                       lambda i: (i, 0, 0))

    kernel = partial(_avatar_kernel, dims, sample_latents, pack, method)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((n_blocks, pack * b, dims.d2),
                                       jnp.float32),
        in_specs=([stream_in(dims.d1), stream_in(dims.cd + dims.s2)]
                  + [whole] * (10 + 4 + 4)),
        out_specs=stream_in(dims.d2),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(cdata, eps, *e1, *d2p, *posteriors)
    return out.reshape(n_blocks * pack, b, dims.d2)[:n_cells]


def rois_posteriors(model, params, rois):
    """Cell-invariant ROI-encoder posteriors, encoded once in XLA."""
    names = [m.name for m in model.modalities]
    enc = model.apply({"params": params}, {names[1]: rois}, method="encode")
    cmu2, clv2 = enc[names[1]]
    smu2, slv2 = enc[names[1] + "_style"]
    return cmu2, clv2, smu2, slv2


_sweep_jit_cache = {}


def fused_avatar_sweep(model, params, data, scores_values,
                       sample_latents: bool, rng, cfg,
                       interpret: bool = False):
    """Pallas-gridded avatar sweep; drop-in result layout for
    :func:`multivae_tpu.analysis.daa.avatar_sweep`:
    ``[B, n_scores, n_samples, n_rois]``.

    The whole sweep (cell-grid build, posterior encode, noise draw, kernel,
    relayout) is jitted per (model, flags) so repeated validation rounds
    cost one device dispatch each — eager execution would pay a relay
    round-trip per op."""
    names = [m.name for m in model.modalities]
    key = (id(model), id(cfg), cfg.method, bool(sample_latents),
           bool(interpret))
    cached = _sweep_jit_cache.get(key)
    if cached is None or cached[0] is not model:
        def _run(params, clinical, rois, scores_values, rng):
            n_samples, b, n_scores = scores_values.shape
            dims = dims_from(cfg, b)
            sp = split_params(flatten_params(params, model), dims)
            cdata = build_cell_grid(clinical, scores_values)
            n_cells = n_samples * n_scores
            posteriors = rois_posteriors(model, params, rois)
            eps = jax.random.normal(rng, (n_cells, b, dims.cd + dims.s2),
                                    jnp.float32)
            out = sweep_cells(sp, posteriors, cdata, eps, dims,
                              sample_latents, interpret=interpret,
                              method=cfg.method)
            # [n_cells, B, R] = [n_samples*n_scores, B, R]
            out = out.reshape(n_samples, n_scores, b, dims.d2)
            return jnp.transpose(out, (2, 1, 0, 3))

        cached = (model, jax.jit(_run))
        _sweep_jit_cache[key] = cached
    return cached[1](params, jnp.asarray(data[names[0]]),
                     jnp.asarray(data[names[1]]),
                     jnp.asarray(scores_values), rng)
