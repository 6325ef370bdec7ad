"""multivae_tpu — a TPU-native (JAX/XLA/pjit/Pallas) multimodal-VAE framework.

Brand-new implementation of the capabilities of
``neurospin-projects/2022_cambroise_interpret_multivae`` (reference mounted at
``/root/reference``): MVAE (PoE), MMVAE (MoE), MoPoE (joint ELBO) and JSD
multimodal VAEs on multi-block tabular cohorts with missing-modality support,
plus the downstream interpretability suite (Digital Avatars Analysis, RSA,
ANOVA site-effect checks, univariate baselines, IWAE/FID/PRD evaluation and
plotting).

Architecture (TPU-first, not a port):
  * ``ops``      — pure-jnp math primitives: Gaussian KL, PoE fusion, masked
                   2^M subset fusion (single einsum), mixture selection,
                   likelihood log-probs. Pallas kernels for hot fused paths.
  * ``models``   — flax encoders/decoders + the presence-masked MultimodalVAE.
  * ``train``    — jitted train step (all 4 method variants), optax Adam,
                   epoch runner, checkpoints, metric logging.
  * ``data``     — multiblock fetchers with the reference's on-disk npy/tsv
                   contract, stratified splitting, scalers/residualizers,
                   subset-homogeneous batching, synthetic cohorts.
  * ``eval``     — IWAE likelihood estimation, PRD, FID on feature vectors.
  * ``analysis`` — DAA avatar sweeps as batched decode grids + closed-form
                   hierarchical regression, RSA (Kendall tau), ANOVA,
                   univariate baselines, robustness.
  * ``parallel`` — jax.sharding mesh helpers (ensemble x data axes).
  * ``viz``      — matplotlib plotting (radar, mosaics, histograms).
"""

__version__ = "0.1.0"
