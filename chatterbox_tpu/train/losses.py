"""Training losses, parity with the reference's latent training paths.

The reference ships loss functions but no trainer (SURVEY.md §0.6): T3's
masked CE (t3/t3.py:167-201, via models/t3/t3.t3_loss) and the CFM loss with
training-time CFG dropout (flow_matching.py:146-185) implemented here.
"""

import jax
import jax.numpy as jnp

from ..models.s3gen.flow import FlowConfig
from ..models.s3gen.unet import unet_forward


def cfm_loss(p, cfg: FlowConfig, x1, mask, mu, spks, cond, rng):
    """Conditional flow-matching loss (flow_matching.py:146-185).

    x1, mu, cond: (B, T, 80); mask: (B, T) bool; spks: (B, 80).
    CFG dropout: with prob training_cfg_rate a sample's conditioning is
    zeroed (mode-coverage / fidelity tradeoff, flow_matching.py:176-181).
    """
    b = x1.shape[0]
    k_t, k_z, k_cfg = jax.random.split(rng, 3)
    t = jax.random.uniform(k_t, (b,))
    t = 1.0 - jnp.cos(t * 0.5 * jnp.pi)  # cosine schedule
    z = jax.random.normal(k_z, x1.shape, x1.dtype)

    sig = cfg.sigma_min
    tb = t[:, None, None]
    y = (1.0 - (1.0 - sig) * tb) * z + tb * x1
    u = x1 - (1.0 - sig) * z

    if cfg.training_cfg_rate > 0:
        keep = (jax.random.uniform(k_cfg, (b,)) > cfg.training_cfg_rate).astype(x1.dtype)
        mu = mu * keep[:, None, None]
        spks = spks * keep[:, None]
        cond = cond * keep[:, None, None]

    pred = unet_forward(p["estimator"], cfg.estimator, y, mu, spks, cond, t, mask)
    m = mask[..., None].astype(x1.dtype)
    num = jnp.sum(((pred - u) * m) ** 2)
    den = jnp.maximum(jnp.sum(m) * x1.shape[-1], 1.0)
    return num / den
