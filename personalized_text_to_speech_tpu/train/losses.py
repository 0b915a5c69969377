"""GAN + VAE losses (reference ``losses.py:7-61``).

All losses accumulate in fp32 regardless of the compute dtype, mirroring the
reference's ``.float()`` casts inside its autocast regions.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """L1 feature matching over all discriminator feature maps ×2
    (reference ``losses.py:7-15``)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl.astype(jnp.float32))
            gl = gl.astype(jnp.float32)
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(
    disc_real_outputs: Sequence[jnp.ndarray],
    disc_generated_outputs: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """LSGAN discriminator loss (1−D(y))² + D(ŷ)² (reference ``losses.py:18-31``)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        r_loss = jnp.mean((1.0 - dr) ** 2)
        g_loss = jnp.mean(dg ** 2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(
    disc_outputs: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """LSGAN generator loss (1−D(ŷ))² (reference ``losses.py:34-43``)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        dg = dg.astype(jnp.float32)
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask) -> jnp.ndarray:
    """Masked Gaussian KL(q‖p) on flowed latents (reference ``losses.py:46-61``).

    z_p, logs_q, m_p, logs_p: [B, T, C]; z_mask: [B, T, 1].
    """
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)

    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    return kl / jnp.sum(z_mask)
