"""Evaluation metrics for the benchmark/parity suite (BASELINE driver
metric: "vit-s-vqgan rec PSNR/rFID").

  * PSNR / MAE / MSE on [-1, 1] images
  * codebook utilization + perplexity (standard VQGAN health metrics;
    extension over the reference, which logs none)
  * FID machinery (activation statistics + Fréchet distance) with a
    pluggable feature extractor — rFID needs InceptionV3 weights, which
    must be supplied offline (``fid_features_fn``); the math here is
    self-contained.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mae(a, b):
    return float(jnp.mean(jnp.abs(jnp.asarray(a, jnp.float32)
                                  - jnp.asarray(b, jnp.float32))))


def mse(a, b):
    return float(jnp.mean(jnp.square(jnp.asarray(a, jnp.float32)
                                     - jnp.asarray(b, jnp.float32))))


def psnr(a, b, data_range=2.0):
    """PSNR for images in [-1, 1] (data_range=2)."""
    m = mse(a, b)
    if m == 0:
        return float('inf')
    return float(10.0 * np.log10(data_range ** 2 / m))


def codebook_stats(indices, n_embed):
    """Utilization fraction and perplexity of code usage."""
    counts = np.bincount(np.asarray(indices).reshape(-1), minlength=n_embed)
    probs = counts / max(counts.sum(), 1)
    nz = probs[probs > 0]
    perplexity = float(np.exp(-np.sum(nz * np.log(nz)))) if nz.size else 0.0
    return {'usage': float((counts > 0).mean()), 'perplexity': perplexity}


# ---------------------------------------------------------------------------
# FID
# ---------------------------------------------------------------------------

def activation_statistics(features):
    """features: (N, D) → (mu, sigma)."""
    feats = np.asarray(features, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """Fréchet distance between two Gaussians (the FID formula)."""
    from scipy import linalg  # scipy ships with jax
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid(real_features, fake_features):
    """FID between two feature sets (N, D) — e.g. InceptionV3 pool3 for
    standard rFID, or any embedding for a relative comparison."""
    mu1, s1 = activation_statistics(real_features)
    mu2, s2 = activation_statistics(fake_features)
    return frechet_distance(mu1, s1, mu2, s2)


_EXTRACTOR_CACHE = {}


def inception_extractor(weights='auto'):
    """Returns (features_fn images→(N,2048), variant_str).

    weights: 'auto' = converted InceptionV3 npz from assets/ when present,
    else the fixed-seed random-feature substitute ('rfid-rand', deterministic
    and internally consistent but NOT literature-comparable — see
    models/inception.py); a path loads that npz.

    Memoized per weights spec: rfid() runs inside training eval loops and
    must not re-initialize the ~24M-param network every call."""
    import os

    from ..models import inception as inc
    default = os.path.join(os.path.dirname(__file__), '..', 'assets',
                           'inception_v3.npz')
    if weights == 'auto':
        # key on the RESOLVED target, not the literal 'auto': if the npz
        # asset appears mid-process, later calls must pick it up instead of
        # silently keeping the random-feature substitute (ADVICE r2)
        weights = default if os.path.exists(default) else None
    cache_key = weights
    if cache_key in _EXTRACTOR_CACHE:
        return _EXTRACTOR_CACHE[cache_key]
    if weights is None:
        params, variant = inc.init_inception(), 'rfid-rand'
    else:
        params, variant = inc.load_inception(weights), 'rfid-inception'

    def features(images, batch=32):
        imgs = np.asarray(images, np.float32)
        out = [np.asarray(inc.pool3_features(params, imgs[i:i + batch]))
               for i in range(0, imgs.shape[0], batch)]
        return np.concatenate(out, axis=0)

    _EXTRACTOR_CACHE[cache_key] = (features, variant)
    return features, variant


def rfid(real_images, fake_images, weights='auto', batch=32):
    """Reconstruction FID between image sets in [-1, 1] NHWC.
    Returns (value, variant_str) — variant is 'rfid-inception' with real
    converted weights, 'rfid-rand' with the documented substitute."""
    features, variant = inception_extractor(weights)
    return fid(features(real_images, batch),
               features(fake_images, batch)), variant
