"""Welch PSD and band-power analysis (EDA stage).

jnp re-implementation of the reference's ``scipy.signal.welch`` usage
(ref 01_data_exploration.py:384-507): Hann-windowed segments with 50%
overlap, periodogram averaging, density scaling. Used for the spectral EDA
figures and the alpha closed/open biomarker (ref 01:470-476).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CANONICAL_BANDS: Dict[str, Tuple[float, float]] = {
    "delta": (0.5, 4.0),
    "theta": (4.0, 8.0),
    "alpha": (8.0, 13.0),
    "beta": (13.0, 30.0),
    "gamma": (30.0, 45.0),
}


@functools.partial(jax.jit, static_argnames=("nperseg", "fs"))
def _welch(x: jnp.ndarray, fs: float, nperseg: int) -> jnp.ndarray:
    """(..., T) -> (..., nperseg//2+1) PSD, Hann window, 50% overlap, density scaling."""
    t = x.shape[-1]
    step = nperseg // 2
    n_seg = (t - nperseg) // step + 1
    idx = np.arange(nperseg)[None, :] + step * np.arange(n_seg)[:, None]
    segs = x[..., idx]  # (..., n_seg, nperseg)
    segs = segs - jnp.mean(segs, axis=-1, keepdims=True)  # detrend='constant'
    # periodic Hann window (scipy.signal.welch default sym=False)
    win = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(nperseg) / nperseg)
    spec = jnp.fft.rfft(segs * win, axis=-1)
    scale = 1.0 / (fs * jnp.sum(win**2))
    psd = (jnp.abs(spec) ** 2) * scale
    # one-sided: double all bins except DC and (even-nperseg) Nyquist
    last = psd.shape[-1] - 1
    factor = jnp.ones(psd.shape[-1]).at[1:].set(2.0)
    if nperseg % 2 == 0:
        factor = factor.at[last].set(1.0)
    psd = psd * factor
    return jnp.mean(psd, axis=-2)


def welch_psd(
    x: np.ndarray | jnp.ndarray, fs: float = 500.0, nperseg: int = 1024
) -> Tuple[np.ndarray, np.ndarray]:
    """Welch PSD along the last axis; returns (freqs, psd)."""
    x = jnp.asarray(x, jnp.float32)
    nperseg = min(nperseg, x.shape[-1])
    psd = _welch(x, float(fs), int(nperseg))
    freqs = np.fft.rfftfreq(nperseg, 1.0 / fs)
    return freqs, np.asarray(psd)


def band_power(
    freqs: np.ndarray, psd: np.ndarray, band: Tuple[float, float]
) -> np.ndarray:
    """Integrated band power via trapezoid rule over [lo, hi)."""
    lo, hi = band
    mask = (freqs >= lo) & (freqs < hi)
    if mask.sum() < 2:
        return np.sum(psd[..., mask], axis=-1)
    return np.trapezoid(psd[..., mask], freqs[mask], axis=-1)


def band_power_summary(
    x: np.ndarray, fs: float = 500.0, nperseg: int = 1024
) -> Dict[str, np.ndarray]:
    """All canonical band powers for (..., T) signals."""
    freqs, psd = welch_psd(x, fs, nperseg)
    return {name: band_power(freqs, psd, b) for name, b in CANONICAL_BANDS.items()}
