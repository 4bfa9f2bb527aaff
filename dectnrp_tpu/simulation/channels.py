"""Channel models: AWGN, flat fading, doubly-selective Rayleigh.

TPU-native counterparts of the reference's per-edge channel models
(lib/src/simulation/wireless/channel_{awgn,flat,doubly}.cpp): pure functions
over batched IQ tensors, jit-able, keyed PRNG. The doubly-selective model is a
tap-delay-line with sum-of-sinusoids (Jakes/Clarke) Doppler evolution per tap,
matching link.cpp:39-199's construction (scaled ITU PDP taps, deterministic
per-key).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# ITU pedestrian/vehicular-style power delay profiles (delay ns, power dB) --
# same tap families the reference scales by tau_rms (channel_doubly ctor).
PDP_TABLE = {
    0: (np.array([0.0, 110.0, 190.0, 410.0]),
        np.array([0.0, -9.7, -19.2, -22.8])),                 # ITU Ped A
    1: (np.array([0.0, 200.0, 800.0, 1200.0, 2300.0, 3700.0]),
        np.array([0.0, -0.9, -4.9, -8.0, -7.8, -23.9])),      # ITU Ped B
    2: (np.array([0.0, 310.0, 710.0, 1090.0, 1730.0, 2510.0]),
        np.array([0.0, -1.0, -9.0, -10.0, -15.0, -20.0])),    # ITU Veh A
}


def awgn(key: jax.Array, iq: jax.Array, noise_var) -> jax.Array:
    """Add complex white Gaussian noise of per-sample variance noise_var."""
    k1, k2 = jax.random.split(key)
    std = jnp.sqrt(noise_var / 2.0)
    n = (jax.random.normal(k1, iq.shape, dtype=jnp.float32)
         + 1j * jax.random.normal(k2, iq.shape, dtype=jnp.float32))
    return iq + std * n.astype(jnp.complex64)


def noise_var_for_snr(signal_power: float | jax.Array, snr_db) -> jax.Array:
    """Per-sample noise variance for a target in-band SNR (signal is in-band)."""
    return signal_power / (10.0 ** (jnp.asarray(snr_db) / 10.0))


def flat_fading(key: jax.Array, iq: jax.Array, n_rx: int) -> tuple[jax.Array, jax.Array]:
    """Frequency-flat Rayleigh MIMO channel.

    iq [B, N_TX, n] -> (y [B, n_rx, n], H [B, n_rx, N_TX]); E|h|^2 = 1.
    """
    B, n_tx, _ = iq.shape
    kr, ki = jax.random.split(key)
    H = (jax.random.normal(kr, (B, n_rx, n_tx)) +
         1j * jax.random.normal(ki, (B, n_rx, n_tx))) / np.sqrt(2.0)
    y = jnp.einsum("brt,btn->brn", H.astype(jnp.complex64), iq)
    return y, H


def _doubly_impl(key: jax.Array, iq: jax.Array, n_rx: int,
                 samp_rate: float, tau_rms_s: float,
                 doppler_hz: float, pdp_idx: int,
                 n_taps_max: int, n_sin: int):
    """Shared tap-delay-line construction: returns (y, h, active) with
    h [B, n_rx, N_TX, L, n] the per-tap time-varying gains and `active` the
    integer sample delays of the L live taps."""
    delays_ns, powers_db = PDP_TABLE[pdp_idx]
    ref_rms = float(np.sqrt(
        np.average(delays_ns**2, weights=10**(powers_db / 10))
        - np.average(delays_ns, weights=10**(powers_db / 10)) ** 2)) * 1e-9
    delays_s = delays_ns * 1e-9 * (tau_rms_s / ref_rms)
    tap_idx = np.round(delays_s * samp_rate).astype(int)
    tap_idx = np.minimum(tap_idx, n_taps_max - 1)
    p_lin = 10 ** (powers_db / 10)
    p_lin = p_lin / p_lin.sum()
    # accumulate same-sample taps
    tap_pow = np.zeros(n_taps_max)
    for t, p in zip(tap_idx, p_lin):
        tap_pow[t] += p
    active = np.nonzero(tap_pow)[0]
    amps = np.sqrt(tap_pow[active])                     # [L]
    L = active.size

    B, n_tx, n = iq.shape
    k_th, k_ph = jax.random.split(key)
    # Jakes: per (B, rx, tx, tap, sinusoid) random arrival angle + phase
    theta = jax.random.uniform(k_th, (B, n_rx, n_tx, L, n_sin), maxval=2 * np.pi)
    phi = jax.random.uniform(k_ph, (B, n_rx, n_tx, L, n_sin), maxval=2 * np.pi)
    t = jnp.arange(n) / samp_rate                        # [n]
    # h[...,l,t] = amp_l/sqrt(n_sin) * sum_s exp(j(2 pi fD cos(theta_s) t + phi_s))
    fd = 2 * np.pi * doppler_hz * jnp.cos(theta)         # [...,L,S]
    ph = fd[..., None] * t + phi[..., None]              # [...,L,S,n]
    h = jnp.sum(jnp.exp(1j * ph), axis=-2) / np.sqrt(n_sin)   # [B,R,T,L,n]
    h = h * jnp.asarray(amps, dtype=jnp.complex64)[:, None]

    # tap-delay-line convolution: y[r, m] = sum_t sum_l h[r,t,l,m] x[t, m - d_l]
    x_pad = jnp.pad(iq, ((0, 0), (0, 0), (n_taps_max - 1, 0)))
    y = jnp.zeros((B, n_rx, n), dtype=jnp.complex64)
    for li, d in enumerate(active):
        x_shift = jax.lax.dynamic_slice_in_dim(
            x_pad, n_taps_max - 1 - int(d), n, axis=2)   # x[t, m-d]
        y = y + jnp.einsum("brtn,btn->brn", h[:, :, :, li], x_shift)
    return y, h, active


@partial(jax.jit, static_argnames=("n_rx", "samp_rate", "tau_rms_s",
                                   "doppler_hz", "pdp_idx", "n_taps_max", "n_sin"))
def doubly_selective(key: jax.Array, iq: jax.Array, n_rx: int,
                     samp_rate: float, tau_rms_s: float = 363e-9,
                     doppler_hz: float = 222.0, pdp_idx: int = 0,
                     n_taps_max: int = 16, n_sin: int = 8) -> jax.Array:
    """Doubly-selective Rayleigh channel (tap-delay-line + sum-of-sinusoids).

    iq [B, N_TX, n] -> y [B, n_rx, n]. Taps from the selected ITU PDP scaled
    to tau_rms_s, each evolving as a sum of n_sin Jakes sinusoids with maximum
    Doppler doppler_hz (reference link.cpp sum-of-sinusoids construction).
    """
    y, _, _ = _doubly_impl(key, iq, n_rx, samp_rate, tau_rms_s, doppler_hz,
                           pdp_idx, n_taps_max, n_sin)
    return y


@partial(jax.jit, static_argnames=("n_rx", "samp_rate", "tau_rms_s",
                                   "doppler_hz", "pdp_idx", "n_taps_max",
                                   "n_sin", "sym_centers", "k_occ", "N"))
def doubly_selective_genie(key: jax.Array, iq: jax.Array, n_rx: int,
                           samp_rate: float, sym_centers: tuple[int, ...],
                           k_occ: tuple[int, ...], N: int,
                           tau_rms_s: float = 363e-9,
                           doppler_hz: float = 222.0, pdp_idx: int = 0,
                           n_taps_max: int = 16, n_sin: int = 8):
    """doubly_selective + the TRUE per-symbol frequency response.

    Returns (y [B, n_rx, n], H [B, n_rx, N_TX, S, N_occ]) with
    H[..., s, k] = sum_l h_l(t = sym_centers[s]) * exp(-j 2 pi k_occ[k] d_l / N)
    — the genie channel-state for diagnostic runs separating channel-
    estimation loss from Rayleigh outage (chestim ablation; the reference
    has no such mode, its channel_lut quality is judged only by PER).
    """
    y, h, active = _doubly_impl(key, iq, n_rx, samp_rate, tau_rms_s,
                                doppler_hz, pdp_idx, n_taps_max, n_sin)
    hs = h[..., jnp.asarray(np.asarray(sym_centers, np.int32))]  # [B,R,T,L,S]
    ph = np.exp(-2j * np.pi
                * np.asarray(k_occ)[None, :] * np.asarray(active)[:, None]
                / N).astype(np.complex64)                        # [L, N_occ]
    H = jnp.einsum("brtls,lk->brtsk", hs, jnp.asarray(ph))
    return y, H
