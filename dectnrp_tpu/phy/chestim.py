"""Channel estimation interpolators for the synchronized RX path.

TPU-native counterpart of the reference's Wiener-LUT interpolation
(lib/src/phy/rx/rx_synced/channel_estimation/channel_lut.cpp): per transmit
stream, ZF estimates at DRS cells are expanded to the full
[symbol x occupied-subcarrier] grid by two static linear operators applied as
matmuls (MXU-friendly):

  frequency: per DRS comb offset c in {0..3}, Wf[c] of [N_occ, N_occ/4]
  time:      T of [N_TS, S, n_drs_symb]

The frequency operator defaults to Wiener MMSE weights solved offline from a
rectangular delay power profile (same Wiener-Hopf Rpp w = rdp construction as
reference wiener.hpp:43-139, windowless full-comb variant); `kind="linear"`
falls back to clamped linear interpolation. Time interpolation implements the
reference's two modes (rx_synced.cpp run_pdc_ps_in_chestim_mode_lr_{t,f}):
"lr_t" (interpolate between left/right DRS symbols) and "lr_f" (causal,
latest left DRS only).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..sections.part3 import drs as drs_mod


def _pilot_positions(n_occ: int, comb: int) -> np.ndarray:
    """Occupied-subcarrier positions of the DRS comb with offset `comb`."""
    return np.arange(n_occ // 4) * 4 + comb


def _linear_matrix(n_occ: int, comb: int) -> np.ndarray:
    """Clamped linear interpolation from the comb pilots to all subcarriers."""
    pos = _pilot_positions(n_occ, comb).astype(np.float64)
    W = np.zeros((n_occ, pos.size))
    for k in range(n_occ):
        j = np.searchsorted(pos, k)
        if j == 0:
            W[k, 0] = 1.0
        elif j >= pos.size:
            W[k, -1] = 1.0
        else:
            x0, x1 = pos[j - 1], pos[j]
            w = (k - x0) / (x1 - x0)
            W[k, j - 1] = 1.0 - w
            W[k, j] = w
    return W


def _wiener_matrix(n_occ: int, comb: int, tau_rms_norm: float, snr_db: float,
                   centered: bool = False) -> np.ndarray:
    """Wiener MMSE interpolation from comb pilots to all subcarriers.

    Channel model: SYMMETRIC uniform delay power profile over [-a, a] with
    a = sqrt(3) * tau_rms_norm (tau_rms in units of 1/subcarrier-spacing,
    i.e. tau_rms * delta_f), giving the REAL frequency correlation
    r(dk) = sinc(2 a dk) — matching the reference's real-valued weights
    (RX_SYNCED_PARAM_WEIGHTS_TYPE_REAL, rx_synced_param.hpp:200) and robust
    to the channel's mean group delay (which the fractional-STO derotation
    removes, so the residual PDP is roughly centered; an asymmetric model
    would bake in a systematic phase ramp — the r03 fading floor had
    exactly that failure mode). Solves (Rpp + sigma^2 I) w_k = r_dp(k) per
    subcarrier (one dense solve, reused via matmul at runtime) — the same
    Wiener-Hopf construction as reference wiener.hpp:43-139 with a
    full-comb window.

    centered: kept for API stability; the symmetric model is identical
    either way.
    """
    pos = _pilot_positions(n_occ, comb).astype(np.float64)
    # cap the modeled half-width at half the CP: delays beyond the cyclic
    # prefix are not equalizable anyway, and a model that decorrelates
    # faster than one pilot spacing makes the solve useless. CP/2 in
    # normalized units is 2.3 us * (27 kHz * u) / u = 0.0625 — u-free.
    a = min(np.sqrt(3.0) * tau_rms_norm, 0.0625)

    def corr(dk):
        return np.sinc(2.0 * a * np.asarray(dk, np.float64))

    # r(dk) = E[H(f) H(f - dk)^*]; Rpp[i,j] = r(p_i - p_j), Rdp[k,j] = r(k - p_j)
    Rpp = corr(pos[:, None] - pos[None, :])
    snr = 10.0 ** (snr_db / 10.0)
    A = Rpp + (1.0 / snr) * np.eye(pos.size)
    k_all = np.arange(n_occ, dtype=np.float64)
    Rdp = corr(k_all[:, None] - pos[None, :])            # [n_occ, n_pilots]
    W = np.linalg.solve(A.T, Rdp.T).T                     # W = Rdp @ inv(A)
    # flat-channel unbiasedness: the regularized MMSE solution shrinks a
    # constant channel by sum_j w_kj < 1, which scales the equalized QAM
    # constellation and breaks 16QAM+ decisions (seen at u=8: 50% TB loss
    # on pure AWGN). Row-normalize so a flat channel passes exactly; the
    # noise-suppression penalty is second-order.
    return W / np.sum(W, axis=1, keepdims=True)


# Channel-statistics presets mirroring the reference's triples
# (RX_SYNCED_PARAM_TAU_RMS_SEC_VEC {0.1e-6, 0.1e-6, 1.0e-6} x
#  RX_SYNCED_PARAM_SNR_DB_VEC {-5, 15, 35}, rx_synced_param.hpp:216-232;
# runtime picks by closest estimated SNR, rx_synced.cpp:863-891).
# The high-SNR preset assumes the WIDE delay spread: with little noise to
# suppress, the filter must pass all of the channel's selectivity — a
# narrow assumption there filters out real late taps and produces an
# SNR-independent PER floor (the r03 fading floor; genie-chestim runs in
# results/loopback_snr/fading_genie showed the floor was entirely
# estimation loss, not Rayleigh outage).
WIENER_PRESETS = ((100e-9, -5.0), (100e-9, 15.0), (1000e-9, 35.0))


@lru_cache(maxsize=None)
def freq_interp_matrices(b: int, kind: str = "wiener",
                         tau_rms_s: float = 363e-9, snr_db: float = 30.0,
                         centered: bool = False, u: int = 1) -> np.ndarray:
    """[4, N_occ, N_occ/4] frequency interpolators, one per comb offset."""
    n_occ = 56 * b
    if kind == "linear":
        mats = [_linear_matrix(n_occ, c) for c in range(4)]
        return np.stack(mats).astype(np.complex64)
    delta_f = 27000.0 * u  # subcarrier spacing scales with the numerology:
    # a physical tau spans u x more phase per subcarrier at higher u, so the
    # correlation model must use the real spacing (an under-modeled delay
    # window filters out real selectivity — the fading-floor failure class)
    tau = tau_rms_s * delta_f
    mats = [_wiener_matrix(n_occ, c, tau, snr_db, centered) for c in range(4)]
    return np.stack(mats).astype(np.complex64)


@lru_cache(maxsize=None)
def comb_offsets(u: int, b: int, S: int, N_TS: int) -> np.ndarray:
    """[N_TS, n_drs_symb] comb offset (t + (n%2)*2) mod 4 of each DRS symbol."""
    n_symb = drs_mod.nof_drs_symbols_per_ts(u, S, N_TS)
    t = np.arange(N_TS)[:, None]
    n = np.arange(n_symb)[None, :]
    return ((t + (n % 2) * 2) % 4).astype(np.int32)


@lru_cache(maxsize=None)
def time_interp_matrix(u: int, b: int, S: int, N_TS: int,
                       mode: str = "lr_t") -> np.ndarray:
    """[N_TS, S, n_drs_symb] float32 time interpolation weights.

    mode "lr_t": linear interpolation between the surrounding DRS symbols,
    clamped at the edges. mode "lr_f": causal -- weight 1 on the latest DRS
    symbol at or before l (reference rx_synced.cpp:1112-1163).
    """
    n_symb = drs_mod.nof_drs_symbols_per_ts(u, S, N_TS)
    N_step = drs_mod.get_N_step(N_TS)
    T = np.zeros((N_TS, S, n_symb), dtype=np.float32)
    for t in range(N_TS):
        l_drs = np.array([1 + t // 4 + n * N_step for n in range(n_symb)], dtype=np.float64)
        for l in range(S):
            if mode == "lr_f":
                j = int(np.searchsorted(l_drs, l, side="right")) - 1
                T[t, l, max(j, 0)] = 1.0
                continue
            j = int(np.searchsorted(l_drs, l))
            if j == 0:
                T[t, l, 0] = 1.0
            elif j >= n_symb:
                T[t, l, -1] = 1.0
            else:
                w = (l - l_drs[j - 1]) / (l_drs[j] - l_drs[j - 1])
                T[t, l, j - 1] = 1.0 - w
                T[t, l, j] = w
    return T
