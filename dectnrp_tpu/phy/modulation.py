"""Constellation mapping & max-log soft demapping (ETSI TS 103 636-3 6.2).

DECT NR+ uses the LTE gray constellations (BPSK..1024QAM). Mapping is
separable in I/Q for QPSK and higher: even bit indices drive I, odd drive Q,
with the recursive gray amplitude pattern. BPSK maps to (1+j)/sqrt(2) polarity.

The soft demapper is exact max-log via per-axis level search (<=32 levels),
fully vectorized -- no per-cell loops.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

# normalization 1/sqrt(E) per modulation order
_NORM = {1: np.sqrt(2.0), 2: np.sqrt(2.0), 4: np.sqrt(10.0),
         6: np.sqrt(42.0), 8: np.sqrt(170.0), 10: np.sqrt(682.0)}


@lru_cache(maxsize=None)
def _axis_levels(m_half: int):
    """Gray amplitude levels for one axis driven by m_half bits.

    Returns (levels [2**m_half] float, bits [2**m_half, m_half] uint8) where
    levels follow the recursive LTE pattern: a(b0..b_{m-1}) =
    (1-2b0) * (2^{m-1+1} - ... ) expanded iteratively.
    """
    n = 1 << m_half
    levels = np.empty(n)
    bits = np.empty((n, m_half), dtype=np.uint8)
    for v in range(n):
        bs = [(v >> (m_half - 1 - i)) & 1 for i in range(m_half)]
        # a = (1-2b0)*(2^{m-1} - (1-2b1)*(2^{m-2} - ... (2 - (1-2b_{m-1}))))
        a = 1.0
        for i in range(m_half - 1, 0, -1):
            a = (1 << (m_half - i)) - (1 - 2 * bs[i]) * a
        a = (1 - 2 * bs[0]) * a if m_half > 1 else (1 - 2 * bs[0])
        levels[v] = a
        bits[v] = bs
    return levels, bits


def map_bits(bits: np.ndarray | jnp.ndarray, n_bps: int):
    """Map bits [..., n_sym*n_bps] -> complex symbols [..., n_sym].

    jit-safe (works on jnp arrays).
    """
    b = bits.reshape(*bits.shape[:-1], -1, n_bps).astype(jnp.float32)
    s = 1.0 - 2.0 * b  # bit 0 -> +1
    norm = _NORM[n_bps]
    if n_bps == 1:
        return (s[..., 0] + 1j * s[..., 0]) / norm
    if n_bps == 2:
        return (s[..., 0] + 1j * s[..., 1]) / norm
    m_half = n_bps // 2
    # recursive gray amplitude per axis
    def axis(sgn):  # sgn [..., m_half] of +-1
        a = jnp.ones_like(sgn[..., 0])
        for i in range(m_half - 1, 0, -1):
            a = (1 << (m_half - i)) - sgn[..., i] * a
        return sgn[..., 0] * a
    i_axis = axis(s[..., 0::2])
    q_axis = axis(s[..., 1::2])
    return (i_axis + 1j * q_axis) / norm


def demap_llr(y, csi, n_bps: int, noise_var: float | jnp.ndarray = 1.0):
    """Max-log LLRs for equalized symbols.

    y:   [..., n_sym] complex equalized symbols (x_hat estimates)
    csi: [..., n_sym] real effective channel quality |h_eff|^2 scaling the LLRs
    Returns LLR [..., n_sym*n_bps], convention L = log P(1)/P(0).
    """
    norm = _NORM[n_bps]
    if n_bps == 1:
        # BPSK on the diagonal: project onto (1+j)/sqrt(2)
        proj = (jnp.real(y) + jnp.imag(y)) / norm * 2.0
        llr1 = -2.0 * proj * csi / noise_var  # P(1): symbol -(1+j)/sqrt2
        return llr1[..., None].reshape(*y.shape[:-1], -1)

    m_half = n_bps // 2
    levels, bits = _axis_levels(m_half)
    lv = jnp.asarray(levels / norm, dtype=jnp.float32)      # [L]
    bmask = jnp.asarray(bits, dtype=bool)                    # [L, m_half]

    def axis_llrs(r):  # r [..., n_sym] real
        d2 = (r[..., None] - lv) ** 2                        # [..., n_sym, L]
        out = []
        for i in range(m_half):
            m1 = jnp.min(jnp.where(bmask[:, i], d2, jnp.inf), axis=-1)
            m0 = jnp.min(jnp.where(~bmask[:, i], d2, jnp.inf), axis=-1)
            out.append(m0 - m1)                              # log P1/P0 ~ (d0-d1)
        return out                                           # list of [..., n_sym]

    li = axis_llrs(jnp.real(y))
    lq = axis_llrs(jnp.imag(y))
    scale = csi / noise_var
    interleaved = []
    for i in range(m_half):
        interleaved.append(li[i] * scale)
        interleaved.append(lq[i] * scale)
    return jnp.stack(interleaved, axis=-1).reshape(*y.shape[:-1], -1)


def hard_decision(y, n_bps: int):
    """Nearest-constellation-point slicer for equalized symbols.

    y [..., n_sym] complex -> decided unit-energy constellation points
    (same normalization as map_bits). Used by the decision-directed
    channel refinement (phy/rx.py), not by the decoding path.
    """
    norm = _NORM[n_bps]
    if n_bps == 1:
        s = jnp.sign(jnp.real(y) + jnp.imag(y)) + 0.0
        return (s + 1j * s) / norm
    m_half = n_bps // 2
    levels, _ = _axis_levels(m_half)
    lv = jnp.asarray(np.sort(levels) / norm, dtype=jnp.float32)  # [L]

    def slice_axis(r):
        d2 = (r[..., None] - lv) ** 2
        return lv[jnp.argmin(d2, axis=-1)]

    return slice_axis(jnp.real(y)) + 1j * slice_axis(jnp.imag(y))
