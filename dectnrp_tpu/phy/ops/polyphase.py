"""Polyphase fractional-resampler FIR as an MXU super-frame matmul.

The reference resampler (lib/src/phy/resample/resampler.cpp:267-454) walks the
input sample-by-sample through hand-unrolled SIMD subfilter schedules.  The
basic TPU formulation (phy/resampler.py) turns each group of L outputs into a
row of a [n_frames, W] x [W, L] matmul — but W~31 and L~10 leave the 128x128
MXU almost idle and the strided window gather materializes a W/M ~ 3.4x blowup
of the input in HBM.

This module packs S consecutive frames into one "super-frame" row:

    y[b, g*S*L + n] = sum_w  x[b, g*S*M + w] * Gbig[w, n]

with Gbig [S*M + E, S*L] the block-Toeplitz embedding of the L polyphase
subfilters (E = W - M extra overlap columns).  S is chosen so S*L ~ 128 lanes:
the matmul K/N dims fill the MXU, and consecutive super-frames overlap by only
E <= S*M samples.  Two implementations:

  * `polyphase_fir_xla`: window construction by reshape + 2 static slices +
    concat (no gather HLO), then one einsum.  Portable.
  * `polyphase_fir_pallas`: fused Pallas kernel — each grid step loads one
    contiguous input tile plus one halo block (the same array passed twice
    with shifted BlockSpec index maps), builds the overlapped windows in VMEM,
    and writes only the output: one HBM read + one HBM write total.

Real filter taps on complex IQ: callers split complex64 into stacked
real/imag float32 rows (see `split_complex_rows` / `merge_complex_rows`).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True, eq=False)  # identity hash: Gbig is an ndarray
class SuperframeDesign:
    """Static geometry of the super-frame matmul for one (G, M) design."""
    S: int          # frames per super-frame
    M: int          # input samples per frame
    L: int          # output samples per frame
    W: int          # single-frame window width
    Wb: int         # super-frame window width = S*M + E
    Gbig: np.ndarray  # [Wb, S*L] float32

    @property
    def in_per_sf(self) -> int:
        return self.S * self.M

    @property
    def out_per_sf(self) -> int:
        return self.S * self.L


def make_superframe_design(G: np.ndarray, M: int, S: int | None = None) -> SuperframeDesign:
    """Embed the [L, W] polyphase bank G into a block-Toeplitz [Wb, S*L].

    G row l holds subfilter phase l at its window offset (resampler._design):
    y[g*L + l] = sum_w G[l, w] x[g*M + w].  Within a super-frame of S frames,
    frame s reads window [s*M, s*M + W), so Gbig[s*M + w, s*L + l] = G[l, w].
    """
    L, W = G.shape
    if S is None:
        S = max(1, int(round(128 / L)))
    # halo must fit in one extra super-frame block (kernel passes 1 halo)
    while W - M > S * M:
        S += 1
    Wb = S * M + (W - M)
    Gbig = np.zeros((Wb, S * L), dtype=np.float32)
    for s in range(S):
        Gbig[s * M: s * M + W, s * L: (s + 1) * L] = G.T
    return SuperframeDesign(S=S, M=M, L=L, W=W, Wb=Wb, Gbig=Gbig)


def split_complex_rows(x: jax.Array) -> jax.Array:
    """[B, T] complex64 -> [2B, T] float32 (real rows then imag rows)."""
    return jnp.concatenate([x.real, x.imag], axis=0).astype(jnp.float32)


def merge_complex_rows(y: jax.Array) -> jax.Array:
    """Inverse of split_complex_rows."""
    B2 = y.shape[0]
    return (y[: B2 // 2] + 1j * y[B2 // 2:]).astype(jnp.complex64)


def _pad_for_superframes(xp: jax.Array, d: SuperframeDesign, n_frames: int):
    """Pad [B2, n_pad] so every super-frame window (incl. one halo) exists."""
    n_sf = -(-n_frames // d.S)
    need = n_sf * d.in_per_sf + d.in_per_sf  # + one full halo block
    pad = max(0, need - xp.shape[-1])
    if pad:
        xp = jnp.pad(xp, ((0, 0), (0, pad)))
    return xp, n_sf


def polyphase_fir_xla(xp: jax.Array, d: SuperframeDesign, n_frames: int) -> jax.Array:
    """Reference/portable path: [B2, n_pad] f32 -> [B2, n_frames*L] f32."""
    xp, n_sf = _pad_for_superframes(xp, d, n_frames)
    B2 = xp.shape[0]
    sm = d.in_per_sf
    resh = xp[:, : (n_sf + 1) * sm].reshape(B2, n_sf + 1, sm)
    wide = jnp.concatenate([resh[:, :n_sf], resh[:, 1: n_sf + 1]], axis=-1)
    fr = wide[:, :, : d.Wb]                               # [B2, n_sf, Wb]
    y = jnp.einsum("bfw,wn->bfn", fr, jnp.asarray(d.Gbig))
    return y.reshape(B2, n_sf * d.out_per_sf)[:, : n_frames * d.L]


@lru_cache(maxsize=None)
def _pallas_call(d: SuperframeDesign, B2: int, n_sf: int, TB: int, TG: int,
                 interpret: bool):
    from jax.experimental import pallas as pl

    sm, so = d.in_per_sf, d.out_per_sf
    Gbig = jnp.asarray(d.Gbig)
    nb, ng = B2 // TB, n_sf // TG

    def kernel(xm_ref, xh_ref, g_ref, o_ref):
        # static slices only (no in-kernel reshape across the lane dim):
        # frame g's window is xseg[:, g*sm : g*sm + Wb]
        xseg = jnp.concatenate([xm_ref[:], xh_ref[:]], axis=-1)
        g = g_ref[:]
        for gg in range(TG):
            fr = xseg[:, gg * sm: gg * sm + d.Wb]
            o_ref[:, gg * so: (gg + 1) * so] = jax.lax.dot_general(
                fr, g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=(nb, ng),
        in_specs=[
            pl.BlockSpec((TB, TG * sm), lambda i, j: (i, j)),
            # halo: the next sm-sized block after this tile (same array)
            pl.BlockSpec((TB, sm), lambda i, j: (i, (j + 1) * TG)),
            pl.BlockSpec((d.Wb, so), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, TG * so), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((B2, n_sf * so), jnp.float32),
        interpret=interpret,
    )
    return lambda xm: call(xm, xm, Gbig)


def polyphase_fir_pallas(xp: jax.Array, d: SuperframeDesign, n_frames: int,
                         interpret: bool = False) -> jax.Array:
    """Fused kernel path: [B2, n_pad] f32 -> [B2, n_frames*L] f32."""
    xp, n_sf = _pad_for_superframes(xp, d, n_frames)
    B2 = xp.shape[0]
    TB = min(B2, 128)            # MXU row-dim tile: largest divisor <= 128
    while B2 % TB:
        TB -= 1
    # ~ <= 1k output lanes per tile keeps the VMEM working set modest
    TG = max(1, min(n_sf, 1024 // d.out_per_sf))
    while n_sf % TG:
        TG -= 1
    xm = xp[:, : (n_sf + 1) * d.in_per_sf]
    y = _pallas_call(d, B2, n_sf, TB, TG, interpret)(xm)
    return y[:, : n_frames * d.L]
