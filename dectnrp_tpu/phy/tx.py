"""Whole-packet TX synthesis as one jit (batched over packets).

TPU-native counterpart of the reference's symbol-streamed TX
(lib/src/phy/tx/tx.cpp:165-314): instead of per-symbol streaming with radio
back-pressure, the full packet is synthesized per jit call:
bits -> FEC -> QAM -> one grid scatter -> TxDiv/beamforming einsum -> batched
IFFT + CP -> STF assembly + cover sequence -> GI. Resampling/mixing to SDR
rates is a separate stage (phy/resampler.py).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..sections.part3.beamforming import get_W
from ..sections.part3.packet_sizes import PacketSizesDef
from ..sections.part3.stf import cover_sequence, n_stf_patterns
from .fec.chain import PdcPlan, pcc_encode, pdc_encode
from .modulation import map_bits
from .packet_config import AlamoutiLuts, get_packet_luts


def _spread_streams(cells: jax.Array, al: AlamoutiLuts | None, N_TS: int) -> jax.Array:
    """Map cells to transmit streams.

    cells: [B, N_SS, n] (N_SS==N_TS) or [B, n] single stream.
    Returns [B, N_TS, n].
    """
    if al is None:
        if cells.ndim == 2:
            assert N_TS == 1
            return cells[:, None, :]
        return cells  # N_SS == N_TS, direct stream mapping
    a = jnp.asarray(al.a.astype(np.complex64))
    bm = jnp.asarray(al.b.astype(np.complex64))
    ga = jnp.asarray(al.ga)
    gb = jnp.asarray(al.gb)
    x = cells if cells.ndim == 2 else cells[:, 0]
    return a[None] * x[:, ga] + bm[None] * jnp.conj(x[:, gb])


@lru_cache(maxsize=None)
def build_tx(psdef: PacketSizesDef, network_id: int, plcf_type: int,
             codebook_idx: int = 0, rv: int = 0,
             window_fraction: float = 0.0):
    """Returns a jitted tx(plcf_bits [B, 40/80], tb_bits [B, N_TB], cl, bf)
    -> iq [B, N_TX, N_samples_packet] at the native DECT rate.

    window_fraction: raised-cosine OFDM TX windowing over this fraction of
    the CP (reference PHY_TX_OFDM_WINDOWING / tx.cpp:882-911: rising edge on
    each symbol's CP head overlap-added with the previous symbol's cyclic
    tail; compile-disabled in the shipped reference, tx.hpp:38, hence 0.0
    default). Only the CP head / GI start are shaped, so RX demod is
    unaffected; out-of-band skirts drop.
    """
    luts = get_packet_luts(psdef)
    ps = luts.ps
    q = ps.numerology
    N, S = q.N_b_DFT, ps.N_PACKET_symb
    N_TS, N_TX, N_SS = ps.tm_mode.N_TS, ps.tm_mode.N_TX, ps.tm_mode.N_SS
    n_grid = S * N
    cp = q.N_b_CP
    plan = PdcPlan.get(ps.N_TB_bits, ps.G, ps.mcs.N_bps, psdef.Z)
    W = get_W(N_TS, N_TX, codebook_idx).astype(np.complex64)   # [N_TX, N_TS]
    n_pat = n_stf_patterns(psdef.u)
    pat_len = 16 * psdef.b
    cover = cover_sequence(psdef.u).astype(np.float32)

    if window_fraction > 0.0:
        from .filters import raised_cosine_window
        n_w = max(2, int(round(cp * window_fraction)))
        assert n_w <= cp and n_w <= pat_len
        rc = raised_cosine_window(0, n_w)        # [2*n_w]: rise then fall
        w_rise = rc[:n_w].astype(np.float32)
        w_fall = rc[n_w:].astype(np.float32)
    else:
        n_w = 0

    # numpy closures: embedded as jit constants at trace time (a build-time
    # jnp.asarray would eagerly allocate on the default device instead)
    drs_idx = np.asarray(luts.drs_flat_idx)
    drs_val = np.asarray(luts.drs_values)
    pcc_idx = np.asarray(luts.pcc_flat_idx.ravel())
    pdc_idx = np.asarray(luts.pdc_flat_idx.ravel())
    stf_grid = np.asarray(luts.stf_grid)
    Wj = np.asarray(W)
    scale = luts.tx_scale

    @jax.jit
    def tx(plcf_bits, tb_bits, cl, bf):
        B = plcf_bits.shape[0]

        # ---- FEC + modulation
        e_pcc = pcc_encode(plcf_bits, cl, bf, plcf_type)          # [B, 196]
        x_pcc = map_bits(e_pcc, 2)                                # [B, 98] QPSK
        e_pdc = pdc_encode(tb_bits, plan, network_id, plcf_type, rv)  # [B, G]
        if N_SS > 1:
            # serial symbols round-robin onto spatial streams
            x_all = map_bits(e_pdc, ps.mcs.N_bps)                 # [B, N_SS*n_pdc]
            x_pdc = x_all.reshape(B, -1, N_SS).transpose(0, 2, 1)  # [B, N_SS, n_pdc]
        else:
            x_pdc = map_bits(e_pdc, ps.mcs.N_bps)                 # [B, n_pdc]

        # ---- transmit streams
        ts_pcc = _spread_streams(x_pcc, luts.pcc_alamouti, N_TS)  # [B, N_TS, 98]
        ts_pdc = _spread_streams(x_pdc, luts.pdc_alamouti, N_TS)  # [B, N_TS, n_pdc]

        # ---- one scatter builds the whole frequency grid
        grid = jnp.zeros((B, N_TS * n_grid), dtype=jnp.complex64)
        grid = grid.at[:, drs_idx].set(jnp.broadcast_to(drs_val[None, :], (B, drs_val.size)))
        grid = grid.at[:, pcc_idx].set(ts_pcc.reshape(B, -1))
        grid = grid.at[:, pdc_idx].set(ts_pdc.reshape(B, -1))
        grid = grid.reshape(B, N_TS, S, N)

        # ---- beamforming N_TS -> N_TX
        grid_tx = jnp.einsum("at,btsn->basn", Wj, grid)           # [B, N_TX, S, N]

        # ---- IFFT (+ CP) for the DF symbols l = 1..N_DF
        df = grid_tx[:, :, 1:1 + ps.N_DF_symb]                    # [B,N_TX,N_DF,N]
        body = jnp.fft.ifft(jnp.fft.ifftshift(df, axes=-1), axis=-1) * scale
        df_t = jnp.concatenate([body[..., N - cp:], body], axis=-1)  # +CP

        # ---- STF: base pattern from its IFFT, n_pat repetitions, cover sequence
        stf_bf = jnp.einsum("at,n->an", Wj[:, :1], stf_grid)      # stream 0 carries STF
        stf_body = jnp.fft.ifft(jnp.fft.ifftshift(stf_bf, axes=-1), axis=-1) * scale
        pattern = stf_body[:, :pat_len]                           # [N_TX, 16b]
        reps = jnp.tile(pattern[:, None, :], (1, n_pat, 1))       # [N_TX, n_pat, 16b]
        stf_t = (reps * jnp.asarray(cover)[None, :, None]).reshape(N_TX, -1)
        stf_t = jnp.broadcast_to(stf_t[None], (B, N_TX, stf_t.shape[-1]))
        stf_t = stf_t.astype(jnp.complex64)

        gi = jnp.zeros((B, N_TX, ps.N_samples_GI), dtype=jnp.complex64)

        if n_w > 0:
            # raised-cosine TX windowing (tx.cpp:882-911): the first n_w CP
            # samples of each symbol ramp up, overlap-added with the cyclic
            # tail (body start x falling edge) of the previous symbol; only
            # CP heads / GI start are shaped, so RX CP-strip is unaffected
            tails = body[..., :n_w] * jnp.asarray(w_fall)         # [B,NTX,NDF,nw]
            # previous-symbol tails: symbol 0's predecessor is the STF, whose
            # waveform is 16b-periodic and continues as cover[-1]*pattern
            stf_tail = (pattern[:, :n_w] * cover[-1]
                        * jnp.asarray(w_fall)).astype(jnp.complex64)
            stf_tail = jnp.broadcast_to(stf_tail[None, :, None, :],
                                        (B, N_TX, 1, n_w))
            prev = jnp.concatenate([stf_tail, tails[..., :-1, :]], axis=2)
            heads = df_t[..., :n_w] * jnp.asarray(w_rise) + prev
            df_t = jnp.concatenate([heads, df_t[..., n_w:]], axis=-1)
            # packet leading edge + last symbol's tail into the GI
            stf_t = stf_t.at[..., :n_w].multiply(jnp.asarray(w_rise))
            gi = gi.at[..., :n_w].set(tails[:, :, -1, :])

        df_t = df_t.reshape(B, N_TX, ps.N_DF_symb * (N + cp))
        return jnp.concatenate(
            [stf_t, df_t.astype(jnp.complex64), gi], axis=-1)

    return tx
