"""Fractional STO + residual CFO estimation in the synchronized RX.

Oracle model: reference offsets/estimator_sto.cpp:47-171 (fractional timing
from the phase slope across pilot ZF estimates, removed as a per-subcarrier
derotation ramp) and rx_synced.cpp:503-619 (residual fractional CFO
re-estimated during STF processing) — both ON in the shipped build. A packet
arriving half a sample off the integer sync grid, with a small CFO left over
after the sync derotation, must decode at the same SNR as an aligned one.
"""
import jax.numpy as jnp
import numpy as np

from dectnrp_tpu.phy.sync import build_sync, build_rx_stream
from dectnrp_tpu.phy.tx import build_tx
from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef, get_packet_sizes

NID = 0x12345678
SNR_DB = 15.0


def _fractional_delay(x: np.ndarray, tau: float) -> np.ndarray:
    """Delay x by tau samples (frequency-domain all-pass), along the last axis."""
    n = x.shape[-1]
    f = np.fft.fftfreq(n)
    return np.fft.ifft(np.fft.fft(x, axis=-1) * np.exp(-2j * np.pi * f * tau),
                       axis=-1)


def _stream_with_offset(psdef, B, off_int, tau_frac, cfo_rad, seed=0):
    ps = get_packet_sizes(psdef)
    tx = build_tx(psdef, NID, 1)
    rng = np.random.default_rng(seed)
    plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    fl = jnp.zeros((B,), bool)
    iq = np.asarray(tx(plcf, tb, fl, fl))                    # [B, 1, n_pkt]
    T = ps.N_samples_packet + 1024
    sig = np.mean(np.abs(iq) ** 2)
    nv = sig / 10 ** (SNR_DB / 10)
    stream = (rng.standard_normal((B, 1, T)) + 1j * rng.standard_normal((B, 1, T)))
    stream *= np.sqrt(nv / 2)
    n = np.arange(iq.shape[-1])
    rot = np.exp(1j * cfo_rad * n)
    for i in range(B):
        stream[i, :, off_int:off_int + iq.shape[-1]] += iq[i] * rot[None, :]
    if tau_frac != 0.0:
        stream = _fractional_delay(stream, tau_frac)
    return (jnp.asarray(stream.astype(np.complex64)), float(nv), tb, T, ps)


def test_half_sample_offset_decodes_like_aligned():
    psdef = PacketSizesDef(1, 8, 0, 4, 0, 2, 6144)
    off = 300
    stream, nv, tb, T, ps = _stream_with_offset(psdef, 3, off, 0.5, 0.0)
    sync = build_sync(1, 8, T)
    rep = sync(stream)
    assert bool(rep["detected"].all())
    assert np.all(np.abs(np.asarray(rep["t_fine"]) - off) <= 2)
    rxs = build_rx_stream(psdef, NID, 1, T)
    out = rxs(stream, rep["t_fine"], rep["cfo"], jnp.float32(nv))
    assert bool(out["tb_ok"].all()), "half-sample-offset packet must decode"
    assert bool((out["tb"] == tb).all())

    # controlled window (t0 = true integer offset): the estimated fractional
    # STO must recover the injected half sample. (When sync lands LATE the
    # FFT window leaks into the next symbol's CP — mild ISI — so the tight
    # bound is only asserted for the exactly-placed window.)
    zero = jnp.zeros((3,), jnp.float32)
    out2 = rxs(stream, jnp.full((3,), off, jnp.int32), zero, jnp.float32(nv))
    assert bool(out2["tb_ok"].all())
    sto = np.asarray(out2["sto_frac"])
    assert np.all(np.abs(sto - 0.5) < 0.15), sto


def test_residual_cfo_reestimated_and_removed():
    # CFO small enough to evade none of the gates but NOT derotated by sync
    # (rx sees it raw): the STF re-estimation inside rx must absorb it.
    psdef = PacketSizesDef(1, 8, 0, 4, 0, 2, 6144)
    cfo = 2 * np.pi * 0.02 / (64 * 8)          # 2% subcarrier spacing
    stream, nv, tb, T, ps = _stream_with_offset(psdef, 3, 300, 0.0, cfo, seed=1)
    rxs = build_rx_stream(psdef, NID, 1, T)
    zero = jnp.zeros((3,), jnp.float32)
    out = rxs(stream, jnp.full((3,), 300, jnp.int32), zero, jnp.float32(nv))
    assert bool(out["tb_ok"].all())
    assert np.all(np.abs(np.asarray(out["cfo_res"]) - cfo) < 0.3 * cfo + 2e-5)


def test_sto_estimator_unbiased_at_zero():
    psdef = PacketSizesDef(1, 8, 0, 4, 0, 2, 6144)
    stream, nv, tb, T, ps = _stream_with_offset(psdef, 3, 300, 0.0, 0.0, seed=2)
    rxs = build_rx_stream(psdef, NID, 1, T)
    zero = jnp.zeros((3,), jnp.float32)
    out = rxs(stream, jnp.full((3,), 300, jnp.int32), zero, jnp.float32(nv))
    assert bool(out["tb_ok"].all())
    assert np.all(np.abs(np.asarray(out["sto_frac"])) < 0.2)
