"""N_SS>1 spatial multiplexing with MMSE equalization.

The reference stubs this demod path (rx_synced.cpp:1331-1333); this is the
framework's intended extension. Oracle: loopback decode through a random
full-rank MIMO channel + AWGN at moderate SNR.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dectnrp_tpu.phy.rx import build_rx
from dectnrp_tpu.phy.tx import build_tx
from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef, get_packet_sizes
from dectnrp_tpu.simulation.channels import awgn

NID = 0x12345678


def _mimo_loopback(tm_mode, n_rx, snr_db, B=4, seed=0, plen=2):
    psdef = PacketSizesDef(1, 1, 0, plen, tm_mode, 2, 6144)
    ps = get_packet_sizes(psdef)
    assert ps is not None and ps.tm_mode.N_SS > 1
    tx = build_tx(psdef, NID, 1)
    rx = build_rx(psdef, NID, 1)
    rng = np.random.default_rng(seed)
    plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    fl = jnp.zeros((B,), bool)
    iq = np.asarray(tx(plcf, tb, fl, fl))      # [B, N_TX, n]
    # random complex MIMO channel per batch element, constant over the packet
    H = (rng.standard_normal((B, n_rx, iq.shape[1]))
         + 1j * rng.standard_normal((B, n_rx, iq.shape[1]))) / np.sqrt(2)
    y = np.einsum("brt,btn->brn", H, iq).astype(np.complex64)
    sig = np.mean(np.abs(y) ** 2)
    nv = jnp.float32(sig / 10 ** (snr_db / 10))
    yn = awgn(jax.random.PRNGKey(seed), jnp.asarray(y), nv)
    out = rx(yn, nv)
    return out, tb


def test_2x2_mmse_decodes():
    out, tb = _mimo_loopback(tm_mode=2, n_rx=2, snr_db=30.0)
    assert bool(out["plcf1_ok"].all()), "PCC (Alamouti over 2 TS) failed"
    assert bool(out["tb_ok"].all()), "2x2 MMSE PDC decode failed"
    assert np.array_equal(np.asarray(out["tb"]), np.asarray(tb))


def test_2x4_mmse_decodes():
    # 2 spatial streams, 4 RX antennas: extra diversity
    out, tb = _mimo_loopback(tm_mode=2, n_rx=4, snr_db=20.0)
    assert bool(out["tb_ok"].all())


def test_4x4_mmse_decodes():
    out, tb = _mimo_loopback(tm_mode=6, n_rx=4, snr_db=35.0, B=2, plen=4)
    assert bool(out["tb_ok"].all()), "4x4 MMSE PDC decode failed"
    assert np.array_equal(np.asarray(out["tb"]), np.asarray(tb))


def test_mmse_fails_gracefully_at_low_snr():
    out, _ = _mimo_loopback(tm_mode=2, n_rx=2, snr_db=-10.0)
    assert not bool(out["tb_ok"].any())


def test_8x8_mmse_decodes():
    """tm 11: 8 spatial streams, 8x8 MMSE (W[6] identity codebook top of
    the lattice; the reference stubs AxA demod, rx_synced.cpp:1331-1333)."""
    out, tb = _mimo_loopback(tm_mode=11, n_rx=8, snr_db=35.0, B=2, plen=4)
    assert bool(out["tb_ok"].all()), "8x8 MMSE PDC decode failed"
    assert np.array_equal(np.asarray(out["tb"]), np.asarray(tb))


def test_8ts_transmit_diversity_decodes():
    """tm 10: 8-TS Alamouti space-frequency transmit diversity, 8 RX."""
    psdef = PacketSizesDef(1, 1, 0, 4, 10, 2, 6144)
    ps = get_packet_sizes(psdef)
    assert ps.tm_mode.N_TS == 8 and ps.tm_mode.N_SS == 1
    tx = build_tx(psdef, NID, 1)
    rx = build_rx(psdef, NID, 1)
    rng = np.random.default_rng(7)
    B = 2
    plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    fl = jnp.zeros((B,), bool)
    iq = np.asarray(tx(plcf, tb, fl, fl))
    H = (rng.standard_normal((B, 8, iq.shape[1]))
         + 1j * rng.standard_normal((B, 8, iq.shape[1]))) / np.sqrt(2)
    y = np.einsum("brt,btn->brn", H, iq).astype(np.complex64)
    sig = np.mean(np.abs(y) ** 2)
    nv = jnp.float32(sig / 10 ** (20.0 / 10))
    out = rx(awgn(jax.random.PRNGKey(0), jnp.asarray(y), nv), nv)
    assert bool(out["tb_ok"].all())
    assert np.array_equal(np.asarray(out["tb"]), np.asarray(tb))
