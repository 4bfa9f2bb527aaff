"""TX raised-cosine OFDM windowing + duration LUT.

Oracles: reference tx.cpp:882-911 (PHY_TX_OFDM_WINDOWING overlap-add, an
opt-in feature — tx.hpp:38 ships it disabled) and
sections_part3/derivative/duration_lut.hpp:31-73.
"""
import jax.numpy as jnp
import numpy as np

from dectnrp_tpu.phy.rx import build_rx
from dectnrp_tpu.phy.tx import build_tx
from dectnrp_tpu.sections.part3.duration_lut import DurationEc, DurationLut
from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef, get_packet_sizes

NID = 0x12345678


def _tx_packet(psdef, window_fraction, B=4, seed=0):
    ps = get_packet_sizes(psdef)
    tx = build_tx(psdef, NID, 1, window_fraction=window_fraction)
    rng = np.random.default_rng(seed)
    plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    fl = jnp.zeros((B,), bool)
    return np.asarray(tx(plcf, tb, fl, fl)), plcf, tb, ps


def _oob_power_db(iq, b):
    """Mean PSD (dB) well outside the occupied band (|f| in 0.58..0.9 of fs/2)."""
    n = iq.shape[-1]
    spec = np.fft.fft(iq.reshape(-1, n), axis=-1)
    psd = np.mean(np.abs(spec) ** 2, axis=0)
    f = np.abs(np.fft.fftfreq(n))            # 0..0.5
    band = (f > 0.29) & (f < 0.45)           # occupied edge is 56b/(2*64b)=0.4375*fs... use guard
    band = (f > 0.46) & (f < 0.50)
    return 10 * np.log10(np.mean(psd[band]) + 1e-30)


def test_windowed_tx_decodes_bit_exact():
    psdef = PacketSizesDef(1, 2, 0, 2, 0, 3, 6144)
    iq, plcf, tb, ps = _tx_packet(psdef, 0.25)
    rx = build_rx(psdef, NID, 1)
    nv = 1e-4 * float(np.mean(np.abs(iq) ** 2))
    out = rx(jnp.asarray(iq), jnp.float32(nv))
    assert bool(out["tb_ok"].all())
    assert bool((out["tb"] == tb).all())


def test_windowing_reduces_oob_skirts():
    psdef = PacketSizesDef(1, 2, 0, 2, 0, 3, 6144)
    iq_hard, *_ = _tx_packet(psdef, 0.0)
    iq_win, *_ = _tx_packet(psdef, 0.25)
    # same in-band energy (windowing shapes only CP heads / GI start)
    assert np.isclose(np.mean(np.abs(iq_hard) ** 2),
                      np.mean(np.abs(iq_win) ** 2), rtol=0.02)
    base = _oob_power_db(iq_hard, 2)
    gain_db = base - _oob_power_db(iq_win, 2)
    assert gain_db > 1.0, f"windowing gained only {gain_db:.1f} dB OOB"
    # longer transitions suppress skirts further (1/f -> 1/f^2 decay)
    iq_w2, *_ = _tx_packet(psdef, 0.5)
    gain2_db = base - _oob_power_db(iq_w2, 2)
    assert gain2_db > gain_db + 1.0, (gain_db, gain2_db)


def test_duration_lut():
    lut = DurationLut(1_728_000)
    assert lut.get_N_samples_from_subslots(1) == 360
    assert lut.get_N_samples_from_duration(DurationEc.SLOT) == 720
    assert lut.get_N_samples_from_duration(DurationEc.MS, 10) == 17280
    lut2 = DurationLut(1_920_000)                 # SDR rate
    assert lut2.get_N_samples_from_subslots(1) == 400
    assert lut2.get_N_samples_at_next_full_second(1) == 1_920_000
    assert lut2.get_N_samples_at_last_full_second(1_920_001) == 1_920_000
    assert lut2.get_N_ns_from_samples(1_920_000) == 1_000_000_000
    assert lut2.get_N_ns_from_samples(192) == 100_000
    assert lut2.get_N_duration_in_second(DurationEc.SUBSLOT_U8) == 38400
