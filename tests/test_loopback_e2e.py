"""End-to-end loopback: TX -> channel -> RX decode (reference oracle:
configurations/loopback_simulator + tfw_loopback_snr PER behavior)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dectnrp_tpu.phy.rx import build_rx
from dectnrp_tpu.phy.tx import build_tx
from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef, get_packet_sizes
from dectnrp_tpu.simulation.channels import awgn, doubly_selective

NID = 0x12345678


def run_loopback(psdef, snr_db, B=8, seed=0, channel="awgn", n_rx=None):
    ps = get_packet_sizes(psdef)
    tx = build_tx(psdef, NID, 1)
    rx = build_rx(psdef, NID, 1)
    rng = np.random.default_rng(seed)
    plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    flags = jnp.zeros((B,), bool)
    iq = tx(plcf, tb, flags, flags)
    p_sig = float(jnp.mean(jnp.abs(iq) ** 2))
    key = jax.random.PRNGKey(seed + 1)
    if channel == "doubly":
        from dectnrp_tpu.sections.part3.numerologies import get_samp_rate
        k1, k2 = jax.random.split(key)
        iq = doubly_selective(k1, iq, n_rx or ps.tm_mode.N_TX,
                              float(get_samp_rate(psdef.u, psdef.b)),
                              tau_rms_s=363e-9, doppler_hz=0.0, pdp_idx=1)
        key = k2
    nv = p_sig / 10 ** (snr_db / 10.0)
    y = awgn(key, iq, nv)
    out = rx(y, nv)
    return out, plcf, tb


@pytest.mark.parametrize("tm_mode", [0, 1])
def test_loopback_high_snr_decodes(tm_mode):
    psdef = PacketSizesDef(1, 1, 0, 2, tm_mode, 2, 6144)
    out, plcf, tb = run_loopback(psdef, 30.0)
    assert bool(out["plcf1_ok"].all())
    assert not bool(out["plcf2_ok"].any())  # blind type-2 CRC must fail
    assert bool(out["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["plcf1"]), np.asarray(plcf))
    np.testing.assert_array_equal(np.asarray(out["tb"]), np.asarray(tb))


def test_loopback_moderate_snr_mcs2():
    # MCS2 (QPSK R=3/4) decodes reliably at 10 dB (reference loopback_snr
    # has PER->0 well below 10 dB for MCS 2)
    psdef = PacketSizesDef(1, 1, 0, 2, 0, 2, 6144)
    out, _, _ = run_loopback(psdef, 10.0, B=16)
    assert int(out["tb_ok"].sum()) >= 15


def test_loopback_low_snr_fails():
    psdef = PacketSizesDef(1, 1, 0, 2, 0, 4, 6144)
    out, _, _ = run_loopback(psdef, -8.0, B=8)
    assert int(out["tb_ok"].sum()) == 0
    # false-positive CRC acceptance must stay rare
    assert int(out["plcf1_ok"].sum()) <= 1


def test_loopback_u2_b2_mcs4():
    psdef = PacketSizesDef(2, 2, 0, 4, 0, 4, 6144)
    out, plcf, tb = run_loopback(psdef, 30.0)
    assert bool(out["tb_ok"].all())
    np.testing.assert_array_equal(np.asarray(out["tb"]), np.asarray(tb))


def test_loopback_multipath_wiener():
    # static frequency-selective channel (PedB, b=4): Wiener interpolation
    # must track the channel across subcarriers
    psdef = PacketSizesDef(1, 4, 0, 2, 0, 2, 6144)
    out, _, tb = run_loopback(psdef, 25.0, channel="doubly", n_rx=1)
    assert int(out["tb_ok"].sum()) >= 7


def test_high_numerology_decode_u8():
    """u=8 aligned decode at 16QAM: guards the numerology-scaled Wiener
    path (subcarrier spacing 216 kHz) — a u-scaling bug here once shrank
    flat-channel estimates and broke QAM decisions while every other test
    ran at u=1."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dectnrp_tpu.phy.rx import build_rx
    from dectnrp_tpu.phy.tx import build_tx
    from dectnrp_tpu.sections.part3.packet_sizes import (PacketSizesDef,
                                                         get_packet_sizes)
    from dectnrp_tpu.simulation.channels import awgn

    psdef = None
    for plt, plen in ((0, 1), (0, 2), (1, 1)):
        cand = PacketSizesDef(8, 1, plt, plen, 0, 4, 6144)
        if get_packet_sizes(cand) is not None:
            psdef = cand
            break
    assert psdef is not None
    ps = get_packet_sizes(psdef)
    nid = 0x12345678
    B = 8
    rng = np.random.default_rng(0)
    tx = build_tx(psdef, nid, 1)
    rx = build_rx(psdef, nid, 1)
    plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    fl = jnp.zeros((B,), bool)
    iq = tx(plcf, tb, fl, fl)
    y = awgn(jax.random.PRNGKey(1), iq, jnp.float32(10 ** -1.8))  # 18 dB
    out = rx(y, jnp.float32(10 ** -1.8))
    assert float(np.asarray(out["tb_ok"]).mean()) == 1.0
    assert np.array_equal(np.asarray(out["tb"]), np.asarray(tb))
