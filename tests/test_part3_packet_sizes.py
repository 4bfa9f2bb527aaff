"""Packet-size derivation sweep over the psdef lattice (validity rules + invariants)."""
import pytest

from dectnrp_tpu.sections.part3.cbsegm import TC_CB_SIZES, cbsegm
from dectnrp_tpu.sections.part3.packet_sizes import (
    PacketSizesDef, get_N_samples_at_samp_rate, get_packet_sizes)
from dectnrp_tpu.sections.part3.rdc import get_radio_device_class


def test_cb_sizes_table():
    assert len(TC_CB_SIZES) == 188
    assert TC_CB_SIZES[0] == 40 and TC_CB_SIZES[-1] == 6144
    assert 2048 in TC_CB_SIZES and 512 in TC_CB_SIZES and 6016 in TC_CB_SIZES


def test_cbsegm_single_block():
    s = cbsegm(1000, 6144)
    assert s.C == 1 and s.C1 == 1 and s.C2 == 0
    assert s.K1 >= 1024
    s = cbsegm(40 - 24, 6144)
    assert s.K1 == 40


def test_cbsegm_multi_block():
    s = cbsegm(13000, 6144)
    assert s.C == 3
    assert s.C1 * s.K1 + s.C2 * s.K2 == 13000 + 24 + 24 * 3 + s.F
    assert s.cb_sizes[0] == (s.K2 if s.C2 else s.K1)


def test_loopback_mvp_config():
    """The round-1 flagship config: u=1, b=1, SISO, MCS 1, 1 subslot."""
    ps = get_packet_sizes(PacketSizesDef(1, 1, 0, 2, 0, 1, 6144))
    assert ps is not None
    assert ps.N_PACKET_symb == 10
    assert ps.N_DF_symb == 8
    # 8 DF symbols * 56 occ - 2 DRS symbols(l=1,6) * 14 - 98 PCC
    assert ps.N_DRS_subc == 28
    assert ps.N_PDC_subc == 8 * 56 - 28 - 98 == 322
    assert ps.G == 644
    assert ps.N_samples_packet == 720


@pytest.mark.parametrize("rdc_name", ["1.1.1.A", "2.8.2.A", "8.16.8.A"])
def test_full_lattice_sweep(rdc_name):
    """Every psdef within the device class either derives consistently or is rejected."""
    rdc = get_radio_device_class(rdc_name)
    us = [u for u in (1, 2, 4, 8) if u <= rdc.u_min]
    bs = [b for b in (1, 2, 4, 8, 12, 16) if b <= rdc.b_min]
    n_valid = 0
    for u in us:
        for b in bs:
            for plt in (0, 1):
                for plen in (1, 2, 16):
                    for tm in (0, 1, 2, 5, 6, 10, 11):
                        for mcs_i in (0, 1, 4, 7, 9):
                            if mcs_i > rdc.mcs_index_min:
                                continue
                            ps = get_packet_sizes(
                                PacketSizesDef(u, b, plt, plen, tm, mcs_i, rdc.Z_min))
                            if ps is None:
                                continue
                            n_valid += 1
                            assert ps.N_TB_bits > 0
                            assert ps.N_PDC_subc > 0
                            assert ps.cb_segm.F == 0
                            assert ps.N_samples_packet == 72 * b * ps.N_PACKET_symb
                            assert ps.G == ps.tm_mode.N_SS * ps.N_PDC_subc * ps.mcs.N_bps
                            assert ps.N_TB_byte * 8 >= ps.N_TB_bits
    assert n_valid > 50


def test_invalid_rejections():
    # N_eff_TX=4 with short packet
    assert get_packet_sizes(PacketSizesDef(1, 1, 1, 1, 5, 1, 6144)) is None
    # u=8, N_eff_TX=8 with N_PACKET_symb not multiple of 10
    assert get_packet_sizes(PacketSizesDef(8, 1, 0, 3, 10, 1, 6144)) is None


def test_resampled_length():
    ps = get_packet_sizes(PacketSizesDef(1, 1, 0, 2, 0, 1, 6144))
    # 1.728 -> 1.92 Ms/s: 10/9 resampling
    assert get_N_samples_at_samp_rate(ps, 1_920_000) == 800
