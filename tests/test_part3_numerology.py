"""Spec-table tests for numerology, MCS, tm modes, packet structure."""
import pytest

from dectnrp_tpu.sections.part3 import constants as c
from dectnrp_tpu.sections.part3.mcs import get_mcs
from dectnrp_tpu.sections.part3.numerologies import get_numerology, get_samp_rate
from dectnrp_tpu.sections.part3.tm_mode import (
    get_tm_mode, max_tm_mode_index, single_antenna_mode, tx_div_mode)
from dectnrp_tpu.sections.part3.transmission_packet_structure import (
    get_N_DF_symb, get_N_PACKET_symb, get_N_samples_GI,
    get_N_samples_OFDM_symbol, get_N_samples_STF)


@pytest.mark.parametrize("u", [1, 2, 4, 8])
@pytest.mark.parametrize("b", [1, 2, 4, 8, 12, 16])
def test_numerology_lattice(u, b):
    q = get_numerology(u, b)
    assert q.delta_u_f == 27000 * u
    assert q.N_b_DFT == 64 * b
    assert q.N_b_CP == 8 * b
    assert q.N_b_OCC == 56 * b
    assert q.N_SLOT_u_symb == 10 * u
    assert q.N_SLOT_u_subslot == 2 * u
    assert q.B_u_b_DFT == get_samp_rate(u, b)
    assert q.N_guards_top + q.N_guards_bottom + q.N_b_OCC + 1 == q.N_b_DFT
    assert q.N_guards_bottom == q.N_guards_top + 1
    # symbol duration * sample rate == 72*b samples
    assert round(q.T_u_symb * q.B_u_b_DFT) == 72 * b


def test_numerology_examples():
    q = get_numerology(1, 1)
    assert q.B_u_b_DFT == 1_728_000
    assert q.N_guards_top == 3 and q.N_guards_bottom == 4
    q = get_numerology(8, 16)
    assert q.B_u_b_DFT == 221_184_000


def test_mcs_table():
    assert (get_mcs(0).N_bps, get_mcs(0).rate) == (1, 0.5)
    assert (get_mcs(1).N_bps, get_mcs(1).rate) == (2, 0.5)
    assert get_mcs(4).N_bps == 4 and get_mcs(4).rate == 0.75
    assert get_mcs(7).N_bps == 6 and get_mcs(7).R_numerator == 5
    assert get_mcs(11).N_bps == 10
    with pytest.raises(ValueError):
        get_mcs(12)


def test_tm_modes():
    for i in range(12):
        tm = get_tm_mode(i)
        assert tm.N_TS == tm.N_eff_TX
        assert tm.N_SS <= tm.N_TS <= tm.N_TX
    assert max_tm_mode_index(2) == 4
    assert tx_div_mode(4) == 5
    assert single_antenna_mode(4) == 7
    assert get_tm_mode(10).N_TX == 8 and get_tm_mode(10).N_SS == 1


@pytest.mark.parametrize("u,expect_stf,expect_gi", [
    (1, 112, 32), (2, 144, 72), (4, 144, 72), (8, 144, 144)])
def test_packet_structure(u, expect_stf, expect_gi):
    for b in (1, 2, 4, 8, 12, 16):
        assert get_N_samples_OFDM_symbol(b) == 72 * b
        assert get_N_samples_STF(u, b) == expect_stf * b
        assert get_N_samples_GI(u, b) == expect_gi * b
        # STF + GI + DF symbols fill the packet exactly
        n_packet_symb = 10 * u  # one slot
        n_df = get_N_DF_symb(u, n_packet_symb)
        assert (get_N_samples_STF(u, b) + n_df * 72 * b + get_N_samples_GI(u, b)
                == n_packet_symb * 72 * b)


def test_n_packet_symb():
    # type 1: slots, type 0: subslots (5 symbols each)
    assert get_N_PACKET_symb(1, 2, 10, 2) == 20
    assert get_N_PACKET_symb(0, 2, 10, 2) == 10
    assert get_N_PACKET_symb(0, 1, 80, 16) == 5
