"""MAC helpers: allocation grid, PLL drift, PPX pulses, contacts, CQI, AGC.

Oracles: reference allocation_pt.cpp (orthogonality + next-slot choice),
pll.cpp (warp factor from beacon spans), ppx.cpp (raster-snapped correction),
cqi_lut.hpp table, agc_rx.cpp step rules.
"""
import numpy as np
import pytest

from dectnrp_tpu.mac.allocation import (AllocationFt, AllocationPt, Direction,
                                        Resource, TxOpportunity)
from dectnrp_tpu.mac.contact_list import ContactList
from dectnrp_tpu.mac.cqi import CqiLut
from dectnrp_tpu.mac.pll import Pll
from dectnrp_tpu.mac.ppx import Ppx
from dectnrp_tpu.phy.agc import AgcConfig, AgcRx
from dectnrp_tpu.sections.part4.identity import Identity


def test_resource_orthogonality():
    a = Resource(0, 100)
    assert a.is_orthogonal(Resource(100, 50))
    assert not a.is_orthogonal(Resource(99, 50))


def test_allocation_pt_tx_opportunity():
    bp = 10_000
    al = AllocationPt(bp, validity_after_beacon=3 * bp,
                      validity_after_now=2 * bp, turnaround_time=100)
    al.add_resource_regular(Direction.UL, offset=1000, length=200,
                            stride=2000, n=4)
    # no beacon known yet -> invalid
    assert not al.get_tx_opportunity(Direction.UL, 0, 0).valid
    al.beacon_time_last_known = 100_000
    op = al.get_tx_opportunity(Direction.UL, 100_500, 100_500)
    assert op.valid
    assert op.tx_time == 101_000 and op.n_samples == 200
    # now already past the first slot (turnaround pushes to the next one)
    op2 = al.get_tx_opportunity(Direction.UL, 100_950, 100_950)
    assert op2.tx_time == 103_000
    # wraps into the next beacon period
    op3 = al.get_tx_opportunity(Direction.UL, 107_500, 107_500)
    assert op3.tx_time == 111_000


def test_allocation_pt_rejects_overlap():
    al = AllocationPt(10_000, 10_000, 10_000, 0)
    al.add_resource(Direction.UL, 0, 100)
    with pytest.raises(AssertionError):
        al.add_resource(Direction.UL, 50, 100)


def test_allocation_ft_grid():
    ft = AllocationFt(10_000)
    r1 = ft.allocate(1, Direction.DL, 0, 1000)
    off = ft.find_free(1000)
    assert off == 1000
    ft.allocate(2, Direction.DL, off, 1000)
    assert ft.find_free(9000) is None
    ft.release_pt(1)
    assert ft.find_free(1000) == 0


def test_pll_estimates_ppm():
    rate = 1_728_000
    bp = rate // 10                      # 100 ms beacon period
    pll = Pll(bp, rate)
    ppm_true = 20.0
    warp = 1.0 + ppm_true / 1e6
    for i in range(400):
        pll.provide_beacon_time(int(i * bp * warp))
    assert abs(pll.ppm - ppm_true) < 2.0, pll.ppm


def test_ppx_phase_lock():
    rate = 1_728_000
    bp = rate // 10
    ppx = Ppx(ppx_period=rate, ppx_length=rate // 100,
              ppx_time_advance=rate // 50, beacon_period=bp,
              time_deviation_max=rate // 1000)
    ppx.set_ppx_rising_edge(rate)
    # beacons drift slightly late; ppx follows
    ppx.provide_beacon_time(rate + 3 * bp + 40)
    assert ppx.rising_edge_estimation == rate + 40
    pc = ppx.get_ppx_imminent()
    assert pc.rising_edge == rate + 40 + ppx.ppx_period_warped
    assert pc.falling_edge - pc.rising_edge == rate // 100


def test_contact_list():
    cl = ContactList()
    c = cl.add(Identity(0x100, 500, 7))
    assert cl.by_short(7) is c and cl.by_long(500) is c
    c.associated = True
    assert cl.associated() == [c]
    assert c.next_sequence_number() == 0 and c.sequence_number == 1
    cl.remove(7)
    assert len(cl) == 0


def test_cqi_lut():
    lut = CqiLut(1, 6, snr_offset_db=0.0)
    assert lut.get_highest_mcs_possible(-5.0) == 1   # clamped to mcs_min
    assert lut.get_highest_mcs_possible(12.0) == 4
    assert lut.get_highest_mcs_possible(40.0) == 6   # clamped to mcs_max
    lut2 = CqiLut(0, 11, snr_offset_db=3.0)
    assert lut2.get_highest_mcs_possible(14.0) == 4  # 14-3=11 -> MCS4


def test_agc_rx_steps_toward_target():
    agc = AgcRx(AgcConfig(nof_antennas=2, gain_step_db_min=1.0,
                          gain_step_db_max=6.0), rms_target=0.316227766)
    power = np.array([-40.0, -40.0])
    # antenna 0 way too loud, antenna 1 silent (no peak)
    step = agc.get_gain_step_db(power, np.array([0.9, 0.0]))
    assert step[0] > 0                               # reduce sensitivity
    assert step[0] <= 6.0                            # slew-limited
    assert step[1] == 0.0                            # already at max sens.
    # quiet antenna: increase sensitivity (negative step)
    step2 = agc.get_gain_step_db(power, np.array([0.05, 0.05]))
    assert np.all(step2 < 0)
