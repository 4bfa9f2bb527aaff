"""Cell-allocation tests: STF/DRS/PCC/PDC counts and disjointness over the lattice."""
import numpy as np
import pytest

from dectnrp_tpu.sections.part3 import drs, pcc, pdc, phyres, stf
from dectnrp_tpu.sections.part3.transmission_packet_structure import get_N_DF_symb


@pytest.mark.parametrize("b", [1, 2, 4, 8, 12, 16])
def test_stf_cells(b):
    idx = stf.stf_cell_indices(b)
    assert idx.size == 14 * b
    # every 4th occupied subcarrier, no duplicates, DC excluded
    assert np.unique(idx).size == idx.size
    assert 0 not in idx
    for n_eff in (1, 2, 4, 8):
        v = stf.stf_freq_values(b, n_eff)
        assert v.size == 14 * b
        np.testing.assert_allclose(np.abs(v), 1.0)
        # rotation property: values are the rolled polarity * exp(j pi/4)
        pol = stf.polarity(b)
        rot = 2 * int(np.log2(n_eff))
        expected = np.roll(pol, -rot) * np.exp(1j * np.pi / 4)
        np.testing.assert_allclose(v, expected, atol=1e-12)


def test_stf_polarity_lengths():
    for b, n in [(1, 14), (2, 28), (4, 56), (8, 112), (12, 168), (16, 224)]:
        assert stf.polarity(b).size == n
        assert np.all(np.abs(stf.polarity(b)) == 1.0)


def test_stf_cover_sequence():
    assert stf.cover_sequence(1).size == 7
    assert stf.cover_sequence(2).size == 9
    np.testing.assert_array_equal(stf.cover_sequence(2),
                                  [1, -1, 1, 1, -1, -1, -1, -1, -1])


@pytest.mark.parametrize("u", [1, 2, 4, 8])
@pytest.mark.parametrize("b", [1, 2, 4, 16])
@pytest.mark.parametrize("n_ts", [1, 2, 4, 8])
def test_drs_counts(u, b, n_ts):
    n_packet_symb = 20 if (u == 8 and n_ts == 8) else 15 if n_ts == 4 else 10
    l, k, v = drs.drs_cells(u, b, n_packet_symb, n_ts)
    n_occ = 56 * b
    expected = drs.get_N_DRS_subc(u, n_packet_symb, n_ts, n_occ)
    assert l.size == expected
    # all DRS cells within DF symbols
    assert l.min() >= 1
    assert l.max() <= get_N_DF_symb(u, n_packet_symb)
    # per symbol+TS: one cell per group of 4 occupied subcarriers
    assert np.all(np.abs(v) == 1.0)
    # no collisions between transmit streams
    lin = drs.drs_linear_indices(u, b, n_packet_symb, n_ts)
    assert np.unique(lin).size == lin.size


@pytest.mark.parametrize("b", [1, 2, 4, 8, 12, 16])
@pytest.mark.parametrize("n_ts", [1, 2, 4, 8])
def test_pcc_cells(b, n_ts):
    lin = pcc.pcc_linear_indices(b, n_ts)
    assert lin.size == 98
    assert np.unique(lin).size == 98
    l, k = pcc.pcc_cells_l_k(b, n_ts)
    assert l.min() >= 1
    # PCC must fit in the first handful of DF symbols
    assert l.max() <= 8
    # PCC avoids DC, guards, DRS
    g_top, g_bot = phyres.guards(b)
    n_dft = 64 * b
    assert np.all(k != n_dft // 2)
    assert np.all(k >= g_bot)
    assert np.all(k < n_dft - g_top)
    drs_lin = drs.drs_linear_indices(8, b, 20, n_ts).ravel()
    assert not np.intersect1d(lin, drs_lin).size


def test_pcc_b1_siso_layout():
    """b=1, N_TS=1: symbol 1 has 42 free cells (56-14 DRS), symbol 2 has 56."""
    l, _ = pcc.pcc_cells_l_k(1, 1)
    assert np.sum(l == 1) == 42
    assert np.sum(l == 2) == 56


@pytest.mark.parametrize("u", [1, 8])
@pytest.mark.parametrize("b", [1, 4, 16])
@pytest.mark.parametrize("n_ts", [1, 2, 4, 8])
@pytest.mark.parametrize("n_slots", [1, 2, 4])
def test_pdc_disjoint_and_counts(u, b, n_ts, n_slots):
    n_packet_symb = 10 * u * n_slots
    if n_ts == 4 and n_packet_symb < 15:
        pytest.skip("invalid config")
    if u == 8 and n_ts == 8 and (n_packet_symb < 20 or n_packet_symb % 10):
        pytest.skip("invalid config")
    pdc_lin = pdc.pdc_linear_indices(u, b, n_packet_symb, n_ts)
    pcc_lin = pcc.pcc_linear_indices(b, n_ts)
    drs_lin = drs.drs_linear_indices(u, b, n_packet_symb, n_ts).ravel()
    # pairwise disjoint
    assert not np.intersect1d(pdc_lin, pcc_lin).size
    assert not np.intersect1d(pdc_lin, drs_lin).size
    assert not np.intersect1d(pcc_lin, drs_lin).size
    # totals: every occupied cell in DF symbols is DRS, PCC or PDC
    n_df = get_N_DF_symb(u, n_packet_symb)
    total = n_df * 56 * b
    assert pdc_lin.size + pcc_lin.size + drs_lin.size == total
