"""Doppler-axis chestim helpers + the hard-decision slicer (r05)."""
import numpy as np
import pytest


def test_wiener_time_matrix_static_channel_exact():
    """Rows sum to 1: a static channel must pass unchanged; nu=0
    degenerates to uniform DRS averaging (the optimal static smoother)."""
    from dectnrp_tpu.phy.chestim import wiener_time_matrix
    for nu in (0.0, 0.008, 0.024):
        T = wiener_time_matrix(1, 1, 24, 1, nu)
        np.testing.assert_allclose(T.sum(-1), 1.0, atol=1e-5)
    T0 = wiener_time_matrix(1, 1, 24, 1, 0.0)
    n = T0.shape[-1]
    np.testing.assert_allclose(T0[0, 5], np.full(n, 1.0 / n), atol=1e-3)


def test_wiener_time_matrix_edge_rows_clamped():
    """Beyond the DRS span the smoother holds the edge row (no J0
    extrapolation blow-up — the r05 finding that sank the first cut)."""
    from dectnrp_tpu.phy.chestim import wiener_time_matrix
    T = wiener_time_matrix(1, 1, 24, 1, 0.024, 35.0)
    # last DRS symbol of stream 0 is at l = 21; rows 22, 23 must equal 21
    np.testing.assert_allclose(T[0, 22], T[0, 21], atol=1e-6)
    np.testing.assert_allclose(T[0, 23], T[0, 21], atol=1e-6)
    assert np.abs(T[0, 23]).sum() < 2.0, "extrapolation weights blew up"


def test_nu_from_drs_corr_inverts_j0():
    from dectnrp_tpu.phy.chestim import _j0, nu_from_drs_corr
    for nu in (0.002, 0.01, 0.03):
        rho = _j0(2 * np.pi * nu * 5)
        got = nu_from_drs_corr(np.asarray(rho), 5)
        np.testing.assert_allclose(got, nu, rtol=1e-2)


def test_j0_series_fallback_matches_scipy():
    scipy = pytest.importorskip("scipy.special")
    from dectnrp_tpu.phy import chestim
    x = np.linspace(0.0, 8.0, 200)
    # force the fallback path by hiding scipy temporarily
    import sys
    mod = sys.modules.pop("scipy.special")
    sys.modules["scipy.special"] = None
    try:
        with pytest.raises(Exception):
            __import__("scipy.special")
    except BaseException:
        pass
    finally:
        sys.modules["scipy.special"] = mod
    # direct check of the A&S polynomial against scipy on the real import
    got = chestim._j0(x)
    want = scipy.j0(x)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_hard_decision_roundtrip():
    """Slicing noiseless mapped symbols recovers the exact points."""
    import jax.numpy as jnp
    from dectnrp_tpu.phy.modulation import hard_decision, map_bits
    rng = np.random.default_rng(0)
    for n_bps in (1, 2, 4, 6):
        bits = rng.integers(0, 2, (3, 20 * n_bps)).astype(np.uint8)
        x = map_bits(jnp.asarray(bits), n_bps)
        d = hard_decision(x + 0.01 * (1 + 1j), n_bps)
        np.testing.assert_allclose(np.asarray(d), np.asarray(x), atol=1e-6)
