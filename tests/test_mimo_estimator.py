"""MIMO estimator: wideband condensation + exhaustive codebook search
(reference estimator_mimo.cpp:80-250) and its wiring through the RX chain
(h_cells output) and runtime (PdcReport.mimo_csi).
"""
import numpy as np
import pytest

from dectnrp_tpu.phy.mimo import (MimoCsi, MimoReport, condense_wideband,
                                  estimate_mimo, reports_from_cells)
from dectnrp_tpu.sections.part3.beamforming import get_all_W


def _brute_force(cells, N_TS):
    """Reference metric in plain numpy: min-cell power, argmax codebook."""
    B, R, T, C = cells.shape
    Wall = get_all_W(N_TS, T)                    # [n, T, N_TS]
    best = []
    for b in range(B):
        metrics = []
        for W in Wall:
            p = [np.sum(np.abs(cells[b, :, :, c] @ W) ** 2)
                 for c in range(C)]
            metrics.append(min(p))
        best.append(int(np.argmax(metrics)))
    return best


def test_condense_wideband():
    h = np.arange(16, dtype=np.complex64).reshape(1, 1, 1, 16)
    c = condense_wideband(h)
    assert c.shape == (1, 1, 1, 4)
    assert np.allclose(c[0, 0, 0], [1.5, 5.5, 9.5, 13.5])


@pytest.mark.parametrize("T", [2, 4])
def test_codebook_search_matches_bruteforce(T):
    rng = np.random.default_rng(7)
    cells = (rng.normal(size=(8, 2, T, 4))
             + 1j * rng.normal(size=(8, 2, T, 4))).astype(np.complex64)
    reps = reports_from_cells(cells, N_TS=1)
    assert [r.codebook_index for r in reps] == _brute_force(cells, 1)
    assert all(r.N_TX == T and r.power_min_cell > 0 for r in reps)


def test_search_prefers_matched_channel():
    """A channel aligned with codebook vector w must select that index."""
    Wall = get_all_W(1, 2)                       # [6, 2, 1]
    for idx in range(len(Wall)):
        w = Wall[idx][:, 0]
        # rank-1 channel h = a * w^H so that |h @ w| is maximal at idx
        cells = np.conj(w)[None, None, :, None] * np.ones((1, 1, 2, 4))
        rep = reports_from_cells(cells.astype(np.complex64))[0]
        got_w = Wall[rep.codebook_index][:, 0]
        # winner must achieve the same metric as the matched index
        assert abs(np.vdot(got_w, np.conj(w))) >= abs(
            np.vdot(Wall[idx][:, 0], np.conj(w))) - 1e-6


def test_estimate_mimo_full_band_and_reciprocal():
    rng = np.random.default_rng(3)
    h = (rng.normal(size=(2, 4, 2, 56))
         + 1j * rng.normal(size=(2, 4, 2, 56))).astype(np.complex64)
    reps = estimate_mimo(h, N_TS=1)
    assert all(isinstance(r, MimoReport) for r in reps)
    recip = estimate_mimo(h, N_TS=1, reciprocal=True)
    assert recip[0].N_TX == 4                    # RX<->TX transposed


def test_mimo_csi_tracking():
    csi = MimoCsi()
    csi.update(MimoReport(3, 1.0, 1, 2), now=100)
    assert csi.codebook_index == 3 and csi.last_update == 100
    for t in range(20):
        csi.update(MimoReport(t % 4, 1.0, 1, 2), now=200 + t)
    assert len(csi.history) <= 16


def test_rx_h_cells_end_to_end():
    """TxDiv 2x2 packet through TX -> AWGN -> RX: h_cells has the right
    shape and the codebook search runs on it."""
    import jax
    import jax.numpy as jnp

    from dectnrp_tpu.phy.rx import build_rx
    from dectnrp_tpu.phy.tx import build_tx
    from dectnrp_tpu.sections.part3.packet_sizes import (PacketSizesDef,
                                                         get_packet_sizes)
    from dectnrp_tpu.simulation.channels import awgn

    psdef = PacketSizesDef(1, 1, 0, 2, 1, 2, 6144)   # tm 1: 2 TX diversity
    ps = get_packet_sizes(psdef)
    nid = 0x12345678
    tx = build_tx(psdef, nid, 1)
    rx = build_rx(psdef, nid, 1)
    rng = np.random.default_rng(0)
    B = 4
    plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    fl = jnp.zeros((B,), bool)
    iq = tx(plcf, tb, fl, fl)
    noisy = awgn(jax.random.PRNGKey(0), iq, 1e-4)
    out = rx(noisy, jnp.float32(1e-4))
    assert bool(out["tb_ok"].all())
    cells = np.asarray(out["h_cells"])
    assert cells.shape == (B, 2, 2, 4)
    reps = reports_from_cells(cells)
    assert [r.codebook_index for r in reps] == _brute_force(cells, 1)


def test_aoa_bartlett_recovers_azimuth():
    """Working AoA estimator (the reference's estimator_aoa_t is a stub):
    a plane wave from a known azimuth onto a half-wavelength ULA is
    localized to within the grid step."""
    import numpy as np

    from dectnrp_tpu.phy.mimo import estimate_aoa
    from dectnrp_tpu.radio.antenna_array import AntennaArray, C0

    freq = 1.9e9
    lam = C0 / freq
    arr = AntennaArray("linear", n_ant=4, spacing=(lam / 2,))
    rng = np.random.default_rng(0)
    for az_true in (-1.0, 0.3, 1.2):
        a = arr.steering(np.array([az_true]), freq)[0]      # [R]
        h = a[:, None] * np.exp(1j * rng.uniform(0, 2 * np.pi, (1, 8)))
        h = h + 0.02 * (rng.standard_normal((4, 8))
                        + 1j * rng.standard_normal((4, 8)))
        az, spec = estimate_aoa(h, arr, freq)
        # ULA mirror ambiguity (phase ~ cos(theta) is even): accept -az
        err = min(abs(az - az_true), abs(-az - az_true))
        assert err < 0.05, (az, az_true)
