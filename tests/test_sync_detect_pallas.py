"""Fused Pallas detection kernel vs independent references (interpret mode).

The kernel (phy/ops/sync_detect.py) must reproduce the XLA sync path's
smoothed gated metric and, end to end, the same sync reports — it replaces
the prefix-sum detection chain (reference autocorrelator_detection.cpp
moving-sum structure) with one block-local fused pass.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dectnrp_tpu.sections.part3.packet_sizes import (PacketSizesDef,
                                                     get_packet_sizes)


def _sm_reference(x, u, b, thr, mmax, sl, sr):
    """Straight-line numpy recomputation of the smoothed gated metric."""
    from dectnrp_tpu.sections.part3.stf import cover_sequence, n_stf_patterns

    P = 16 * b
    n_pat = n_stf_patterns(u)
    L = n_pat * P
    B, R, T = x.shape
    n_t = T - L - P
    cov = cover_sequence(u)
    w = (cov[:-1] * cov[1:]).astype(np.float64)
    norm = n_pat / (n_pat - 1)
    p = x[..., :T - P] * np.conj(x[..., P:])
    pw = np.abs(x) ** 2
    Sp = np.concatenate([np.zeros((B, R, 1), np.complex128),
                         np.cumsum(p, -1)], -1)
    Sw = np.concatenate([np.zeros((B, R, 1)), np.cumsum(pw, -1)], -1)
    C = sum(w[j] * (Sp[..., (j + 1) * P:(j + 1) * P + n_t]
                    - Sp[..., j * P:j * P + n_t]) for j in range(n_pat - 1))
    P2 = Sw[..., L:L + n_t] - Sw[..., :n_t]
    Cs, P2s = C.sum(1), P2.sum(1)
    metric = norm * np.abs(Cs) / np.maximum(P2s, 1e-20)
    g = np.where((metric > thr) & (metric < mmax), metric, 0.0)
    k = sl + sr + 1
    gp = np.pad(g, ((0, 0), (sl, sr)))
    S = np.concatenate([np.zeros((B, 1)), np.cumsum(gp, -1)], -1)
    return (S[:, k:] - S[:, :-k]) / k


@pytest.mark.parametrize("u,b", [(1, 8), (8, 16)])
def test_fused_sm_matches_reference(u, b):
    from dectnrp_tpu.phy.ops.sync_detect import build_sync_sm
    from dectnrp_tpu.phy.sync import SyncParams
    from dectnrp_tpu.sections.part3.stf import cover_sequence

    P = 16 * b
    T = 40 * P + 7                    # deliberately not row-aligned
    B, R = 2, 2
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((B, R, T))
         + 1j * rng.standard_normal((B, R, T))).astype(np.complex64)
    # drop in a strongly periodic segment so the gate actually opens
    seg = np.tile(x[0, :, :P], (1, 12))[:, :12 * P]
    x[0, :, 5 * P:17 * P] = seg * np.repeat(
        np.resize(cover_sequence(u), 12), P)[None, :]

    pr = SyncParams()
    sl, sr = pr.smooth_left * b, pr.smooth_right * b
    cov = cover_sequence(u)
    w = tuple(float(v) for v in (cov[:-1] * cov[1:]))
    f = build_sync_sm(u, b, T, R, w, pr.metric_threshold, pr.metric_max,
                      sl, sr, interpret=True)
    got = np.asarray(f(jnp.asarray(x.real), jnp.asarray(x.imag)))
    want = _sm_reference(x.astype(np.complex128), u, b, pr.metric_threshold,
                         pr.metric_max, sl, sr)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_fused_sync_end_to_end_matches_xla():
    """Same packets, same stream: the pallas-detect sync must produce the
    same detections / fine times / CFO / N_eff_TX as the XLA-detect sync."""
    from dectnrp_tpu.phy.sync import build_sync
    from dectnrp_tpu.phy.tx import build_tx

    psdef = PacketSizesDef(1, 8, 0, 1, 0, 1, 6144)
    ps = get_packet_sizes(psdef)
    rng = np.random.default_rng(7)
    tx = build_tx(psdef, 0x12345678, 1)
    B = 3
    plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    fl = jnp.zeros((B,), bool)
    iq = np.asarray(tx(plcf, tb, fl, fl))               # [B, 1, n_pkt]
    T = 1 << 14
    offs = [900, 4000, 9000]
    cfo_true = 2e-4
    stream = (rng.standard_normal((B, 1, T))
              + 1j * rng.standard_normal((B, 1, T))).astype(np.complex64)
    stream *= np.sqrt(10 ** (-15 / 10) / 2)
    n = np.arange(iq.shape[-1])
    rot = np.exp(1j * cfo_true * n).astype(np.complex64)
    for i in range(B):
        stream[i, :, offs[i]:offs[i] + iq.shape[-1]] += iq[i] * rot

    s_xla = build_sync(1, 8, T, detect_impl="xla")
    s_pal = build_sync(1, 8, T, detect_impl="pallas_interpret")
    rx_, rp_ = s_xla(jnp.asarray(stream)), s_pal(jnp.asarray(stream))
    assert np.asarray(rx_["detected"]).all()
    assert np.asarray(rp_["detected"]).all()
    np.testing.assert_array_equal(np.asarray(rx_["t_fine"]),
                                  np.asarray(rp_["t_fine"]))
    np.testing.assert_array_equal(np.asarray(rx_["n_eff_tx"]),
                                  np.asarray(rp_["n_eff_tx"]))
    np.testing.assert_allclose(np.asarray(rx_["cfo"]),
                               np.asarray(rp_["cfo"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rx_["metric"]),
                               np.asarray(rp_["metric"]), rtol=1e-3)
    for i in range(B):
        assert abs(int(np.asarray(rp_["t_fine"])[i]) - offs[i]) <= 2
