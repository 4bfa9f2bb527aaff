"""Sync chain: detection, timing, CFO, N_eff_TX on TX packets in noise.

Oracle model: reference sync_chunk pipeline behavior
(lib/src/phy/rx/sync/sync_chunk.cpp:146-278) -- a packet placed at a random
offset with CFO must be detected with sample-accurate timing and CFO error
well under half a subcarrier spacing.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dectnrp_tpu.phy.sync import build_sync, build_rx_stream, stf_time_template
from dectnrp_tpu.phy.tx import build_tx
from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef, get_packet_sizes

NID = 0x12345678


def _make_stream(psdef, offsets, cfo_rad, snr_db, T, seed=0):
    ps = get_packet_sizes(psdef)
    tx = build_tx(psdef, NID, 1)
    rng = np.random.default_rng(seed)
    B = len(offsets)
    plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
    flags = jnp.zeros((B,), bool)
    iq = np.asarray(tx(plcf, tb, flags, flags))            # [B, N_TX, n_pkt]
    R = iq.shape[1]
    sig_pow = np.mean(np.abs(iq) ** 2)
    nv = sig_pow / (10 ** (snr_db / 10))
    stream = (rng.standard_normal((B, R, T)) + 1j * rng.standard_normal((B, R, T)))
    stream *= np.sqrt(nv / 2)
    n = np.arange(iq.shape[-1])
    for i, off in enumerate(offsets):
        rot = np.exp(1j * cfo_rad * n)
        stream[i, :, off:off + iq.shape[-1]] += iq[i] * rot[None, :]
    return jnp.asarray(stream.astype(np.complex64)), nv, plcf, tb


def test_detection_and_timing_siso():
    psdef = PacketSizesDef(1, 1, 0, 2, 0, 2, 6144)
    T = 4096
    offsets = [100, 731, 1500, 2000]
    cfo = 2 * np.pi * 0.3 / 64          # 0.3 subcarrier spacings
    stream, nv, _, _ = _make_stream(psdef, offsets, cfo, snr_db=10.0, T=T)
    sync = build_sync(1, 1, T, neff_candidates=(1, 2, 4, 8))
    rep = sync(stream)
    assert bool(rep["detected"].all())
    t = np.asarray(rep["t_fine"])
    assert np.all(np.abs(t - np.asarray(offsets)) <= 2), t
    cfo_err = np.abs(np.asarray(rep["cfo"]) - cfo)
    assert np.all(cfo_err < 2 * np.pi * 0.05 / 64), cfo_err
    assert np.all(np.asarray(rep["n_eff_tx"]) == 1)


def test_no_false_alarm_on_noise():
    T = 4096
    rng = np.random.default_rng(1)
    noise = (rng.standard_normal((3, 1, T)) + 1j * rng.standard_normal((3, 1, T)))
    sync = build_sync(1, 1, T)
    rep = sync(jnp.asarray(noise.astype(np.complex64)))
    assert not bool(rep["detected"].any())


def test_neff_tx_discrimination():
    # TxDiv N_TS=2 (tm_mode 1) rotates the STF by 2*log2(2): templates must pick it
    psdef = PacketSizesDef(1, 1, 0, 2, 1, 2, 6144)
    T = 4096
    stream, nv, _, _ = _make_stream(psdef, [400, 900], 0.0, snr_db=15.0, T=T)
    sync = build_sync(1, 1, T)
    rep = sync(stream)
    assert bool(rep["detected"].all())
    assert np.all(np.asarray(rep["n_eff_tx"]) == 2), rep["n_eff_tx"]


def test_templates_orthogonalish():
    t1 = stf_time_template(1, 1, 1)
    t2 = stf_time_template(1, 1, 2)
    x = abs(np.vdot(t1, t2))
    assert x < 0.6, x


def test_sync_to_decode_pipeline():
    psdef = PacketSizesDef(1, 1, 0, 2, 0, 2, 6144)
    T = 4096
    offsets = [250, 1800]
    cfo = 2 * np.pi * 0.2 / 64
    stream, nv, plcf, tb = _make_stream(psdef, offsets, cfo, snr_db=12.0, T=T)
    sync = build_sync(1, 1, T)
    rep = sync(stream)
    assert bool(rep["detected"].all())
    rxs = build_rx_stream(psdef, NID, 1, T)
    out = rxs(stream, rep["t_fine"], rep["cfo"], jnp.float32(nv))
    assert bool(out["plcf1_ok"].all())
    assert bool(out["tb_ok"].all())
    assert np.array_equal(np.asarray(out["tb"]), np.asarray(tb))


def test_multi_packet_per_chunk():
    """Two packets 1.5 packet-lengths apart inside ONE chunk: both found.

    Reference sync_chunk keeps searching after each hit
    (sync_chunk.cpp:146-278); here build_sync(max_peaks=K) does K argmax
    rounds with +-1 STF masking between rounds."""
    psdef = PacketSizesDef(1, 1, 0, 1, 0, 2, 6144)     # 360-sample packet
    ps = get_packet_sizes(psdef)
    n_pkt = ps.N_samples_packet
    T = 2048
    off_a = 200
    off_b = off_a + int(1.5 * n_pkt)                   # 740
    # one batch element containing BOTH packets
    stream_a, nv, _, _ = _make_stream(psdef, [off_a], 0.0, snr_db=15.0, T=T,
                                      seed=1)
    stream_b, _, _, _ = _make_stream(psdef, [off_b], 0.0, snr_db=15.0, T=T,
                                     seed=2)
    noise = np.asarray(stream_a) * 0
    both = np.asarray(stream_a) + np.asarray(stream_b) - noise
    sync = build_sync(1, 1, T, max_peaks=4)
    rep = sync(jnp.asarray(both))
    det = np.asarray(rep["detected"][0])
    tf = np.asarray(rep["t_fine"][0])
    found = sorted(int(t) for t, d in zip(tf, det) if d)
    hits = [t for t in found if min(abs(t - off_a), abs(t - off_b)) <= 2]
    assert any(abs(t - off_a) <= 2 for t in found), (found, off_a, off_b)
    assert any(abs(t - off_b) <= 2 for t in found), (found, off_a, off_b)
    # masking keeps duplicates of the same packet out: each true offset is
    # matched by at most one detection within the mask radius
    for off in (off_a, off_b):
        assert sum(1 for t in found if abs(t - off) <= 2) == 1, (found, off)


def test_beta_and_integer_cfo_estimation():
    """f-domain coarse-peak stage: a beta=2 packet received at the beta=8
    hardware rate with a deliberate +2-bin integer CFO is detected AND its
    bandwidth + integer CFO are estimated (the reference declares this
    stage but ships it compile-disabled, coarse_peak_f_domain.cpp:94-201 —
    this is a capability extension)."""
    from dectnrp_tpu.phy.resampler import ResamplerPlan, build_resampler
    from dectnrp_tpu.phy.sync import SyncParams, build_beta_icfo
    from dectnrp_tpu.phy.tx import build_tx

    b_small, b_max = 2, 8
    psdef = PacketSizesDef(1, b_small, 0, 1, 0, 1, 6144)
    ps = get_packet_sizes(psdef)
    rng = np.random.default_rng(3)
    tx = build_tx(psdef, 0x12345678, 1)
    plcf = jnp.asarray(rng.integers(0, 2, (1, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (1, ps.N_TB_bits)), jnp.uint8)
    fl = jnp.zeros((1,), bool)
    iq = np.asarray(tx(plcf, tb, fl, fl))[0]                  # [1, n_pkt]
    up = build_resampler(ResamplerPlan(b_max // b_small, 1),
                         iq.shape[-1])                        # x4 upsample
    iq8 = np.asarray(up(jnp.asarray(iq)))                     # beta_max rate
    T = 1 << 14
    off = 2000
    Nfft = 64 * b_max
    # shift window is one comb period {-1..+2}: ±2 alias each other mod 4
    # (band-edge bins only would break the tie — noise-decided), so -2 is
    # deliberately NOT representable
    for cfo_bins in (0, 2, -1):
        stream = (rng.standard_normal((1, 1, T))
                  + 1j * rng.standard_normal((1, 1, T))).astype(np.complex64)
        stream *= np.sqrt(10 ** (-20 / 10) / 2)               # 20 dB SNR
        n = np.arange(iq8.shape[-1])
        rot = np.exp(2j * np.pi * cfo_bins * n / Nfft).astype(np.complex64)
        stream[0, :, off:off + iq8.shape[-1]] += iq8 * rot
        sync = build_sync(1, b_max, T,
                          params=SyncParams(est_beta_icfo=True))
        rep = sync(jnp.asarray(stream))
        assert bool(np.asarray(rep["detected"])[0]), cfo_bins
        t_fine = int(np.asarray(rep["t_fine"])[0])
        assert abs(t_fine - off) <= 64, (t_fine, off)
        # the estimator itself, driven from the true STF start: exact
        est = build_beta_icfo(1, b_max)
        beta, s = est(jnp.asarray(stream[0, :, off:off + Nfft]))
        assert int(beta) == b_small, (int(beta), cfo_bins)
        assert int(s) == cfo_bins, (int(s), cfo_bins)
        # through the sync pipeline (t_fine-driven): beta must hold; the
        # integer CFO tolerates the fine-offset-induced alignment error
        assert int(np.asarray(rep["beta"])[0]) == b_small, cfo_bins
