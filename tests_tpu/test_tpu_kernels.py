"""Non-interpret Pallas kernels + one cwrap'ed e2e decode on the TPU.

Everything here executes compiled kernels on the chip — no interpret mode,
no CPU mesh. Tolerances are slightly looser than the interpret twins
(tests/test_fec_bcjr_pallas.py, tests/test_ops_polyphase.py) because the
TPU's f32 accumulation order differs.
"""
import numpy as np
import pytest


def test_bcjr_pallas_on_tpu():
    import jax.numpy as jnp
    from dectnrp_tpu.phy.fec.bcjr_pallas import bcjr_posterior_pallas
    from dectnrp_tpu.phy.fec.turbo_jax import _bcjr_posterior_windowed

    K, B = 1056, 4
    rng = np.random.default_rng(K)
    Ls = jnp.asarray(rng.standard_normal((B, K + 3)).astype(np.float32) * 3)
    Lp = jnp.asarray(rng.standard_normal((B, K + 3)).astype(np.float32) * 3)
    La = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))
    ref = np.asarray(_bcjr_posterior_windowed(Ls, Lp, La, K, Lw=128, D=32))
    got = np.asarray(bcjr_posterior_pallas(Ls, Lp, La, K, Lw=128, D=32,
                                           interpret=False))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-2)


def test_turbo_decode_pallas_on_tpu():
    import jax.numpy as jnp
    from dectnrp_tpu.phy.fec.turbo_jax import turbo_decode, turbo_encode

    K, B = 2048, 4
    rng = np.random.default_rng(5)
    c = rng.integers(0, 2, (B, K)).astype(np.uint8)
    d = np.asarray(turbo_encode(jnp.asarray(c), K)).astype(np.float32)
    llr = (2.0 * d - 1.0) * 4.0 \
        + rng.standard_normal(d.shape).astype(np.float32)
    bits, _ = turbo_decode(jnp.asarray(llr), K, n_iter=4, impl="pallas")
    np.testing.assert_array_equal(np.asarray(bits), c)


def test_polyphase_pallas_on_tpu():
    import jax.numpy as jnp
    from dectnrp_tpu.phy.ops.polyphase import (make_aligned_design,
                                               make_superframe_design,
                                               polyphase_fir_pallas,
                                               polyphase_fir_xla)
    from dectnrp_tpu.phy.resampler import ResamplerPlan, _design

    plan = ResamplerPlan(10, 9)
    G, m0, W = _design(plan)
    d = make_superframe_design(G, 9)
    da = make_aligned_design(G, 9)
    rng = np.random.default_rng(2)
    n_frames = 6 * max(d.S, da.S)
    xp = jnp.asarray(rng.standard_normal((8, n_frames * 9 + W)), jnp.float32)
    ref = np.asarray(polyphase_fir_xla(xp, d, n_frames))
    got = np.asarray(polyphase_fir_pallas(xp, da, n_frames, interpret=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_cwrap_e2e_decode_on_tpu():
    """TX -> AWGN -> sync -> rx through the complex-free host boundary."""
    import jax
    import jax.numpy as jnp
    from dectnrp_tpu.common.cplx import cwrap
    from dectnrp_tpu.phy.sync import build_rx_stream, build_sync
    from dectnrp_tpu.phy.tx import build_tx
    from dectnrp_tpu.sections.part3.packet_sizes import (PacketSizesDef,
                                                         get_packet_sizes)

    psdef = PacketSizesDef(1, 1, 0, 2, 0, 2, 6144)
    ps = get_packet_sizes(psdef)
    nid = 0x12345678
    n_pkt = ps.N_samples_packet
    T = n_pkt + 1024
    rng = np.random.default_rng(0)
    plcf = rng.integers(0, 2, (1, 40)).astype(np.uint8)
    tb = rng.integers(0, 2, (1, ps.N_TB_bits)).astype(np.uint8)
    fl = np.zeros((1,), bool)
    iq = cwrap(build_tx(psdef, nid, 1))(plcf, tb, fl, fl)
    off = 300
    nv = 10.0 ** (-20.0 / 10.0)
    noise = (rng.standard_normal((1, 1, T)) + 1j * rng.standard_normal(
        (1, 1, T))).astype(np.complex64) * np.sqrt(nv / 2)
    y = noise
    y[..., off:off + n_pkt] += iq
    rep = cwrap(build_sync(1, 1, T))(y)
    assert bool(rep["detected"][0])
    assert abs(int(rep["t_fine"][0]) - off) <= 2
    out = cwrap(build_rx_stream(psdef, nid, 1, T))(
        y, np.asarray([int(rep["t_fine"][0])]),
        np.asarray([float(rep["cfo"][0])], np.float32), np.float32(nv))
    assert bool(out["tb_ok"][0])
    assert np.array_equal(np.asarray(out["tb"][0]), tb[0])


def test_sync_detect_pallas_on_tpu():
    """Fused detection kernel (non-interpret Mosaic) agrees with the XLA
    sync path on silicon: same detections, fine times, CFO, metric."""
    import jax.numpy as jnp

    from dectnrp_tpu.common.cplx import cwrap_cached as _cw
    from dectnrp_tpu.phy.sync import build_sync
    from dectnrp_tpu.phy.tx import build_tx
    from dectnrp_tpu.sections.part3.packet_sizes import (PacketSizesDef,
                                                         get_packet_sizes)

    psdef = PacketSizesDef(1, 8, 0, 1, 0, 1, 6144)
    ps = get_packet_sizes(psdef)
    rng = np.random.default_rng(3)
    tx = _cw(build_tx(psdef, 0x12345678, 1))
    B = 2
    plcf = rng.integers(0, 2, (B, 40)).astype(np.uint8)
    tb = rng.integers(0, 2, (B, ps.N_TB_bits)).astype(np.uint8)
    fl = np.zeros((B,), bool)
    iq = tx(plcf, tb, fl, fl)
    T = 1 << 14
    offs = [1200, 7000]
    stream = (rng.standard_normal((B, 1, T))
              + 1j * rng.standard_normal((B, 1, T))).astype(np.complex64)
    stream *= np.sqrt(10 ** (-15 / 10) / 2)
    for i in range(B):
        stream[i, :, offs[i]:offs[i] + iq.shape[-1]] += iq[i]

    rp = _cw(build_sync(1, 8, T, detect_impl="pallas"))(stream)
    rx_ = _cw(build_sync(1, 8, T, detect_impl="xla"))(stream)
    assert np.asarray(rp["detected"]).all()
    np.testing.assert_array_equal(np.asarray(rp["t_fine"]),
                                  np.asarray(rx_["t_fine"]))
    np.testing.assert_allclose(np.asarray(rp["metric"]),
                               np.asarray(rx_["metric"]), rtol=1e-3)
    for i in range(B):
        assert abs(int(np.asarray(rp["t_fine"])[i]) - offs[i]) <= 2
