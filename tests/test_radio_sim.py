"""Radio layer: gain LUT interpolation, hw negotiation, simulator lock-step,
and a full over-the-air packet between two simulated nodes.

Oracle: reference hw_simulator/vspace behavior -- a packet scheduled at
tx_time_64 on node A arrives at node B's RX ring at the same global sample
count (pathloss-scaled), and decodes.
"""
import numpy as np
import jax
import jax.numpy as jnp

from dectnrp_tpu.radio.gain_lut import CAL_SIMULATOR, GainLut
from dectnrp_tpu.radio.hw import Hw
from dectnrp_tpu.radio.hw_simulator import HwSimulator, SimDriver
from dectnrp_tpu.simulation.topology import Position, Trajectory, fspl_db
from dectnrp_tpu.simulation.vspace import VNodeConfig, VSpaceConfig

NID = 0x12345678


def test_gain_lut_simulator():
    lut = GainLut(CAL_SIMULATOR)
    apg = lut.get_achievable_power_gain_tx(-10.0, 1.9e9)
    # simulator: power -40..20 over gain 0..60, 1 dB step -> gain = power+40
    assert abs(apg.gain_db - 30.0) <= 0.5
    assert abs(apg.power_dbm - (-10.0)) <= 0.5
    apg_rx = lut.get_achievable_power_gain_rx(-30.0, 1.9e9)
    assert 0.0 <= apg_rx.gain_db <= 70.0


def test_hw_rate_negotiation():
    hw = Hw("test")
    assert hw.set_samp_rate(1_728_000) == 1_728_000
    assert hw.set_samp_rate(1_800_000) == 1_920_000
    assert hw.set_samp_rate(28_000_000) == 30_720_000


def test_hw_timed_commands():
    hw = Hw("test")
    hw.set_command_time(1000)
    hw.set_freq_tc(1.9e9)
    hw.apply_due_commands(500)
    assert hw.freq_hz == 0.0
    hw.apply_due_commands(1000)
    assert hw.freq_hz == 1.9e9


def test_two_node_packet_over_the_air():
    from dectnrp_tpu.phy.rx import build_rx
    from dectnrp_tpu.phy.tx import build_tx
    from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef, get_packet_sizes

    psdef = PacketSizesDef(1, 1, 0, 2, 0, 2, 6144)
    ps = get_packet_sizes(psdef)
    rate = 1_728_000.0
    spp = 512
    d_m = 5.0
    hws = [HwSimulator(1), HwSimulator(1)]
    cfg = VSpaceConfig(samp_rate=rate, spp_len=spp, freq_hz=1.9e9,
                       noise_var=1e-9)
    nodes = [VNodeConfig(1, Trajectory(Position(0, 0, 0))),
             VNodeConfig(1, Trajectory(Position(d_m, 0, 0)))]
    drv = SimDriver(cfg, hws, nodes)

    tx = build_tx(psdef, NID, 1)
    rng = np.random.default_rng(0)
    plcf = jnp.asarray(rng.integers(0, 2, (1, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (1, ps.N_TB_bits)), jnp.uint8)
    fl = jnp.zeros((1,), bool)
    iq = np.asarray(tx(plcf, tb, fl, fl))[0]           # [1, n]

    tx_time = 1000
    hws[0].tx_schedule(tx_time, iq)
    drv.run_until(tx_time + iq.shape[1] + spp)

    # node 1 receives the pathloss-scaled packet at the same global time
    rx_iq = hws[1].get_rx_stream(tx_time, iq.shape[1])
    g = 10 ** (-fspl_db(d_m, 1.9e9) / 20)
    # compensate pathloss and decode
    rx = build_rx(psdef, NID, 1)
    out = rx(jnp.asarray((rx_iq / g)[None]), jnp.float32(1e-9 / g ** 2))
    assert bool(out["tb_ok"][0])
    assert np.array_equal(np.asarray(out["tb"][0]), np.asarray(tb[0]))
    # node 0 hears nothing of its own TX (no leakage configured)
    own = hws[0].get_rx_stream(tx_time, iq.shape[1])
    assert np.mean(np.abs(own) ** 2) < 1e-6


def test_rx_ring_sliding_window():
    hw = HwSimulator(1, rx_ring_len=1024)
    for i in range(8):
        hw.push_rx_spp(np.full((1, 256), i, np.complex64))
    # ring holds the last 1024 samples = blocks 4..7
    assert hw.rx_time == 4 * 256
    blk = hw.get_rx_stream(4 * 256, 256)
    assert np.all(blk == 4)
