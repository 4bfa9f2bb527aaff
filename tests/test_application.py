"""Application layer + misc firmwares: datagram queue semantics, UDP
socket server/client loopback, the rtt datagram pipe over the air, the
txrxdelay calibrator and the channel scanner.

Oracles: reference application/queue/queue.cpp (drop-on-overflow),
apps/rtt + upper/rtt (round trip), README.md:282-301 (txrxdelay measures
the constant simulator loopback delay = 0), chscanner RMS.
"""
import numpy as np
import pytest

from dectnrp_tpu.application.queue import DatagramQueue
from dectnrp_tpu.application.socket_app import SocketClient, SocketServer
from dectnrp_tpu.apps.rtt import run_rtt
from dectnrp_tpu.apps.sync_gen import StreamConfig, run_sync
from dectnrp_tpu.phy.chscan import Chscan, Chscanner
from dectnrp_tpu.radio.hw_simulator import HwSimulator, SimDriver
from dectnrp_tpu.simulation.topology import Position, Trajectory
from dectnrp_tpu.simulation.vspace import VNodeConfig, VSpaceConfig
from dectnrp_tpu.upper.misc import TfwChscanner, TfwRtt, TfwTxrxDelay
from dectnrp_tpu.upper.runtime import NodeRuntime

NET = 0x12345678


def test_datagram_queue():
    q = DatagramQueue(nof_datagrams=3, datagram_max_bytes=8)
    assert q.write(b"a") and q.write(b"bb") and q.write(b"ccc")
    assert not q.write(b"overflow")          # full -> drop
    assert q.dropped == 1
    assert not q.write(b"123456789")         # oversized -> drop
    assert q.read() == b"a"                  # FIFO
    assert q.read_all() == [b"bb", b"ccc"]
    assert q.read() is None and len(q) == 0


def test_socket_server_client_loopback():
    srv = SocketServer([0, 0])               # ephemeral ports
    try:
        ports = srv.bound_ports
        cli = SocketClient(ports)
        cli.write(b"hello", 0)
        cli.write(b"world", 1)
        import time
        for _ in range(50):
            if srv.poll(timeout=0.02) and sum(
                    len(q) for q in srv.queues.values()) >= 2:
                break
        got = srv.read_all()
        assert sorted(got) == [b"hello", b"world"]
        cli.close()
    finally:
        srv.stop()


def test_sync_generator():
    srv = SocketServer([0])
    try:
        port = srv.bound_ports[0]
        counts = run_sync([StreamConfig(port, period_s=0.005)],
                          duration_s=0.06)
        assert counts[0] >= 8
        import time
        time.sleep(0.05)
        srv.poll(timeout=0.1)
        got = srv.read_all()
        assert len(got) >= 8
        # numbered in order
        seqs = [int.from_bytes(d[:4], "big") for d in got]
        assert seqs == sorted(seqs)
    finally:
        srv.stop()


def test_vnic_gated():
    from dectnrp_tpu.application.vnic import tun_available
    if not tun_available():
        pytest.skip("no /dev/net/tun access")
    from dectnrp_tpu.application.vnic import VnicServer
    v = VnicServer(ifname="tun_dect_t", ip="172.99.7.1",
                   peer_ip="172.99.7.2")
    try:
        import socket
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.sendto(b"x" * 16, ("172.99.7.2", 9999))
        s.close()
        import time
        ipv4 = None
        for _ in range(100):
            for d in v.read_all():
                if d and d[0] >> 4 == 4:     # skip kernel IPv6 chatter
                    ipv4 = d
                    break
            if ipv4:
                break
            time.sleep(0.01)
        assert ipv4, "no IPv4 datagram read from TUN"
        assert ipv4[9] == 17                 # protocol UDP
        assert ipv4[16:20] == bytes([172, 99, 7, 2])
    finally:
        v.close()


def _leak_node(n_ticks, fw_cls, **fw_kw):
    hw = HwSimulator(1)
    cfg = VSpaceConfig(samp_rate=1_728_000.0, spp_len=1024, noise_var=1e-9)
    nodes = [VNodeConfig(1, Trajectory(Position(0, 0, 0)),
                         tx_leakage_db=20.0)]
    drv = SimDriver(cfg, [hw], nodes)
    fw = fw_cls(NET, 0x2222, **fw_kw)
    rt = NodeRuntime(hw, fw, NET, regular_period=16384)
    for _ in range(n_ticks):
        drv.tick()
        rt.process()
    return fw, rt


@pytest.mark.slow
def test_txrxdelay_calibration():
    fw, rt = _leak_node(80, TfwTxrxDelay)
    d = fw.delays()
    assert len(d) >= 2, (fw.stats, rt.stats)
    # simulator loopback has zero intrinsic delay; sync must find the STF
    # where it was scheduled (reference measures 47-105 samples on USRPs)
    for x in d:
        assert abs(x) <= 2, d


@pytest.mark.slow
def test_rtt_over_the_air():
    """apps/rtt -> UDP -> node0 firmware -> air -> node1 echo -> air ->
    node0 -> UDP -> apps/rtt."""
    hws = [HwSimulator(1), HwSimulator(1)]
    cfg = VSpaceConfig(samp_rate=1_728_000.0, spp_len=2048, freq_hz=1.9e9,
                       noise_var=1e-8)
    nodes = [VNodeConfig(1, Trajectory(Position(0, 0, 0))),
             VNodeConfig(1, Trajectory(Position(1.0, 0, 0)))]
    drv = SimDriver(cfg, hws, nodes)

    srv = SocketServer([0])                  # firmware ingress
    out_srv = SocketServer([0])              # rtt app's echo listener
    try:
        fw0 = TfwRtt(NET, 0x2222)
        fw1 = TfwRtt(NET, 0x3333, echo=True)
        rt0 = NodeRuntime(hws[0], fw0, NET, app_server=srv,
                          app_client=SocketClient(out_srv.bound_ports))
        rt1 = NodeRuntime(hws[1], fw1, NET)

        import threading
        result = {}

        def app():
            result["res"] = run_rtt(srv.bound_ports[0],
                                    out_srv.bound_ports[0],
                                    n=2, payload_bytes=24, timeout_s=30.0)

        th = threading.Thread(target=app)
        th.start()
        for _ in range(400):
            drv.tick()
            rt0.process()
            rt1.process()
            if not th.is_alive():
                break
        th.join(timeout=5.0)
        res = result.get("res")
        assert res is not None and res.n >= 1, \
            (fw0.stats, fw1.stats, rt0.stats, rt1.stats)
    finally:
        srv.stop()
        out_srv.stop()


def test_chscanner_firmware():
    hw = HwSimulator(1)
    cfg = VSpaceConfig(samp_rate=1_728_000.0, spp_len=1024, noise_var=1e-6)
    nodes = [VNodeConfig(1, Trajectory(Position(0, 0, 0)),
                         tx_leakage_db=20.0)]
    drv = SimDriver(cfg, [hw], nodes)
    fw = TfwChscanner(window=2048, n_partial=2)
    rt = NodeRuntime(hw, fw, NET, regular_period=8192)
    # a strong burst in the middle of the run
    for i in range(40):
        if i == 10:
            hw.tx_schedule(hw.rx_time_passed + 2048,
                           0.5 * np.ones((1, 8192), np.complex64))
        drv.tick()
        rt.process()
    assert len(fw.results) >= 3
    rms = np.array([float(r.rms_ant[0]) for r in fw.results])
    # scan windows overlapping the burst must be much louder than noise
    assert rms.max() > 10 * rms.min()
