"""Full-stack runtime: firmware-driven TX -> vspace -> sync -> decode ->
firmware callbacks, two nodes over the virtual ether.

Oracle: the reference's *_simulator configurations (basic/loopback/p2p):
several hw_simulator + worker pool + tpoint stacks in lock-step. Here:
a periodic transmitter tpoint on node 0 and a counting receiver on node 1.
"""
import numpy as np
import pytest

from dectnrp_tpu.radio.hw_simulator import HwSimulator, SimDriver
from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef, get_packet_sizes
from dectnrp_tpu.sections.part4.identity import Identity
from dectnrp_tpu.sections.part4.plcf import Plcf10
from dectnrp_tpu.simulation.topology import Position, Trajectory
from dectnrp_tpu.simulation.vspace import VNodeConfig, VSpaceConfig
from dectnrp_tpu.upper.runtime import NodeRuntime
from dectnrp_tpu.upper.tpoint import (MacHighPhy, MacLowPhy, Tpoint,
                                      TxDescriptor)

IDENT = Identity(0x12345678, 0x2222, 0x3333)
PSDEF = PacketSizesDef(1, 1, 0, 2, 0, 2, 6144)


class TxBeacon(Tpoint):
    """Transmits one packet per regular callback, 2000 samples ahead."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.sent = 0
        self.payloads = []

    def work_regular(self, now):
        ps = get_packet_sizes(PSDEF)
        rng = np.random.default_rng(self.sent)
        tb = rng.integers(0, 2, ps.N_TB_bits).astype(np.uint8)
        self.payloads.append(tb)
        self.sent += 1
        plcf = Plcf10(packet_length_type=PSDEF.PacketLengthType,
                      packet_length=PSDEF.PacketLength,
                      short_network_id=IDENT.short_network_id,
                      transmitter_identity=IDENT.short_rdid,
                      transmit_power=7, df_mcs=PSDEF.mcs_index)
        td = TxDescriptor(psdef=PSDEF, plcf=plcf, tb_bits=tb,
                          network_id=IDENT.network_id, tx_time=now + 2000)
        out = MacHighPhy()
        out.tx_descriptors.append(td)
        return out


class RxCounter(Tpoint):
    def __init__(self, **kw):
        super().__init__(**kw)
        self.pcc = 0
        self.pdc = 0
        self.tbs = []

    def work_pcc(self, phy_maclow):
        self.pcc += 1
        rep = phy_maclow.pcc_report
        if rep.plcf is None or rep.plcf.transmitter_identity != IDENT.short_rdid:
            return MacLowPhy()
        return self.worksub_pcc2pdc(phy_maclow, rep.plcf_type,
                                    IDENT.network_id)

    def work_pdc(self, phy_machigh):
        self.pdc += 1
        self.tbs.append(phy_machigh.pdc_report.tb_bits)
        return MacHighPhy()


def test_two_node_runtime_end_to_end():
    rate, spp = 1_728_000.0, 512
    hws = [HwSimulator(1), HwSimulator(1)]
    cfg = VSpaceConfig(samp_rate=rate, spp_len=spp, freq_hz=1.9e9,
                       noise_var=1e-8)
    # 1 m apart: mild pathloss, high SNR
    nodes = [VNodeConfig(1, Trajectory(Position(0, 0, 0))),
             VNodeConfig(1, Trajectory(Position(1.0, 0, 0)))]
    drv = SimDriver(cfg, hws, nodes)

    tx_fw = TxBeacon()
    rx_fw = RxCounter()
    rt_tx = NodeRuntime(hws[0], tx_fw, IDENT.network_id,
                        regular_period=8192)
    rt_rx = NodeRuntime(hws[1], rx_fw, IDENT.network_id)

    for _ in range(120):
        drv.tick()
        rt_tx.process()
        rt_rx.process()

    assert tx_fw.sent >= 4, tx_fw.sent
    assert rx_fw.pdc >= 3, (tx_fw.sent, rx_fw.pcc, rx_fw.pdc,
                            rt_rx.stats)
    # payload integrity end to end
    for got in rx_fw.tbs:
        assert any(np.array_equal(got, p) for p in tx_fw.payloads)
    assert rt_rx.stats.pdc_err == 0


def test_self_loopback_via_leakage():
    """reference loopback firmware mechanism: own TX heard through the
    intra-node leakage channel."""
    rate, spp = 1_728_000.0, 512
    hw = HwSimulator(1)
    cfg = VSpaceConfig(samp_rate=rate, spp_len=spp, noise_var=1e-9)
    nodes = [VNodeConfig(1, Trajectory(Position(0, 0, 0)),
                         tx_leakage_db=20.0)]
    drv = SimDriver(cfg, [hw], nodes)
    tx_fw = TxBeacon()
    rx_cnt = RxCounter()

    class Both(Tpoint):
        def __init__(self):
            super().__init__()
        work_regular = staticmethod(tx_fw.work_regular)
        work_pcc = staticmethod(rx_cnt.work_pcc)
        work_pdc = staticmethod(rx_cnt.work_pdc)

    rt = NodeRuntime(hw, Both(), IDENT.network_id, regular_period=8192)
    for _ in range(80):
        drv.tick()
        rt.process()
    assert rx_cnt.pdc >= 2, (tx_fw.sent, rx_cnt.pcc, rx_cnt.pdc, rt.stats)


def test_two_packets_one_chunk():
    """Two packets 1.5 packet-lengths apart (both inside one 2048-sample
    sync chunk) are BOTH decoded -- multi-peak sync through the runtime
    (reference sync_chunk.cpp:146-278 keeps searching after a hit)."""
    psdef = PacketSizesDef(1, 1, 0, 1, 0, 2, 6144)     # 360-sample packet
    ps = get_packet_sizes(psdef)
    n_pkt = ps.N_samples_packet

    class TxPair(Tpoint):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.sent = 0
            self.payloads = []

        def work_regular(self, now):
            out = MacHighPhy()
            if self.sent >= 8:          # stop early so the tail drains
                return out
            for j in range(2):
                rng = np.random.default_rng(100 * self.sent + j)
                tb = rng.integers(0, 2, ps.N_TB_bits).astype(np.uint8)
                self.payloads.append(tb)
                plcf = Plcf10(packet_length_type=psdef.PacketLengthType,
                              packet_length=psdef.PacketLength,
                              short_network_id=IDENT.short_network_id,
                              transmitter_identity=IDENT.short_rdid,
                              transmit_power=7, df_mcs=psdef.mcs_index)
                out.tx_descriptors.append(TxDescriptor(
                    psdef=psdef, plcf=plcf, tb_bits=tb,
                    network_id=IDENT.network_id,
                    tx_time=now + 2000 + j * int(1.5 * n_pkt)))
            self.sent += 2
            return out

    rate, spp = 1_728_000.0, 512
    hws = [HwSimulator(1), HwSimulator(1)]
    cfg = VSpaceConfig(samp_rate=rate, spp_len=spp, noise_var=1e-8)
    nodes = [VNodeConfig(1, Trajectory(Position(0, 0, 0))),
             VNodeConfig(1, Trajectory(Position(1.0, 0, 0)))]
    drv = SimDriver(cfg, hws, nodes)
    tx_fw = TxPair()
    rx_fw = RxCounter()
    rt_tx = NodeRuntime(hws[0], tx_fw, IDENT.network_id, regular_period=8192)
    rt_rx = NodeRuntime(hws[1], rx_fw, IDENT.network_id)
    for _ in range(100):
        drv.tick()
        rt_tx.process()
        rt_rx.process()
    # at least 2 full pair transmissions decoded in full
    assert tx_fw.sent >= 4
    assert rx_fw.pdc >= tx_fw.sent - 2, (tx_fw.sent, rx_fw.pdc, rt_rx.stats)
    for got in rx_fw.tbs:
        assert any(np.array_equal(got, p) for p in tx_fw.payloads)


def test_pcc_first_fires_before_packet_tail():
    """Streaming PCC-first decode (reference worker_tx_rx.cpp:110-228):
    work_pcc must fire while most of a LONG packet is still on the air —
    i.e. as soon as the minimum-length window (STF + PCC symbols) is
    buffered — and work_pdc only once the PLCF-declared tail has arrived."""
    long_psdef = PacketSizesDef(1, 1, 1, 16, 0, 1, 6144)   # 16 slots
    ps_long = get_packet_sizes(long_psdef)
    n_long = ps_long.N_samples_packet
    assert n_long > 10000                                  # genuinely long

    class LongTx(TxBeacon):
        def work_regular(self, now):
            if self.sent >= 1:
                return MacHighPhy()
            rng = np.random.default_rng(0)
            tb = rng.integers(0, 2, ps_long.N_TB_bits).astype(np.uint8)
            self.payloads.append(tb)
            self.sent += 1
            plcf = Plcf10(packet_length_type=long_psdef.PacketLengthType,
                          packet_length=long_psdef.PacketLength,
                          short_network_id=IDENT.short_network_id,
                          transmitter_identity=IDENT.short_rdid,
                          transmit_power=7, df_mcs=long_psdef.mcs_index)
            out = MacHighPhy()
            out.tx_descriptors.append(TxDescriptor(
                psdef=long_psdef, plcf=plcf, tb_bits=tb,
                network_id=IDENT.network_id,
                tx_time=max(now + 2000, self.lower.tx_earliest)))
            return out

    class LatencyRx(RxCounter):
        def __init__(self, rt_ref, **kw):
            super().__init__(**kw)
            self.rt_ref = rt_ref
            self.pcc_at = None
            self.pdc_at = None
            self.pkt_t0 = None

        def work_pcc(self, phy_maclow):
            self.pcc_at = self.rt_ref[0]._dect_time_passed
            self.pkt_t0 = phy_maclow.sync_report.fine_peak_time
            return super().work_pcc(phy_maclow)

        def work_pdc(self, phy_machigh):
            self.pdc_at = self.rt_ref[0]._dect_time_passed
            return super().work_pdc(phy_machigh)

    rate, spp = 1_728_000.0, 512
    hws = [HwSimulator(1), HwSimulator(1)]
    cfg = VSpaceConfig(samp_rate=rate, spp_len=spp, freq_hz=1.9e9,
                       noise_var=1e-8)
    nodes = [VNodeConfig(1, Trajectory(Position(0, 0, 0))),
             VNodeConfig(1, Trajectory(Position(1.0, 0, 0)))]
    drv = SimDriver(cfg, hws, nodes)
    tx_fw = LongTx()
    rt_ref = []
    rx_fw = LatencyRx(rt_ref)
    rt_tx = NodeRuntime(hws[0], tx_fw, IDENT.network_id, regular_period=8192)
    rt_rx = NodeRuntime(hws[1], rx_fw, IDENT.network_id)
    rt_ref.append(rt_rx)

    for _ in range(150):
        drv.tick()
        rt_tx.process()
        rt_rx.process()
        if rx_fw.pdc >= 1:
            break
    assert rx_fw.pdc == 1 and rx_fw.pcc >= 1, (tx_fw.sent, rt_rx.stats)
    pkt_end = rx_fw.pkt_t0 + n_long
    # PCC fired while >=50% of the packet was still on the air...
    assert rx_fw.pcc_at < rx_fw.pkt_t0 + 0.5 * n_long, \
        (rx_fw.pcc_at - rx_fw.pkt_t0, n_long)
    # ...and PDC only after the tail (but promptly: within 2 chunks)
    assert rx_fw.pdc_at >= pkt_end, (rx_fw.pdc_at, pkt_end)
    assert rx_fw.pdc_at <= pkt_end + 2 * (rt_rx.chunk_len + rt_rx.overlap)
    assert np.array_equal(rx_fw.tbs[0], tx_fw.payloads[0])


def test_json_export_wiring(tmp_path):
    """NodeRuntime(json_export_dir=...) writes one record per received
    packet (reference worker_tx_rx.cpp:355-415 json_export dumps)."""
    import json as _json
    import os

    rate, spp = 1_728_000.0, 512
    hws = [HwSimulator(1), HwSimulator(1)]
    cfg = VSpaceConfig(samp_rate=rate, spp_len=spp, freq_hz=1.9e9,
                       noise_var=1e-8)
    nodes = [VNodeConfig(1, Trajectory(Position(0, 0, 0))),
             VNodeConfig(1, Trajectory(Position(1.0, 0, 0)))]
    drv = SimDriver(cfg, hws, nodes)
    tx_fw, rx_fw = TxBeacon(), RxCounter()
    rt_tx = NodeRuntime(hws[0], tx_fw, IDENT.network_id, regular_period=8192)
    out_dir = str(tmp_path / "packets")
    rt_rx = NodeRuntime(hws[1], rx_fw, IDENT.network_id,
                        json_export_dir=out_dir)
    for _ in range(120):
        drv.tick()
        rt_tx.process()
        rt_rx.process()
    assert rx_fw.pdc >= 3
    rt_rx.json_export.flush()
    files = sorted(os.listdir(out_dir))
    assert files, "no packet records written"
    recs = []
    for f in files:
        recs.extend(_json.load(open(os.path.join(out_dir, f))))
    assert len(recs) >= rx_fw.pdc
    r = next(rec for rec in recs if "pdc" in rec)
    assert r["pcc"]["crc_ok"] and r["pdc"]["crc_ok"]
    assert r["sync"]["N_eff_TX"] == 1
    assert isinstance(r["pcc"]["plcf_hex"], str)
    assert "snr_db" in r and "cfo_rad_per_sample" in r["sync"]
