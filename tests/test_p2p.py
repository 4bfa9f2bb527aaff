"""P2P FT<->PT firmware over the virtual ether: beacon acquisition,
association handshake, resource allocation mirroring, bidirectional user
data with MCS feedback.

Oracle: the reference's p2p_simulator configuration (tfw_p2p_ft/pt +
hw_simulator nodes in one process, configurations/p2p_simulator/).
"""
import numpy as np
import pytest

from dectnrp_tpu.mac.allocation import Direction
from dectnrp_tpu.radio.hw_simulator import HwSimulator, SimDriver
from dectnrp_tpu.sections.part4.identity import Identity
from dectnrp_tpu.simulation.topology import Position, Trajectory
from dectnrp_tpu.simulation.vspace import VNodeConfig, VSpaceConfig
from dectnrp_tpu.upper.p2p import (AssocState, P2pConfig, TfwP2pFt, TfwP2pPt,
                                   psdef_for_bytes, subslot_samples)
from dectnrp_tpu.upper.runtime import NodeRuntime

NET = 0x12345678


def _build(n_ticks=160, spp=2048, samp_rate=1_728_000):
    cfg = P2pConfig(ft_identity=Identity(NET, 0x00ABCDEF, 0x0ABC))
    ft = TfwP2pFt(cfg)
    pt = TfwP2pPt(cfg, Identity(NET, 0x00111111, 0x1111))
    hws = [HwSimulator(1), HwSimulator(1)]
    vcfg = VSpaceConfig(samp_rate=float(samp_rate), spp_len=spp, freq_hz=1.9e9,
                        noise_var=1e-8)
    nodes = [VNodeConfig(1, Trajectory(Position(0, 0, 0))),
             VNodeConfig(1, Trajectory(Position(1.0, 0, 0)))]
    drv = SimDriver(vcfg, hws, nodes)
    rt_ft = NodeRuntime(hws[0], ft, NET)
    rt_pt = NodeRuntime(hws[1], pt, NET)
    return cfg, ft, pt, drv, rt_ft, rt_pt, n_ticks


def test_psdef_for_bytes():
    psdef = psdef_for_bytes(1, 1, 0, 2, 30)
    assert psdef is not None
    from dectnrp_tpu.sections.part3.packet_sizes import get_packet_sizes
    assert get_packet_sizes(psdef).N_TB_bits >= 240
    assert subslot_samples(1, 1) == 360


@pytest.mark.slow
def test_p2p_association_and_data():
    cfg, ft, pt, drv, rt_ft, rt_pt, n_ticks = _build()

    # application datagrams queued on both sides up front
    ul_msgs = [bytes([i] * 24) for i in range(1, 4)]
    dl_msgs = [bytes([0x80 + i] * 24) for i in range(1, 4)]
    pt.work_application(ul_msgs)
    ft.work_application(dl_msgs)

    for _ in range(n_ticks):
        drv.tick()
        rt_ft.process()
        rt_pt.process()

    # beacon acquisition + phase lock
    assert pt.stats["beacons"] >= 3, (pt.stats, rt_pt.stats)
    # association completed
    assert pt.state is AssocState.ASSOCIATED, (pt.state, pt.stats, ft.stats)
    assert ft.stats["assoc_req"] >= 1 and pt.stats["assoc_resp"] >= 1
    contact = ft.contacts.by_short(0x1111)
    assert contact is not None and contact.associated
    # allocation mirrored: PT has UL+DL resources within the beacon period
    assert len(pt.alloc.resources(Direction.UL)) == 1
    assert len(pt.alloc.resources(Direction.DL)) == 1
    ul = pt.alloc.resources(Direction.UL)[0]
    assert ul.length == cfg.alloc_length_subslots * cfg.subslot
    # user data flowed both ways, payloads intact
    assert any(m in ft.app_rx for m in ul_msgs), (ft.app_rx, pt.stats)
    assert any(m in pt.app_rx for m in dl_msgs), (pt.app_rx, ft.stats)
    # MCS feedback reached the FT (PT reports CQI via feedback format 4)
    assert contact.mcs_dl >= cfg.mcs_min
    assert rt_pt.stats.pdc_err == 0 or rt_pt.stats.pdc_ok > rt_pt.stats.pdc_err


@pytest.mark.slow
def test_p2p_sdr_rate_resampler_engaged():
    """The full FT<->PT pipe at an SDR rate: radio at 1.92 Ms/s against the
    1.728 Ms/s DECT rate, polyphase resampler engaged both directions
    (reference phy_config.cpp:32-67 rate table + sync_chunk.cpp:43-50 M/L
    swap at RX). Same association + user-data assertions as the native-rate
    test."""
    cfg, ft, pt, drv, rt_ft, rt_pt, n_ticks = _build(
        n_ticks=180, samp_rate=1_920_000)
    assert not rt_ft.plan_tx.identity and rt_ft.plan_tx.L == 10 \
        and rt_ft.plan_tx.M == 9

    ul_msgs = [bytes([i] * 24) for i in range(1, 4)]
    dl_msgs = [bytes([0x80 + i] * 24) for i in range(1, 4)]
    pt.work_application(ul_msgs)
    ft.work_application(dl_msgs)

    for _ in range(n_ticks):
        drv.tick()
        rt_ft.process()
        rt_pt.process()

    assert pt.stats["beacons"] >= 3, (pt.stats, rt_pt.stats)
    assert pt.state is AssocState.ASSOCIATED, (pt.state, pt.stats, ft.stats)
    assert ft.stats["assoc_req"] >= 1 and pt.stats["assoc_resp"] >= 1
    assert any(m in ft.app_rx for m in ul_msgs), (ft.app_rx, pt.stats)
    assert any(m in pt.app_rx for m in dl_msgs), (pt.app_rx, ft.stats)


@pytest.mark.slow
def test_p2p_three_nodes_and_rd_shutdown():
    """p2p_simulator topology: ONE FT + TWO PTs over the virtual ether
    (reference configurations/p2p_simulator/upper.json: p2p_ft + 2x p2p_pt),
    then the TfwP2pRd graceful-shutdown lifecycle (tfw_p2p_rd.cpp work_stop:
    all connections closed before stop completes)."""
    from dectnrp_tpu.upper.p2p import RdMode, TfwP2pRd

    cfg = P2pConfig(ft_identity=Identity(NET, 0x00ABCDEF, 0x0ABC))
    ft = TfwP2pFt(cfg)
    pts = [TfwP2pPt(cfg, Identity(NET, 0x00111111, 0x1111)),
           TfwP2pPt(cfg, Identity(NET, 0x00222222, 0x2222))]
    assert isinstance(ft, TfwP2pRd) and all(isinstance(p, TfwP2pRd)
                                            for p in pts)
    hws = [HwSimulator(1) for _ in range(3)]
    vcfg = VSpaceConfig(samp_rate=1_728_000.0, spp_len=2048, freq_hz=1.9e9,
                        noise_var=1e-8)
    nodes = [VNodeConfig(1, Trajectory(Position(0, 0, 0))),
             VNodeConfig(1, Trajectory(Position(1.0, 0, 0))),
             VNodeConfig(1, Trajectory(Position(0, 1.0, 0)))]
    drv = SimDriver(vcfg, hws, nodes)
    rts = [NodeRuntime(hws[0], ft, NET)] + \
        [NodeRuntime(hws[i + 1], p, NET) for i, p in enumerate(pts)]

    for p in pts:
        p.work_application([bytes([p.identity.short_rdid & 0xFF] * 16)])

    for _ in range(200):
        drv.tick()
        for rt in rts:
            rt.process()

    # both PTs associated with disjoint allocations; UL data from both
    assert all(p.state is AssocState.ASSOCIATED for p in pts), \
        [(p.state, p.stats) for p in pts]
    c1, c2 = ft.contacts.by_short(0x1111), ft.contacts.by_short(0x2222)
    assert c1 is not None and c2 is not None
    assert c1.associated and c2.associated
    ul1 = pts[0].alloc.resources(Direction.UL)[0]
    ul2 = pts[1].alloc.resources(Direction.UL)[0]
    assert ul1.offset != ul2.offset, "UL allocations must be orthogonal"
    assert bytes([0x11] * 16) in ft.app_rx and bytes([0x22] * 16) in ft.app_rx

    # --- graceful shutdown: FT releases both PTs
    ft.work_stop()
    assert ft.rd_mode is RdMode.SHUTTING_DOWN
    assert not ft.is_stop_complete()          # releases still pending
    for _ in range(80):
        drv.tick()
        for rt in rts:
            rt.process()
    assert ft.is_stop_complete(), (ft.stats, ft._pending_ctrl)
    assert all(p.state is AssocState.DISSOCIATED for p in pts), \
        [(p.state, p.stats) for p in pts]
    for p in pts:
        p.work_stop()
        assert p.is_stop_complete()
