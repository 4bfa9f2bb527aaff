"""Part 4 codec round trips: PLCF, feedback, common headers, MMIEs, MAC PDU.

Oracle model: reference pack/unpack symmetry (every MMIE's testing_set_random
round trip, mmie_pool_tx test pattern) -- randomized field values must survive
pack -> unpack bit-exactly, and invalid inputs must be rejected.
"""
import numpy as np
import pytest

from dectnrp_tpu.sections.part2 import (get_center_frequency,
                                        is_absolute_channel_number_in_range)
from dectnrp_tpu.sections.part4.association import (
    AssociationReleaseMessage, AssociationRequestMessage,
    AssociationResponseMessage, FtConfiguration, HarqConfig,
    NOF_FLOWS_AS_INCLUDED)
from dectnrp_tpu.sections.part4.feedback_info import (FeedbackF1, FeedbackF4,
                                                      TxFeedback)
from dectnrp_tpu.sections.part4.ies import (Allocation, BroadcastIndicationIE,
                                            MacSecurityInfoIE, PaddingIE,
                                            RandomAccessResourceIE,
                                            RdCapabilityIE, RepeatInfo,
                                            ResourceAllocationIE, RouteInfoIE,
                                            UserPlaneData, REPEAT_FRAMES)
from dectnrp_tpu.sections.part4.ies2 import (GroupAssignmentIE, LoadInfoIE,
                                             MeasurementReportIE,
                                             NeighbouringIE, PowerTargetIE,
                                             TimeAnnounceIE)
from dectnrp_tpu.sections.part4.mac_pdu import (BeaconHeader, DataMacPduHeader,
                                                MacHeaderKind, MacHeaderType,
                                                UnicastHeader)
from dectnrp_tpu.sections.part4.mac_pdu_decoder import (MacPduDecoder,
                                                        build_mac_pdu,
                                                        decode_mac_pdu)
from dectnrp_tpu.sections.part4.mmie import (ClusterBeaconMessage,
                                             NetworkBeaconMessage)
from dectnrp_tpu.sections.part4.plcf import Plcf10, Plcf20, Plcf21, decode_plcf


def roundtrip(m, n_extra=0, **unpack_kw):
    buf = bytearray(m.packed_size() + n_extra)
    end = m.pack_into(buf, 0)
    assert end == m.packed_size()
    m2 = type(m)()
    if hasattr(m2, "mu"):
        m2.mu = getattr(m, "mu", 1)
    ok = m2.unpack_from(buf, 0, **unpack_kw)
    assert ok, f"{type(m).__name__} unpack failed"
    assert m2 == m, f"{type(m).__name__} mismatch:\n{m}\n{m2}"
    if hasattr(m, "peek_packed_size"):
        assert m.peek_packed_size(buf, 0) == m.packed_size()


# ---- part 2 sanity ---------------------------------------------------------

def test_part2_channels():
    cf = get_center_frequency(1, 1657)
    assert cf.FC_hz == 450_144_000 + 1657 * 864_000
    assert is_absolute_channel_number_in_range(1660)
    assert not is_absolute_channel_number_in_range(6000)


# ---- PLCF ------------------------------------------------------------------

def test_plcf10_roundtrip():
    p = Plcf10(packet_length_type=1, packet_length=4, short_network_id=0x34,
               transmitter_identity=0x1234, transmit_power=7, df_mcs=3)
    data = p.pack()
    assert len(data) == 5
    q = Plcf10()
    assert q.unpack(data)
    assert q == p


def test_plcf20_roundtrip_with_feedback():
    p = Plcf20(packet_length=2, short_network_id=0x34,
               transmitter_identity=0x1234, transmit_power=5, df_mcs=4,
               receiver_identity=0x4321, n_ss_coded=1,
               df_redundancy_version=2, df_new_data_indication=1,
               df_harq_process_number=3, feedback_format=1,
               feedback=FeedbackF1(2, TxFeedback.ACK, 100, 5))
    data = p.pack()
    assert len(data) == 10
    q = Plcf20()
    assert q.unpack(data)
    assert q.df_mcs == 4 and q.n_ss == 2
    assert isinstance(q.feedback, FeedbackF1)
    assert q.feedback.mcs == 5 and q.feedback.transmission_feedback == TxFeedback.ACK


def test_plcf21_roundtrip():
    p = Plcf21(packet_length=3, short_network_id=1, transmitter_identity=2,
               transmit_power=1, df_mcs=2, receiver_identity=3, n_ss_coded=0,
               feedback_format=4, feedback=FeedbackF4(0xA5, 7))
    data = p.pack()
    q = Plcf21()
    assert q.unpack(data)
    assert q.feedback.harq_feedback_bitmap == 0xA5


def test_plcf_blind_dispatch():
    p1 = Plcf10(short_network_id=1, transmitter_identity=5, df_mcs=1)
    bits = np.unpackbits(np.frombuffer(p1.pack(), np.uint8))
    c = decode_plcf(1, bits)
    assert isinstance(c, Plcf10) and c.transmitter_identity == 5
    p2 = Plcf21(short_network_id=1, transmitter_identity=5,
                receiver_identity=6, df_mcs=2)
    bits2 = np.unpackbits(np.frombuffer(p2.pack(), np.uint8))
    c2 = decode_plcf(2, bits2)
    assert isinstance(c2, Plcf21) and c2.receiver_identity == 6


def test_plcf_invalid_rejected():
    assert not Plcf10().unpack(bytes(5))          # reserved network id 0
    p = Plcf10(short_network_id=1, transmitter_identity=1)
    bad = bytearray(p.pack())
    bad[0] |= 0b11 << 6                            # header format > 1
    assert not Plcf10().unpack(bytes(bad))


# ---- common headers --------------------------------------------------------

def test_common_headers_roundtrip():
    for h in (DataMacPduHeader(reset=1, sequence_number=0xABC),
              BeaconHeader(network_id_3_lsb=0x123456, transmitter_address=77),
              UnicastHeader(reset=0, sequence_number=99, receiver_address=5,
                            transmitter_address=6)):
        buf = bytearray(h.SIZE)
        h.pack_into(buf, 0)
        h2 = type(h)()
        assert h2.unpack_from(buf, 0)
        assert h2 == h


# ---- MMIEs -----------------------------------------------------------------

def test_network_beacon_roundtrip():
    roundtrip(NetworkBeaconMessage(
        network_beacon_period_coded=2, cluster_beacon_period_coded=4,
        next_cluster_channel=1660, time_to_next=123456,
        clusters_max_tx_power_coded=9, current_cluster_channel=1661,
        network_beacon_channels=(1662, 1663)))
    roundtrip(NetworkBeaconMessage(
        network_beacon_period_coded=0, cluster_beacon_period_coded=0,
        next_cluster_channel=1657, time_to_next=1))


def test_cluster_beacon_roundtrip():
    for mu in (1, 8):
        m = ClusterBeaconMessage(
            system_frame_number=200, network_beacon_period_coded=1,
            cluster_beacon_period_coded=2, count_to_trigger_coded=3,
            rel_quality_coded=1, min_quality_coded=2,
            clusters_max_tx_power_coded=5, frame_offset=77,
            next_cluster_channel=1657, time_to_next=999, mu=mu)
        roundtrip(m)


def test_association_messages_roundtrip():
    roundtrip(AssociationRequestMessage(
        setup_cause=1, flow_ids=(3, 4), harq_tx=HarqConfig(4, 10),
        harq_rx=HarqConfig(2, 5),
        ft_configuration=FtConfiguration(1, 2, 1660, 5000),
        current_cluster_channel=1658))
    roundtrip(AssociationResponseMessage(
        harq_configuration=(HarqConfig(1, 2), HarqConfig(3, 4)),
        nof_flows_accepted=NOF_FLOWS_AS_INCLUDED, flow_ids=(3,),
        group_info=(5, 9), tx_power=True))
    rej = AssociationResponseMessage(reject_cause=2, reject_time_coded=3)
    roundtrip(rej)
    roundtrip(AssociationReleaseMessage(release_cause=4))


def test_resource_allocation_roundtrip():
    for mu in (1, 8):
        roundtrip(ResourceAllocationIE(
            allocation_dl=Allocation(10, 0, 4), allocation_ul=Allocation(20, 1, 2),
            short_rd_id=0x55AA, repeat_info=RepeatInfo(REPEAT_FRAMES, True, 2, 16),
            sfn_offset=3, channel=1660, dect_scheduled_resource_failure_coded=4,
            mu=mu))
    roundtrip(ResourceAllocationIE())                 # release-all = 1 byte


def test_random_access_resource_roundtrip():
    for mu in (1, 8):
        roundtrip(RandomAccessResourceIE(
            allocation=Allocation(5, 0, 3), max_rach_length=4, cw_min_coded=2,
            response_window_length=6, cw_max_coded=3,
            repeat_info=RepeatInfo(REPEAT_FRAMES, False, 1, 8),
            sfn_offset=7, channel=1657, channel_2=1659, mu=mu))


def test_misc_ies_roundtrip():
    roundtrip(RdCapabilityIE())
    roundtrip(RouteInfoIE(sink_address=0xDEADBEEF, route_cost=3,
                          application_sequence_number=9))
    roundtrip(MacSecurityInfoIE(key_index=2, security_iv_type=1, hpc=12345))
    roundtrip(BroadcastIndicationIE(indication_type=1, id_type=0, rd_id=55,
                                    ack_nack=1, feedback=1, mcs_feedback=5))
    roundtrip(LoadInfoIE(max_assoc_16bit=True, traffic_load_percentage=50,
                         max_nof_associated_rd=300, rd_ft_load_percentage=20,
                         rd_pt_load_percentage=30, rach_load_percentage=10,
                         channel_load=(60, 40)))
    roundtrip(MeasurementReportIE(rach=1, snr=100, rssi_2=50, tx_count=3))
    roundtrip(NeighbouringIE(short_rd_id=9, network_beacon_period_coded=1,
                             cluster_beacon_period_coded=2,
                             radio_device_class=(2, 3), snr=80, rssi_2=70,
                             next_cluster_channel=1660, time_to_next=1000))
    roundtrip(PowerTargetIE(power_target_dbm_coded=50))
    roundtrip(TimeAnnounceIE(time_type=1, n_frames_until_full_sec=10,
                             full_sec=1_700_000_000, tai_minus_utc_seconds=37))
    g = GroupAssignmentIE(single=False, group_id=7, assignments=((0, 1), (1, 2)))
    buf = bytearray(g.packed_size())
    g.pack_into(buf, 0)
    g2 = GroupAssignmentIE()
    assert g2.unpack_from(buf, 0, length=g.packed_size())
    assert g2 == g


# ---- full MAC PDU ----------------------------------------------------------

def test_mac_pdu_build_and_decode():
    mht = MacHeaderType(mac_header_type=MacHeaderKind.BEACON)
    ch = BeaconHeader(network_id_3_lsb=0x345678, transmitter_address=42)
    mmies = [
        NetworkBeaconMessage(network_beacon_period_coded=1,
                             cluster_beacon_period_coded=3,
                             next_cluster_channel=1660, time_to_next=777),
        RandomAccessResourceIE(allocation=Allocation(4, 0, 2),
                               max_rach_length=2, cw_min_coded=1,
                               response_window_length=3, cw_max_coded=2),
        UserPlaneData(1, b"hello dect"),
    ]
    pdu = build_mac_pdu(mht, ch, mmies, tb_size_bytes=64)
    assert len(pdu) == 64
    dec = decode_mac_pdu(pdu)
    assert dec.finished and not dec.aborted
    assert dec.header_type.mac_header_type == MacHeaderKind.BEACON
    assert dec.common_header.transmitter_address == 42
    kinds = [type(m).__name__ for m in dec.mmies]
    assert kinds == ["NetworkBeaconMessage", "RandomAccessResourceIE",
                     "UserPlaneData"]
    assert dec.mmies[2].data == b"hello dect"


def test_mac_pdu_incremental_feed():
    mht = MacHeaderType(mac_header_type=MacHeaderKind.UNICAST)
    ch = UnicastHeader(sequence_number=5, receiver_address=1,
                       transmitter_address=2)
    mmies = [UserPlaneData(2, bytes(range(100)))]
    pdu = build_mac_pdu(mht, ch, mmies, tb_size_bytes=150)
    dec = MacPduDecoder(len(pdu))
    # feed in uneven chunks like codeblock-by-codeblock FEC delivery
    for w in (1, 3, 12, 60, 120, len(pdu)):
        dec.feed(pdu, w)
    assert dec.finished and not dec.aborted
    assert dec.mmies[0].data == bytes(range(100))


def test_mac_pdu_malformed_aborts():
    dec = decode_mac_pdu(bytes([0xFF] * 10))
    assert dec.aborted


def test_reconfiguration_messages_roundtrip():
    """6.4.2.7/6.4.2.8; reference reconfiguration_{request,response}_message.cpp."""
    from dectnrp_tpu.sections.part4.association import (
        FlowChange, HarqConfig, ReconfigurationRequestMessage,
        ReconfigurationResponseMessage)
    from dectnrp_tpu.sections.part4.mac_pdu import UnicastHeader
    from dectnrp_tpu.sections.part4.mmie import MmiePoolTx

    pool = MmiePoolTx()
    req = pool.get(ReconfigurationRequestMessage)
    req.harq_tx = HarqConfig(5, 3)
    req.flows = (FlowChange(2, False), FlowChange(4, True))
    req.radio_resource_change = 2
    rsp = pool.get(ReconfigurationResponseMessage)
    rsp.harq_tx = HarqConfig(5, 3)
    rsp.harq_rx = HarqConfig(2, 1)
    rsp.accept_all_flows = False
    rsp.flows = (FlowChange(2, False),)

    mht = MacHeaderType(mac_header_type=MacHeaderKind.UNICAST)
    ch = UnicastHeader(sequence_number=7, receiver_address=1,
                       transmitter_address=2)
    pdu = build_mac_pdu(mht, ch, [req, rsp], tb_size_bytes=32)
    dec = decode_mac_pdu(pdu)
    assert dec.finished and not dec.aborted
    assert [type(m).__name__ for m in dec.mmies] == [
        "ReconfigurationRequestMessage", "ReconfigurationResponseMessage"]
    assert dec.mmies[0] == req
    assert dec.mmies[1] == rsp
    # reserved flow-count field is rejected at peek (reference peek_errc)
    m = ReconfigurationRequestMessage()
    assert m.peek_packed_size(bytes([0b00011100]), 0) is None


def test_mmie_pool_tx_reuse_and_padding():
    from dectnrp_tpu.sections.part4.mmie import MmiePoolTx, NetworkBeaconMessage
    pool = MmiePoolTx()
    a = pool.get(NetworkBeaconMessage)
    a.time_to_next = 123
    b = pool.get(NetworkBeaconMessage)      # reset on fetch
    assert a is b and b.time_to_next != 123
    pool.set_nof_elements(NetworkBeaconMessage, 3)
    assert pool.get_nof_elements(NetworkBeaconMessage) == 3
    assert pool.get(NetworkBeaconMessage, 2) is not a
    buf = bytearray(16)
    end = MmiePoolTx.fill_with_padding_ies(buf, 4, 12)
    assert end == 16
