"""Loopback experiment family: PER curve sanity, ratio clipping, MMIE RT.

Oracle: reference tfw_loopback_snr PER behavior -- PER ~1 at very low SNR,
~0 at high SNR, monotone-ish in between; tfw_loopback_mmie codec round trip.
"""
import numpy as np
import pytest

from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef
from dectnrp_tpu.sections.part4.identity import Identity
from dectnrp_tpu.sections.part4.ies import RouteInfoIE
from dectnrp_tpu.sections.part4.ies2 import MeasurementReportIE, PowerTargetIE
from dectnrp_tpu.upper.loopback import (LoopbackRatioExperiment,
                                        LoopbackSnrExperiment, _run_point,
                                        loopback_mmie_roundtrip)

IDENT = Identity(0x12345678, 0x2222, 0x3333)


def test_snr_point_extremes():
    psdef = PacketSizesDef(1, 1, 0, 2, 0, 2, 6144)
    lo = _run_point(psdef, IDENT, -10.0, 20, seed=1, use_sync=True)
    hi = _run_point(psdef, IDENT, 25.0, 20, seed=1, use_sync=True)
    assert lo.per_pdc > 0.8, lo
    assert hi.per_pdc == 0.0, hi
    assert hi.per_pcc == 0.0 and hi.per_pcc_and_plcf == 0.0
    # measured SNR should be in the ballpark of the true SNR
    assert 18.0 < hi.snr_min < 32.0, hi


def test_snr_experiment_small_sweep():
    exp = LoopbackSnrExperiment(identity=IDENT, mcs_list=(2,),
                                snr_db=(-5.0, 5.0, 15.0), n_per_snr=20,
                                use_sync=False)
    res = exp.run()
    per = res[2]["result"]["PER_pdc_crc"]
    assert per[0] > per[2]
    assert per[2] < 0.1
    assert res[2]["result"]["PER_pcc_crc"][2] <= per[0]


def test_snr_experiment_json(tmp_path):
    exp = LoopbackSnrExperiment(identity=IDENT, mcs_list=(1,),
                                snr_db=(10.0,), n_per_snr=8, use_sync=False)
    paths = exp.save_json(str(tmp_path))
    assert len(paths) == 1
    import json
    rec = json.load(open(paths[0]))
    assert "PER_pdc_crc" in rec["result"]


def test_ratio_experiment_clipping_hurts():
    exp = LoopbackRatioExperiment(identity=IDENT, ratios=(0.5, 16.0),
                                  n_per_ratio=10, quantize_bits=12,
                                  snr_db=30.0)
    pts = exp.run()
    # moderate backoff decodes fine; massive overdrive clips -> errors
    assert pts[0.5].per_pdc == 0.0
    assert pts[16.0].per_pdc > pts[0.5].per_pdc


def test_mmie_over_the_air():
    sent = [RouteInfoIE(sink_address=0xAABBCCDD, route_cost=2,
                        application_sequence_number=7),
            MeasurementReportIE(rach=1, snr=120),
            PowerTargetIE(power_target_dbm_coded=55)]
    got = loopback_mmie_roundtrip(sent, IDENT, snr_db=25.0)
    assert [type(m).__name__ for m in got] == [type(m).__name__ for m in sent]
    assert got[0] == sent[0] and got[1] == sent[1] and got[2] == sent[2]
