"""Scenario config system + dectnrp CLI (reference apps/dectnrp +
configurations/): JSON parsing with range validation, firmware registry
dispatch, full-stack construction, and a short basic_simulator run.
"""
import json

import pytest

from dectnrp_tpu.config import (RadioConfig, Scenario, UpperConfig,
                                build_scenario, load_scenario)
from dectnrp_tpu.upper import FIRMWARES

CONF = "configurations"


def test_registry_names():
    # reference upper.cpp:80-118 firmware names (loopback family batched)
    for name in ("basic", "rtt", "txrxdelay", "txrxagc", "chscanner",
                 "p2p_ft", "p2p_pt", "loopback_snr"):
        assert name in FIRMWARES


def test_parse_validation():
    with pytest.raises(ValueError, match="n_ant"):
        RadioConfig.parse({"hws": [{"n_ant": 3}]})
    with pytest.raises(ValueError, match="unknown firmware"):
        UpperConfig.parse({"tpoints": [{"firmware": "nope"}]})
    with pytest.raises(ValueError, match="firmware name"):
        UpperConfig.parse({"tpoints": [{}]})


def test_load_all_scenarios():
    for name in ("basic_simulator", "loopback_simulator", "p2p_simulator",
                 "rtt_simulator"):
        sc = load_scenario(f"{CONF}/{name}")
        assert sc.name == name
        assert len(sc.radio.hws) >= 1


def test_basic_simulator_runs():
    sc = load_scenario(f"{CONF}/basic_simulator")
    run = build_scenario(sc)
    run.run_ticks(8)
    assert run.runtimes[0].stats.chunks >= 1
    assert run.hws[0].rx_time_passed == 8 * sc.radio.spp_len


def test_cli_main(capsys):
    from dectnrp_tpu.apps.dectnrp_main import main
    rc = main([f"{CONF}/basic_simulator", "--ticks", "4"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["node"] == 0 and "runtime" in rec


@pytest.mark.slow
def test_p2p_simulator_scenario():
    """The p2p_simulator configuration end to end through the config
    system (reference configurations/p2p_simulator)."""
    from dectnrp_tpu.upper.p2p import AssocState
    sc = load_scenario(f"{CONF}/p2p_simulator")
    run = build_scenario(sc)
    run.run_ticks(120)
    ft, pt = run.firmwares
    assert pt.stats["beacons"] >= 2
    assert pt.state is AssocState.ASSOCIATED


def test_socket_radio_scenario_builds_and_runs():
    """The socket_radio scenario (hw type iq_socket, reference radio.json
    device-class selection analog) builds a full-duplex network radio stack
    with no lock-step driver; TX egress loops back into RX ingress on the
    same UDP port and the runtime consumes the self-paced stream."""
    import time

    import pytest

    from dectnrp_tpu.common.native import native_available
    if not native_available():
        pytest.skip("native runtime unavailable")

    import os
    root = os.path.join(os.path.dirname(__file__), "..")
    sc = load_scenario(os.path.join(root, "configurations", "socket_radio"))
    run = build_scenario(sc)
    try:
        assert run.driver is None
        assert run.hws[0].txc is not None
        deadline = time.time() + 10.0
        while time.time() < deadline and run.hws[0].rx_time_passed < 40000:
            run.tick()
            time.sleep(0.01)
        # the paced TX consumer emits zeros -> they arrive on the RX ring
        assert run.hws[0].rx_time_passed >= 40000
        assert run.runtimes[0].stats.chunks > 0
    finally:
        run.close()
