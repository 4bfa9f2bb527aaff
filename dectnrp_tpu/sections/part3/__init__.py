"""ETSI TS 103 636-3 (DECT NR+ PHY) numerology, signals and derivations."""
from . import (  # noqa: F401
    beamforming,
    cbsegm,
    constants,
    drs,
    mcs,
    numerologies,
    packet_sizes,
    pcc,
    pdc,
    phyres,
    rdc,
    scrambling,
    stf,
    tbs,
    tm_mode,
    transmission_packet_structure,
    tx_div,
)
from .packet_sizes import PacketSizes, PacketSizesDef, get_packet_sizes  # noqa: F401
