"""FEC: LTE-style turbo coding with DECT NR+ CRC/scrambling conventions."""
from . import chain, crc, qpp, rate_match, turbo_jax, turbo_np  # noqa: F401
from .chain import (  # noqa: F401
    PccPlan, PdcPlan, pcc_decode, pcc_encode, pdc_decode, pdc_encode)
