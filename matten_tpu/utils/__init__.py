"""Utilities: anomaly detection, timing/profiling, logging."""

from matten_tpu.utils.anomaly import check_finite, DetectAnomaly
from matten_tpu.utils.timing import TimeMeter, profile_trace
from matten_tpu.utils.logging import set_logger

__all__ = [
    "check_finite",
    "DetectAnomaly",
    "TimeMeter",
    "profile_trace",
    "set_logger",
]
