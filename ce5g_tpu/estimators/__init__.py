from .equalize import equalize_channel
from .interpolate import interpolate, normalized_conv_interpolate
from .ls import ls_at_pilots, ls_estimate
from .mmse import (
    estimate_covariance,
    WienerPrior,
    bessel_j0,
    build_wiener_prior,
    mmse_diag_at_pilots,
    mmse_diag_estimate,
    mmse_full_estimate,
)
from .api import estimate_frame, estimate_batch

__all__ = [
    "equalize_channel",
    "interpolate",
    "normalized_conv_interpolate",
    "ls_at_pilots",
    "ls_estimate",
    "WienerPrior",
    "bessel_j0",
    "build_wiener_prior",
    "estimate_covariance",
    "mmse_diag_at_pilots",
    "mmse_diag_estimate",
    "mmse_full_estimate",
    "estimate_frame",
    "estimate_batch",
]
