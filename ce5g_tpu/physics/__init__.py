from .profiles import (
    MAX_PATHS,
    PROFILE_INDEX,
    PROFILE_NAMES,
    ProfileTable,
    build_profile_table,
    used_subcarrier_bins,
)
from .jakes import dense_fading, jakes_gains_at_times, path_gains_symbol_sampled
from .ofdm import demodulate, modulate
from .pilots import PilotPattern, extract_pilots, insert_pilots, make_pattern
from .mimo import apply_channel, frequency_response, time_domain_apply
from .simulate import (
    Frame,
    FrameParams,
    simulate_batch,
    simulate_frame,
    simulate_frame_time_domain,
    table_for,
)

__all__ = [
    "MAX_PATHS",
    "PROFILE_INDEX",
    "PROFILE_NAMES",
    "ProfileTable",
    "build_profile_table",
    "used_subcarrier_bins",
    "dense_fading",
    "jakes_gains_at_times",
    "path_gains_symbol_sampled",
    "demodulate",
    "modulate",
    "PilotPattern",
    "extract_pilots",
    "insert_pilots",
    "make_pattern",
    "apply_channel",
    "frequency_response",
    "time_domain_apply",
    "Frame",
    "FrameParams",
    "simulate_batch",
    "simulate_frame",
    "simulate_frame_time_domain",
    "table_for",
]
