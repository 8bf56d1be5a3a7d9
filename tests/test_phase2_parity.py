"""Phase-2 parity vs the reference's PUBLISHED measured table
(PHASE_2_BASELINE_ESTIMATORS.md:255-275, test_phase2_report.py:33-43).

The reference numbers are single-frame draws per cell (O(1 dB) sampling
spread); we average several frames per cell and compare within ±1.5 dB
on multi-cell averages. Slow-marked: full 14×599 numerology on CPU.
"""
import numpy as np
import pytest

from ce5g_tpu.eval.parity import (
    REFERENCE_PHASE2,
    Phase2Parity,
    griddata_cross_check,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def parity():
    return Phase2Parity(frames=16)


class TestComparisonTable:
    @pytest.fixture(scope="class")
    def comp(self, parity):
        return parity.comparison_table()

    def test_ls_cubic_average_matches_reference(self, comp):
        # reference: 0.18 dB avg over SNR 5-25 (single frame per SNR)
        assert abs(comp["avg_db"]["ls:cubic"] - 0.18) < 1.5, comp["avg_db"]

    def test_mmse_average_matches_reference(self, comp):
        # reference: −0.98 dB avg. Our diag-MMSE shares the reference's
        # algorithm (scalar Wiener at pilots → interpolate); its average
        # must land in the same band.
        assert abs(comp["avg_db"]["mmse:linear"] - (-0.98)) < 1.5, comp["avg_db"]

    def test_mmse_beats_ls_on_average(self, comp):
        # the reference's headline finding (MMSE wins at all SNRs 5-25)
        assert comp["avg_db"]["mmse:linear"] < comp["avg_db"]["ls:cubic"]

    def test_full_wiener_beats_both(self, comp):
        # our mmse_full (true per-subcarrier Wiener with correlation
        # priors) must beat the reference's diag-MMSE by ≥1 dB — the bar
        # the reference sets for its AI models (test_phase2_report.py:70-82)
        assert comp["avg_db"]["mmse_full:linear"] < comp["avg_db"]["mmse:linear"] - 1.0


class TestInterpolationTable:
    @pytest.fixture(scope="class")
    def interp(self, parity):
        return parity.interpolation_table()

    def test_nearest_matches_reference(self, interp):
        # 'nearest' is the same algorithm as the reference (exact k=1
        # windowed search) → its 12-cell average must track. The bound
        # absorbs the reference's own sampling noise: 12 single-frame dB
        # cells with ~2 dB per-cell spread put ~±0.6 dB σ on its average.
        ref = REFERENCE_PHASE2["interp_avg_db"]["nearest"]
        assert abs(interp["avg_db"]["nearest"] - ref) < 2.0, interp["avg_db"]

    def test_linear_cubic_no_worse_than_reference(self, interp):
        # ours are redesigned (windowed IDW / Gaussian smoother) with no
        # convex-hull zero-fill pathology, so they may be BETTER than
        # griddata's, but never materially worse.
        for m in ("linear", "cubic"):
            ref = REFERENCE_PHASE2["interp_avg_db"][m]
            assert interp["avg_db"][m] < ref + 1.5, (m, interp["avg_db"])


class TestGriddataCrossCheck:
    def test_deltas_within_bounds(self, parity):
        r = griddata_cross_check(parity.cfg, frames=6)
        # nearest: same algorithm, only tie-breaking differs
        assert abs(r["nearest"]["delta_db"]) < 0.3, r
        # linear: windowed IDW vs griddata linear — statistical parity
        assert abs(r["linear"]["delta_db"]) < 0.75, r
        # cubic: ours is a Gaussian smoother; allowed to be better
        # (negative delta), bounded from being worse
        assert r["cubic"]["delta_db"] < 0.5, r
