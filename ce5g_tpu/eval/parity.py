"""Phase-2 classical-estimator parity: reproduce the reference's measured
tables and compare within stated bounds.

Parity surface:
  * reference test_phase2_comparison.py:27-143 — LS(cubic) vs MMSE(diag,
    linear interp) at SNR {5,10,15,20,25}, EVA, 10% pilots, Doppler 50 Hz;
    published averages LS 0.18 dB / MMSE −0.98 dB
    (test_phase2_report.py:33-34, PHASE_2_BASELINE_ESTIMATORS.md:266-268);
  * reference test_phase2_interpolation.py:60-150 — 12 cells per method
    (5 SNRs @ EVA/10%, 4 densities @ 15 dB/EVA, 3 channels @ 15 dB/10%);
    published averages nearest −0.93 / linear 0.84 / cubic 1.22 dB
    (test_phase2_report.py:39-43);
  * NMSE is computed on the (rx0, tx0) antenna pair exactly like the
    reference (H_true[:, 0, 0, :] slices, test_phase2_comparison.py:59).

The reference numbers are SINGLE-FRAME draws per cell; per-frame NMSE in
dB has O(1 dB) sampling spread, so this module averages ``frames`` i.i.d.
frames per cell and the comparison bound must absorb the reference's own
sampling noise (±1.5 dB on 5-12-cell averages is the documented bound in
tests/test_phase2_parity.py).

Also provides :func:`griddata_cross_check` — the TPU interpolators
('linear' windowed IDW, 'cubic' Gaussian smoother) are *redesigned*
algorithms; this measures their NMSE delta against scipy.griddata on the
same pilot values (statistical parity, SURVEY §7).
"""
from __future__ import annotations

import functools
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..estimators.api import estimate_batch
from ..physics.profiles import PROFILE_INDEX
from ..physics.simulate import FrameParams, simulate_batch, table_for

#: reference-published averages (PHASE_2_BASELINE_ESTIMATORS.md:255-275)
REFERENCE_PHASE2 = {
    "ls_cubic_avg_db": 0.18,
    "mmse_avg_db": -0.98,
    "interp_avg_db": {"nearest": -0.93, "linear": 0.84, "cubic": 1.22},
    "low_snr": {"ls_db": 2.04, "mmse_db": -1.25},
}

COMPARISON_SNRS = (5.0, 10.0, 15.0, 20.0, 25.0)
INTERP_DENSITIES = (0.05, 0.10, 0.15, 0.20)
INTERP_CHANNELS = ("EPA", "EVA", "ETU")


def _cell_params(profile: str, snr_db, doppler, density, frames: int):
    full = lambda v, dt: jnp.full((frames,), v, dt)  # noqa: E731
    return FrameParams(
        profile_idx=full(PROFILE_INDEX[profile], jnp.int32),
        doppler_hz=full(doppler, jnp.float32),
        snr_db=full(snr_db, jnp.float32),
        pilot_density=full(density, jnp.float32),
    )


def _nmse00_db(h_true, h_est) -> float:
    """NMSE over the (rx0, tx0) pair, in dB, averaged over frames in the
    dB domain. The reference's published averages are means of per-cell
    single-frame dB values (test_phase2_report.py:33-43); averaging dB
    (geometric mean in linear) matches that semantics and is robust to
    the heavy upper tail deep-faded channel draws put on linear NMSE."""
    # complex leaves go through the planar-transfer shim (the axon runtime
    # has no complex64 device→host path) and widen on host
    from ..utils.host import get_numpy

    t = get_numpy(h_true)[:, :, 0, 0, :].astype(np.complex128)
    e = get_numpy(h_est)[:, :, 0, 0, :].astype(np.complex128)
    err = np.mean(np.abs(t - e) ** 2, axis=(1, 2))
    pwr = np.mean(np.abs(t) ** 2, axis=(1, 2))
    return float(np.mean(10 * np.log10(err / (pwr + 1e-12) + 1e-12)))


class Phase2Parity:
    """Batched reproduction of the reference's phase-2 estimator study."""

    def __init__(self, cfg: Optional[ExperimentConfig] = None, frames: int = 64):
        import dataclasses

        cfg = cfg or ExperimentConfig()
        if cfg.pilots.max_density < 0.25:
            # the reference's 20%-density cell needs pilot-slot capacity
            # beyond the training default (0.15); capacity only adds
            # padding slots, it never changes estimates
            cfg = dataclasses.replace(
                cfg, pilots=dataclasses.replace(cfg.pilots, max_density=0.25)
            )
        self.cfg = cfg
        self.frames = frames
        self.table = table_for(self.cfg)
        self._sim = jax.jit(
            lambda keys, params: simulate_batch(
                keys, params, cfg=self.cfg, table=self.table
            )
        )
        self._est = {}

    def _estimator(self, est: str, method: str):
        if (est, method) not in self._est:
            self._est[(est, method)] = jax.jit(
                functools.partial(
                    estimate_batch,
                    cfg=self.cfg,
                    estimator=est,
                    method=method,
                    table=self.table,
                )
            )
        return self._est[(est, method)]

    def cell(
        self, key, profile: str, snr_db, doppler, density,
        pairs: Iterable[Tuple[str, str]],
    ) -> Dict[str, float]:
        """One (channel, snr, doppler, density) cell: mean NMSE-dB per
        (estimator, method) pair over ``frames`` i.i.d. frames."""
        keys = jax.random.split(key, self.frames)
        params = _cell_params(profile, snr_db, doppler, density, self.frames)
        batch = self._sim(keys, params)
        return {
            f"{est}:{method}": _nmse00_db(
                batch.channel, self._estimator(est, method)(batch)
            )
            for est, method in pairs
        }

    def comparison_table(self, seed: int = 0) -> Dict:
        """LS(cubic) vs diag-MMSE(linear) vs mmse_full at the 5 reference
        SNRs (test_phase2_comparison.py)."""
        pairs = (("ls", "cubic"), ("mmse", "linear"), ("mmse_full", "linear"))
        key = jax.random.key(seed)
        rows = {}
        for i, snr in enumerate(COMPARISON_SNRS):
            rows[str(snr)] = self.cell(
                jax.random.fold_in(key, i), "EVA", snr, 50.0, 0.10, pairs
            )
        avg = {
            name: float(np.mean([rows[s][name] for s in rows]))
            for name in rows[str(COMPARISON_SNRS[0])]
        }
        return {
            "per_snr": rows,
            "avg_db": avg,
            "reference_avg_db": {
                "ls:cubic": REFERENCE_PHASE2["ls_cubic_avg_db"],
                "mmse:linear": REFERENCE_PHASE2["mmse_avg_db"],
            },
        }

    def interpolation_table(self, seed: int = 1) -> Dict:
        """The reference's 12-cell interpolation study per method
        (test_phase2_interpolation.py:60-150: 5 SNRs + 4 densities +
        3 channel types)."""
        methods = ("nearest", "linear", "cubic")
        pairs = tuple(("ls", m) for m in methods)
        key = jax.random.key(seed)
        cells = []
        for snr in COMPARISON_SNRS:
            cells.append(("EVA", snr, 0.10))
        for density in INTERP_DENSITIES:
            cells.append(("EVA", 15.0, density))
        for profile in INTERP_CHANNELS:
            cells.append((profile, 15.0, 0.10))
        rows = []
        for i, (profile, snr, density) in enumerate(cells):
            r = self.cell(
                jax.random.fold_in(key, i), profile, snr, 50.0, density, pairs
            )
            rows.append({"profile": profile, "snr_db": snr, "density": density, **r})
        avg = {
            m: float(np.mean([r[f"ls:{m}"] for r in rows])) for m in methods
        }
        wins = {m: 0 for m in methods}
        for r in rows:
            wins[min(methods, key=lambda m: r[f"ls:{m}"])] += 1
        return {
            "cells": rows,
            "avg_db": avg,
            "wins": wins,
            "reference_avg_db": REFERENCE_PHASE2["interp_avg_db"],
        }


def griddata_cross_check(
    cfg: Optional[ExperimentConfig] = None,
    frames: int = 8,
    snr_db: float = 15.0,
    seed: int = 2,
) -> Dict:
    """NMSE delta between the TPU interpolators and scipy.griddata on the
    SAME simulated frames (reference LSEstimator.interpolate_channel,
    baseline_estimators.py:44-88: griddata with fill_value=0 for
    linear/cubic, plain nearest for 'nearest')."""
    from scipy.interpolate import griddata

    cfg = cfg or ExperimentConfig()
    table = table_for(cfg)
    keys = jax.random.split(jax.random.key(seed), frames)
    params = _cell_params("EVA", snr_db, 50.0, 0.10, frames)
    batch = jax.jit(
        lambda k, p: simulate_batch(k, p, cfg=cfg, table=table)
    )(keys, params)

    s = cfg.ofdm.num_symbols
    k = cfg.ofdm.num_used_subcarriers
    from ..utils.host import get_numpy

    grid_pts = np.stack(np.meshgrid(np.arange(s), np.arange(k), indexing="ij"), -1)
    h_true = get_numpy(batch.channel)[:, :, 0, 0, :]
    rx = get_numpy(batch.rx_symbols)[:, :, 0, :]
    tx = get_numpy(batch.tx_symbols)[:, :, 0, :]
    masks = np.asarray(batch.pilot_mask) > 0

    out: Dict[str, Dict] = {}
    for method in ("nearest", "linear", "cubic"):
        ours_db = _nmse00_db(
            batch.channel,
            jax.jit(
                functools.partial(
                    estimate_batch, cfg=cfg, estimator="ls",
                    method=method, table=table,
                )
            )(batch),
        )
        nmses = []
        for f in range(frames):
            pts = np.argwhere(masks[f])
            vals = (rx[f] / (tx[f] + 1e-12))[masks[f]]
            kw = {} if method == "nearest" else {"fill_value": 0.0}
            h = griddata(pts, vals.real, grid_pts.reshape(-1, 2), method=method, **kw) \
                + 1j * griddata(pts, vals.imag, grid_pts.reshape(-1, 2), method=method, **kw)
            h = h.reshape(s, k)
            err = np.mean(np.abs(h_true[f] - h) ** 2)
            pwr = np.mean(np.abs(h_true[f]) ** 2)
            nmses.append(10 * np.log10(err / (pwr + 1e-12) + 1e-12))
        scipy_db = float(np.mean(nmses))  # mean-of-dB, same as _nmse00_db
        out[method] = {
            "ours_db": ours_db,
            "scipy_db": scipy_db,
            "delta_db": ours_db - scipy_db,
        }
    return out
