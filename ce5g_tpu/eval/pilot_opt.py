"""Pilot-density optimization sweep.

Parity surface: reference run_phase8_pilot_optimization.py:40-303 —
generate fresh frames at density × SNR grid points, compare estimator NMSE,
report the best density per quality target. TPU-first: the whole
(density × SNR × frames) grid is one batched jit call per cell, thousands
of frames per second instead of the reference's seconds per frame.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..estimators.api import estimate_batch
from ..physics.profiles import PROFILE_INDEX
from ..physics.simulate import FrameParams, simulate_batch, table_for
from ..utils.metrics import ber_approximation


class PilotOptimizer:
    def __init__(self, cfg: ExperimentConfig, results_dir: Optional[str] = None):
        self.cfg = cfg
        self.table = table_for(cfg)
        self.results_dir = Path(results_dir or cfg.results_dir)
        self.results_dir.mkdir(parents=True, exist_ok=True)

        def cell(keys, density, snr_db, profile_idx, doppler, estimator):
            b = keys.shape[0]
            params = FrameParams(
                jnp.full((b,), profile_idx, jnp.int32),
                jnp.full((b,), doppler, jnp.float32),
                jnp.full((b,), snr_db, jnp.float32),
                jnp.full((b,), density, jnp.float32),
            )
            frames = simulate_batch(keys, params, cfg=cfg, table=self.table)
            h = estimate_batch(frames, cfg=cfg, estimator=estimator, table=self.table)
            err = jnp.mean(jnp.abs(frames.channel - h) ** 2)
            pwr = jnp.mean(jnp.abs(frames.channel) ** 2)
            return err / (pwr + 1e-12)

        self._cell = jax.jit(cell, static_argnames=("estimator",))

    def sweep(
        self,
        densities: Sequence[float] = (0.05, 0.08, 0.10, 0.12, 0.15),
        snrs_db: Sequence[float] = (5.0, 10.0, 15.0, 20.0),
        estimators: Sequence[str] = ("ls", "mmse", "mmse_full"),
        channel_type: str = "EVA",
        doppler_hz: float = 50.0,
        frames_per_cell: int = 64,
        seed: int = 0,
    ) -> Dict:
        """Returns {estimator: {density: {snr: nmse_db}}} + recommendation."""
        results: Dict[str, Dict] = {e: {} for e in estimators}
        profile_idx = PROFILE_INDEX[channel_type]
        i = 0
        for est in estimators:
            for d in densities:
                row = {}
                for s in snrs_db:
                    keys = jax.random.split(jax.random.key(seed + i), frames_per_cell)
                    i += 1
                    nmse = float(self._cell(keys, d, s, profile_idx, doppler_hz, est))
                    row[str(s)] = float(10 * np.log10(nmse + 1e-12))
                results[est][str(d)] = row

        # Recommendation: smallest density whose avg NMSE is within 1 dB of
        # the best density's avg (pilot overhead vs quality tradeoff).
        rec = {}
        for est in estimators:
            avg = {
                d: float(np.mean(list(row.values()))) for d, row in results[est].items()
            }
            best = min(avg.values())
            ok = [float(d) for d, v in avg.items() if v <= best + 1.0]
            rec[est] = {"best_density": min(ok), "avg_nmse_db": avg}
        return {
            "results": results,
            "recommendation": rec,
            "config": {
                "densities": list(densities),
                "snrs_db": list(snrs_db),
                "channel_type": channel_type,
                "doppler_hz": doppler_hz,
                "frames_per_cell": frames_per_cell,
            },
        }

    def save(self, sweep_result: Dict, name: str = "pilot_optimization_results.json"):
        p = self.results_dir / name
        p.write_text(json.dumps(sweep_result, indent=2))
        return p
