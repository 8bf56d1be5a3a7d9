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

    def model_sweep(
        self,
        model_types: Sequence[str],
        model_dir: str,
        stats: Dict[str, float],
        densities: Sequence[float] = (0.01, 0.02, 0.05, 0.08, 0.10),
        snrs_db: Sequence[float] = (5.0, 10.0, 15.0, 20.0),
        estimators: Sequence[str] = ("ls", "mmse_full"),
        channel_type: str = "EVA",
        doppler_hz: float = 50.0,
        frames_per_cell: int = 64,
        modulation: int = 4,
        seed: int = 0,
    ) -> Dict:
        """Phase-8 core comparison WITH the trained models (reference
        run_phase8_pilot_optimization.py:113-160 loads the trained CNN and
        sweeps it against LS across densities).

        Per (density, SNR) cell: simulate fresh QAM frames once, then for
        every method — classical estimators and trained models — report
          * slice-basis NMSE (the models' native basis: the (rx0, tx0)
            slice; classical estimates are sliced identically so the
            comparison is basis-consistent), and
          * measured BER on the rx-0 chain (QAM demod after per-RE scalar
            Wiener equalization against the TX-superposition channel; the
            models see only the rx-0 inputs, so the BER column uses the
            same chain for every method).

        ``stats`` are the TRAINING dataset's normalization stats — the
        models must see the feature scaling they were trained with.
        """
        import functools

        from flax import nnx

        from ..models.inputs import apply_output_residual
        from ..utils.qam import bits_per_symbol, qam_demodulate
        from .ber import simulate_qam_frame
        from .evaluate import ModelEvaluator

        cfg = self.cfg
        table = self.table
        num_tx = cfg.mimo.num_tx
        profile_idx = PROFILE_INDEX[channel_type]
        bps = bits_per_symbol(modulation)

        ev = ModelEvaluator(cfg, model_dir, results_dir=str(self.results_dir))
        models = {}
        for mt in model_types:
            try:
                models[mt], _ = ev.load_model(mt)
            except FileNotFoundError:
                continue

        @functools.partial(jax.jit, static_argnames=("estimator",))
        def sim_cell(keys, density, snr_db, estimator):
            b = keys.shape[0]
            params = FrameParams(
                jnp.full((b,), profile_idx, jnp.int32),
                jnp.full((b,), doppler_hz, jnp.float32),
                jnp.full((b,), snr_db, jnp.float32),
                jnp.full((b,), density, jnp.float32),
            )
            sim = functools.partial(
                simulate_qam_frame, cfg=cfg, table=table, modulation=modulation
            )
            frames, bits = jax.vmap(sim)(keys, params)
            h_est = estimate_batch(
                frames, cfg=cfg, estimator=estimator, table=table
            )  # (B, S, R, T, K)
            h_ls = estimate_batch(frames, cfg=cfg, estimator="ls", table=table)
            return frames, bits, h_est, h_ls

        @jax.jit
        def slice_nmse(h_slice, h_true_slice):
            err = jnp.mean(jnp.abs(h_true_slice - h_slice) ** 2, axis=(1, 2))
            pwr = jnp.mean(jnp.abs(h_true_slice) ** 2, axis=(1, 2))
            return jnp.mean(err / (pwr + 1e-12))

        @jax.jit
        def ber_rx0(h_sum0, frames, bits):
            """BER on rx chain 0 given the summed-channel estimate.
            jit is required, not just faster: several ops here (QAM
            distance argmin among them) have no eager TPU lowering
            through the tunneled runtime."""
            y0 = frames.rx_symbols[:, :, 0, :]  # (B, S, K)
            snr_lin = 10.0 ** (frames.params.snr_db / 10.0)
            sigma2 = (
                jnp.mean(jnp.abs(y0) ** 2, axis=(1, 2)) / snr_lin
            )[:, None, None]
            x_hat = jnp.conj(h_sum0) * y0 / (jnp.abs(h_sum0) ** 2 + sigma2)
            rx_bits = qam_demodulate(
                x_hat.reshape(x_hat.shape[0], -1), modulation
            )  # (B, S·K·bps)
            data_mask = 1.0 - frames.pilot_mask  # (B, S, K)
            bit_mask = jnp.repeat(
                data_mask.reshape(data_mask.shape[0], -1), bps, axis=-1
            )
            errs = jnp.sum((rx_bits != bits) * bit_mask)
            return errs / jnp.maximum(jnp.sum(bit_mask), 1.0)

        @nnx.jit
        def model_pred(model, x):
            return apply_output_residual(model(x, train=False), x)

        wiener_cache: Dict = {}

        def model_cell(mt, frames, h_ls):
            rx0 = frames.rx_symbols[:, :, 0, :]
            hls0 = h_ls[:, :, 0, 0, :]
            chans = [
                rx0.real / stats["rx_std"], rx0.imag / stats["rx_std"],
                hls0.real / stats["hls_std"], hls0.imag / stats["hls_std"],
                frames.pilot_mask,
            ]
            if "_wiener" in mt:
                hw = wiener_cache["hw"]
                chans += [hw.real / stats["h_std"], hw.imag / stats["h_std"]]
            x = jnp.stack(chans, axis=-1).astype(jnp.float32)
            pred = model_pred(models[mt], x) * stats["h_std"]
            return jax.lax.complex(pred[..., 0], pred[..., 1])  # (B, S, K)

        out: Dict[str, Dict] = {}
        i = 0
        for d in densities:
            for s in snrs_db:
                keys = jax.random.split(
                    jax.random.key(seed + i), frames_per_cell
                )
                i += 1
                cells = {}
                frames = bits = h_ls = None
                for est in estimators:
                    frames, bits, h_est, h_ls = sim_cell(keys, d, s, est)
                    h_true0 = frames.channel[:, :, 0, 0, :]
                    cells[est] = {
                        "nmse_db_slice": float(
                            10 * np.log10(
                                slice_nmse(h_est[:, :, 0, 0, :], h_true0) + 1e-12
                            )
                        ),
                        "ber": float(
                            ber_rx0(jnp.sum(h_est[:, :, 0, :, :], 2), frames, bits)
                        ),
                    }
                    if est == "mmse_full":
                        wiener_cache["hw"] = h_est[:, :, 0, 0, :]
                if "hw" not in wiener_cache and any(
                    "_wiener" in m for m in models
                ):
                    hw_full = estimate_batch(
                        frames, cfg=cfg, estimator="mmse_full", table=table
                    )
                    wiener_cache["hw"] = hw_full[:, :, 0, 0, :]
                h_true0 = frames.channel[:, :, 0, 0, :]
                for mt in models:
                    pred = model_cell(mt, frames, h_ls)
                    cells[mt] = {
                        "nmse_db_slice": float(
                            10 * np.log10(slice_nmse(pred, h_true0) + 1e-12)
                        ),
                        # superposition estimate = T · slice prediction
                        "ber": float(
                            ber_rx0(num_tx * pred, frames, bits)
                        ),
                    }
                wiener_cache.pop("hw", None)
                for name, vals in cells.items():
                    out.setdefault(name, {}).setdefault(str(d), {})[str(s)] = vals

        # pilot-overhead recommendation on the learned estimator too
        rec = {}
        for name, dd in out.items():
            avg = {
                d: float(np.mean([v["nmse_db_slice"] for v in row.values()]))
                for d, row in dd.items()
            }
            best = min(avg.values())
            ok = [float(d) for d, v in avg.items() if v <= best + 1.0]
            rec[name] = {"best_density": min(ok), "avg_nmse_db_slice": avg}
        return {
            "results": out,
            "recommendation": rec,
            "basis": "slice (rx0, tx0) — the models' native basis; classical "
            "estimates sliced identically. BER measured on the rx-0 chain, "
            "QPSK, per-RE scalar Wiener equalization vs the superposition "
            "channel (see results/PLATEAU_DIAGNOSIS.md for why quirk-mode "
            "BER floors).",
            "config": {
                "densities": list(densities),
                "snrs_db": list(snrs_db),
                "channel_type": channel_type,
                "doppler_hz": doppler_hz,
                "frames_per_cell": frames_per_cell,
                "modulation": modulation,
                "models": list(models),
            },
        }

    def save(self, sweep_result: Dict, name: str = "pilot_optimization_results.json"):
        p = self.results_dir / name
        p.write_text(json.dumps(sweep_result, indent=2))
        return p
