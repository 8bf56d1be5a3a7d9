from .ber import ber_frame, ber_sweep, simulate_qam_frame
from .evaluate import ModelEvaluator, evaluate_baselines, evaluate_estimators
from .pilot_opt import PilotOptimizer
from .report import (
    generate_evaluation_report,
    generate_final_report,
    plot_comparison,
    plot_snr_sweep,
    plot_training_curves,
)
from .tuning import DEFAULT_CNN_SPACE, HyperparameterTuner, QuickDataset

__all__ = [
    "ber_frame",
    "ber_sweep",
    "simulate_qam_frame",
    "ModelEvaluator",
    "evaluate_baselines",
    "evaluate_estimators",
    "PilotOptimizer",
    "generate_evaluation_report",
    "generate_final_report",
    "plot_comparison",
    "plot_snr_sweep",
    "plot_training_curves",
    "DEFAULT_CNN_SPACE",
    "HyperparameterTuner",
    "QuickDataset",
]
