from .runner import run_single_experiment, scrape_best_results
from .ablation import GRANULAR_ABLATIONS, STANDARD_ABLATIONS, run_ablation_suite
from .sensitivity import run_sensitivity_sweep
from .preprocess import run_noise_grid

__all__ = [
    "run_single_experiment",
    "scrape_best_results",
    "STANDARD_ABLATIONS",
    "GRANULAR_ABLATIONS",
    "run_ablation_suite",
    "run_sensitivity_sweep",
    "run_noise_grid",
]
