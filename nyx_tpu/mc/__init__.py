from .dispersion import StateDispersion
from .helpers import dv_execution_error, dv_pointing_error, unit_vector_from_seed
from .multivariate import MvnSpacecraft
from .montecarlo import MonteCarlo
from .results import Results

__all__ = [
    "StateDispersion",
    "MvnSpacecraft",
    "MonteCarlo",
    "Results",
    "unit_vector_from_seed",
    "dv_pointing_error",
    "dv_execution_error",
]
