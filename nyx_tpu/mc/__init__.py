from .dispersion import StateDispersion
from .multivariate import MvnSpacecraft
from .montecarlo import MonteCarlo
from .results import Results

__all__ = ["StateDispersion", "MvnSpacecraft", "MonteCarlo", "Results"]
