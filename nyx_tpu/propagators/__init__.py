from .tableaus import IntegratorMethod
from .options import IntegratorOptions
from .error_ctrl import ErrorControl
from .propagator import Propagator

__all__ = ["IntegratorMethod", "IntegratorOptions", "ErrorControl", "Propagator"]
