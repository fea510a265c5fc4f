"""Optimization: differential correction and multiple shooting
(counterpart of nyx-core/src/md/opti/)."""

from .target_variable import Variable, Vary
from .targeter import Targeter, TargeterSolution

__all__ = ["Variable", "Vary", "Targeter", "TargeterSolution"]
