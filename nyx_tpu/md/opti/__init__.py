"""Optimization: differential correction and multiple shooting
(counterpart of nyx-core/src/md/opti/)."""

from .convert_impulsive import convert_impulsive_mnvr
from .target_variable import Variable, Vary
from .targeter import Targeter, TargeterSolution

__all__ = [
    "Variable", "Vary", "Targeter", "TargeterSolution",
    "convert_impulsive_mnvr",
]
