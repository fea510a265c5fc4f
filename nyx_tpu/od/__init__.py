"""Orbit determination stack (counterpart of nyx-core/src/od/)."""

from .blse import BatchLeastSquares, BLSSolution, BLSSolver
from .estimate import KfEstimate, Residual, SpacecraftUncertainty
from .ground_station import GroundStation, TerrainMask
from .interlink import DeviceTrajectory, InterlinkTxSpacecraft
from .position import PositionDevice
from .groundpnt import GroundAsset, GroundPntProcess, GroundPntSim
from .kalman import (KalmanFilter, KalmanVariant, ProcessNoise,
                     ProcessNoise3D)
from .msr import Measurement, MeasurementType, TrackingDataArc
from .noise import GaussMarkov, StochasticNoise, WhiteNoise
from .process import (KalmanODProcess, SpacecraftKalmanOD,
                      SpacecraftKalmanScalarOD)
from .simulator import Scheduler, TrackingArcSim, TrkConfig
from .solution import ODSolution
from . import tdm as _tdm  # attaches TrackingDataArc.to_tdm/from_tdm

__all__ = [
    "BatchLeastSquares", "BLSSolution", "BLSSolver",
    "KfEstimate", "Residual", "SpacecraftUncertainty", "GroundStation",
    "TerrainMask",
    "InterlinkTxSpacecraft", "DeviceTrajectory", "PositionDevice",
    "GroundAsset", "GroundPntProcess", "GroundPntSim",
    "KalmanFilter", "KalmanVariant", "ProcessNoise", "ProcessNoise3D", "Measurement",
    "MeasurementType", "TrackingDataArc", "GaussMarkov", "StochasticNoise",
    "WhiteNoise", "KalmanODProcess", "SpacecraftKalmanOD", "SpacecraftKalmanScalarOD", "Scheduler",
    "TrackingArcSim", "TrkConfig", "ODSolution",
]
