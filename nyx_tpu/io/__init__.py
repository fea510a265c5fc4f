from .gravity import GravityFieldData
from .export import ExportCfg

__all__ = ["GravityFieldData", "ExportCfg"]
