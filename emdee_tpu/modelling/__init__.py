from emdee_tpu.modelling.forcefield import ForceField
from emdee_tpu.modelling.system import System

__all__ = ["ForceField", "System"]
