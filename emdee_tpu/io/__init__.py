from emdee_tpu.io.xyz import read_xyz, write_xyz, XYZTrajectoryWriter
from emdee_tpu.io.pdb import read_pdb, write_pdb, PDBFrame

__all__ = [
    "read_xyz",
    "write_xyz",
    "XYZTrajectoryWriter",
    "read_pdb",
    "write_pdb",
    "PDBFrame",
]
