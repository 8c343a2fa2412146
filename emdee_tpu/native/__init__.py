"""Native (C++) acceleration modules, loaded via ctypes.

Two native components mirror the reference's native tier (SURVEY.md §2a):

- ``canon``  — colored-graph canonical labeling (the reference FFIs to the
  nauty C library, molecular_graphs.jl:75-80).
- ``chemio`` — PDB/XYZ parsing (the reference uses the Chemfiles C++ library,
  modelling.jl:8,236).

Both have pure-Python fallbacks so the framework works without a compiler;
`emdee_tpu.native.build` compiles the shared library on demand with g++.
"""

from emdee_tpu.native import chemio, canon  # noqa: F401
