from . import lattice_pallas
