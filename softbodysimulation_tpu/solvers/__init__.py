from . import general, lattice, reference_cpu
