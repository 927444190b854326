from . import fast_oracle, general, lattice, reference_cpu
