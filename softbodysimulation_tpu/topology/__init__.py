from . import build, coloring, edges, lattice, mesh, native, objloader
from .build import (BodySpec, build_topology, merge_topologies,
                    topology_from_mesh)
from .mesh import TriMesh, cube, cube_corners, grid_plane, icosphere, plane
