from . import build, coloring, edges, lattice, mesh, native, objloader
from .build import build_topology, topology_from_mesh
from .mesh import TriMesh, cube, cube_corners, grid_plane, icosphere, plane
