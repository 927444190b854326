from . import bending, collision, distance, integrate, normals, spatial_hash, volume
