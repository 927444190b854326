from . import checkpoint, export, raster, wireframe
