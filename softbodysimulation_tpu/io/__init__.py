from . import checkpoint, export, wireframe
