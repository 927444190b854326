from . import batch, spatial
