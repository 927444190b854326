from . import config, fixtures, presets, scenes, state
