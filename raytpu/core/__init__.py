from raytpu.core import math3d, obj, scenes, types  # noqa: F401
