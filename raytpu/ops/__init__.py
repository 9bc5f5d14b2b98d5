from raytpu.ops import intersect, shading  # noqa: F401
