from raytpu.native import runtime  # noqa: F401
