from raytpu.utils import image, profiling  # noqa: F401
