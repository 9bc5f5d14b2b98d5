from raytpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    render_image_sharded,
    render_pixels_shard_map,
)
