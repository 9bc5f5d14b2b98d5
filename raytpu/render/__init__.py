from raytpu.render.renderer import generate_rays, render_image, render_image_f32  # noqa: F401
