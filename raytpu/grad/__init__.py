from raytpu.grad.diff_render import render_soft, image_loss, make_train_step  # noqa: F401
