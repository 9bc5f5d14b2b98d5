from raytpu.oracle.cpu import render_oracle  # noqa: F401
