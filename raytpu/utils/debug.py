"""Debug / numerical-safety tooling.

The reference's only sanitizer is Visual Leak Detector (reference:
source/main.cpp:2); races are prevented by construction.  In the pure-
functional JAX design races are structurally impossible (SURVEY.md §5.2), so
the useful runtime checks are numerical: NaN trapping, finite-ness audits of
scenes and gradients, and buffer-donation sanity.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_check():
    """Enable jax_debug_nans within the context (raises at the op producing
    the first NaN — the JAX analog of a debugger data-breakpoint)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite_tree(tree, name: str = "pytree") -> None:
    """Raise if any floating leaf contains NaN/inf."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise FloatingPointError(f"non-finite values in {name}{jax.tree_util.keystr(path)}")


def validate_scene(scene) -> list[str]:
    """Static sanity audit of a scene pytree; returns a list of problems."""
    problems = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(scene)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                problems.append(f"non-finite: {jax.tree_util.keystr(path)}")
    m = scene.materials.count
    for what, ids in [
        ("spheres", scene.spheres.material),
        ("planes", scene.planes.material),
        ("triangles", scene.triangles.material),
    ]:
        if ids.size and (int(ids.max()) >= m or int(ids.min()) < 0):
            problems.append(f"{what}: material index out of range [0, {m})")
    if scene.triangles.count:
        n = scene.triangles.normal
        norms = jnp.linalg.norm(n, axis=-1)
        if not bool(jnp.all(jnp.abs(norms - 1.0) < 1e-3)):
            problems.append("triangles: non-unit face normals")
    return problems
