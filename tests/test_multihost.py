"""Multi-host runtime coverage (raytpu.parallel.multihost): mocked
jax.distributed wiring + pod-mesh construction on the virtual 8-device mesh.

Real >=2-host runs need pod hardware (BASELINE.md's scaling target); what is
testable here is the initialization contract — which args reach
``jax.distributed.initialize``, idempotency, and the ICI-major mesh layout.
"""

from unittest import mock

import jax
import numpy as np

from raytpu.parallel import multihost


def test_initialize_passes_cluster_args():
    with mock.patch.object(jax.distributed, "initialize") as init:
        multihost.initialize("10.0.0.1:1234", num_processes=2, process_id=1)
    init.assert_called_once_with(
        coordinator_address="10.0.0.1:1234", num_processes=2, process_id=1
    )


def test_initialize_single_process_is_noop():
    with mock.patch.object(jax.distributed, "initialize") as init:
        multihost.initialize(num_processes=1)
    init.assert_not_called()


def test_initialize_already_initialized_is_swallowed():
    with mock.patch.object(
        jax.distributed, "initialize",
        side_effect=RuntimeError("jax.distributed is already initialized"),
    ):
        multihost.initialize("10.0.0.1:1234", num_processes=2, process_id=0)


def test_initialize_other_errors_propagate():
    with mock.patch.object(
        jax.distributed, "initialize",
        side_effect=RuntimeError("coordinator unreachable"),
    ):
        try:
            multihost.initialize("10.0.0.1:1234", num_processes=2, process_id=0)
        except RuntimeError as e:
            assert "unreachable" in str(e)
        else:
            raise AssertionError("expected RuntimeError")


def test_pod_mesh_shapes_and_layout():
    mesh = multihost.pod_mesh(prim=2)
    assert mesh.shape == {"px": 4, "prim": 2}
    # px is the leading (within-host-major) axis: consecutive devices fill
    # the prim axis first, so the prim all-gather stays on ICI (SURVEY §5.8)
    devs = np.asarray(jax.devices()).reshape(4, 2)
    assert (np.asarray(mesh.devices) == devs).all()


def test_pod_mesh_renders_bit_identical():
    """A pod_mesh-built mesh must drive the sharded renderer identically to
    the single-device path (same contract as make_mesh)."""
    from raytpu.core import scenes
    from raytpu.core.types import RenderConfig
    from raytpu.parallel import render_image_sharded
    from raytpu.render import render_image

    scene = scenes.get("reference").build()
    cfg = RenderConfig(width=64, height=48)
    ref = np.asarray(render_image(scene, cfg))
    img = np.asarray(render_image_sharded(scene, cfg, multihost.pod_mesh(prim=2)))
    np.testing.assert_array_equal(img, ref)


def test_primary_and_local_count():
    assert multihost.is_primary() is True
    assert multihost.local_device_count() == 8
