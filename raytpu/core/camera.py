"""Interactive fly-camera controller — functional replacement for the SDL
input handling in the reference camera (reference: source/Camera.h:68-106).

The reference mutates a Camera from SDL keyboard/mouse state every frame.
Here the controller is a pure function: (state, input, dt) -> state, with the
same control scheme and constants:

  * WASD / arrows: move along forward/right; Shift = 4x speed
    (linear speed 4 m/s, reference: source/Camera.h:72,79)
  * mouse LMB drag: move forward/back by dy, yaw by dx
  * mouse RMB drag: pitch by -dy, yaw by dx (rotation speed 15, :73)
  * LMB+RMB drag: elevate along world Y by dy AND yaw by dx (yaw fires
    whenever either button is held, reference: source/Camera.h:101-102)
  * forward vector from pitch/yaw: ``Rx(pitch)@Ry(yaw)`` applied to UnitZ
    (reference: source/Camera.h:61-66)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np

from raytpu.core import math3d
from raytpu.core.types import Camera

LINEAR_SPEED = 4.0
ROTATION_SPEED = 15.0
SHIFT_MULTIPLIER = 4.0


@dataclass(frozen=True)
class CameraInput:
    """One frame of input state (SDL-agnostic)."""

    forward: bool = False  # W / Up
    backward: bool = False  # S / Down
    right: bool = False  # D / Right
    left: bool = False  # A / Left
    shift: bool = False
    mouse_dx: float = 0.0
    mouse_dy: float = 0.0
    lmb: bool = False
    rmb: bool = False


@dataclass(frozen=True)
class FlyCamera:
    """Camera pose as Euler state; ``camera()`` materializes the pytree."""

    origin: tuple = (0.0, 0.0, 0.0)
    pitch: float = 0.0
    yaw: float = 0.0
    fov_degrees: float = 90.0

    def camera(self) -> Camera:
        cam = Camera.create(self.origin, fov_degrees=self.fov_degrees)
        return cam.with_orientation(np.float32(self.pitch), np.float32(self.yaw))

    def _basis(self):
        # forward = UnitZ @ (Rx(pitch) @ Ry(yaw)) in the row-vector convention
        rot = np.asarray(
            math3d.mat_rotation(np.float32(self.pitch), np.float32(self.yaw), np.float32(0.0))
        )[:3, :3]
        fwd = np.array([0.0, 0.0, 1.0], np.float32) @ rot
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right = right / np.linalg.norm(right)
        return fwd, right

    def update(self, inp: CameraInput, dt: float) -> "FlyCamera":
        fwd, right = self._basis()
        shift = SHIFT_MULTIPLIER if inp.shift else 1.0
        speed = dt * LINEAR_SPEED * shift
        origin = np.asarray(self.origin, np.float64)
        if inp.forward:
            origin = origin + fwd * speed
        if inp.backward:
            origin = origin - fwd * speed
        if inp.right:
            origin = origin + right * speed
        if inp.left:
            origin = origin - right * speed

        pitch, yaw = self.pitch, self.yaw
        if inp.mouse_dx or inp.mouse_dy:
            rot_mod = dt * ROTATION_SPEED * shift
            if inp.lmb and inp.rmb:
                origin = origin + np.array([0.0, 1.0, 0.0]) * speed * inp.mouse_dy
            elif inp.lmb:
                origin = origin + fwd * speed * inp.mouse_dy
            elif inp.rmb:
                pitch -= inp.mouse_dy * math3d.TO_RADIANS * rot_mod
            # yaw whenever LMB or RMB is held — including both-buttons drags
            # (reference: source/Camera.h:101-102 masks yaw with
            #  `mouseState & LMASK || mouseState & RMASK`)
            if inp.lmb or inp.rmb:
                yaw += inp.mouse_dx * math3d.TO_RADIANS * rot_mod
        return dataclasses.replace(
            self, origin=tuple(float(x) for x in origin), pitch=float(pitch), yaw=float(yaw)
        )
