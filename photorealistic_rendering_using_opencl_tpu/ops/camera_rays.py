"""Thin-lens camera ray generation, batched over pixels.

Re-design of ``kernels/camera.cl:17-66`` + the host orbit camera
(``src/Camera/camera.cpp``).  One deliberate fix vs the reference: sub-pixel
jitter (the reference aims every sample at the pixel corner,
camera.cl:32-33, so it can never antialias -- SURVEY §7 bug list).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.ops.math import normalize
from photorealistic_rendering_using_opencl_tpu.ops.sampling import uniform_disk


@dataclasses.dataclass
class Camera:
    """POD render camera (include/Camera/camera.h:7-15)."""

    position: Any  # [3]
    view: Any  # [3] unit view direction
    up: Any  # [3]
    resolution: tuple[int, int]  # (width, height) -- static
    fov: Any  # [2] degrees (x, y)
    aperture_radius: Any = 0.0
    focal_distance: Any = 4.0

    def pytree(self):
        return dict(
            position=jnp.asarray(self.position, jnp.float32),
            view=jnp.asarray(self.view, jnp.float32),
            up=jnp.asarray(self.up, jnp.float32),
            fov=jnp.asarray(self.fov, jnp.float32),
            aperture_radius=jnp.asarray(self.aperture_radius, jnp.float32),
            focal_distance=jnp.asarray(self.focal_distance, jnp.float32),
        )


def default_camera(width: int, height: int) -> Camera:
    """The reference's startup orbit camera (camera.cpp:4-12, main.cpp:312-318):
    center origin, yaw 0, pitch 0.3, radius 4, fovx 45."""
    yaw, pitch, radius = 0.0, 0.3, 4.0
    d = np.array([np.sin(yaw) * np.cos(pitch),
                  np.sin(pitch),
                  np.cos(yaw) * np.cos(pitch)], np.float32)
    position = d * radius
    view = -d
    fovx = 45.0
    fovy = np.degrees(np.arctan(np.tan(np.radians(fovx) * 0.5)
                                * (height / width)) * 2.0)
    return Camera(position=position, view=view, up=np.array([0., 1., 0.], np.float32),
                  resolution=(width, height), fov=np.array([fovx, fovy], np.float32),
                  aperture_radius=0.01, focal_distance=4.0)


def generate_rays(cam: dict, width: int, height: int,
                  px: jnp.ndarray, py: jnp.ndarray,
                  u_jitter: tuple, u_aperture: tuple,
                  jitter: bool = True):
    """px/py: integer pixel coords [N]; returns (origin[N,3], dir[N,3]).

    cam is Camera.pytree() (differentiable leaves).
    """
    view = normalize(cam["view"])
    up = normalize(cam["up"])
    horiz_axis = normalize(jnp.cross(view, up))
    vert_axis = normalize(jnp.cross(horiz_axis, view))

    middle = cam["position"] + view
    fov = cam["fov"]
    horizontal = horiz_axis * jnp.tan(fov[0] * 0.5 * (jnp.pi / 180.0))
    vertical = vert_axis * (-jnp.tan(fov[1] * 0.5 * (jnp.pi / 180.0)))

    jx, jy = u_jitter
    if not jitter:
        jx = jnp.zeros_like(jx)
        jy = jnp.zeros_like(jy)
    # flip y like the reference (pixely = height - y - 1, camera.cl:29-33)
    sx = (px.astype(jnp.float32) + jx) / jnp.float32(width - 1.0)
    sy = ((height - 1 - py).astype(jnp.float32) + jy) / jnp.float32(height - 1.0)

    point_on_plane = (middle[None]
                      + horizontal[None] * (2.0 * sx - 1.0)[:, None]
                      + vertical[None] * (2.0 * sy - 1.0)[:, None])
    point_on_image = (cam["position"][None]
                      + (point_on_plane - cam["position"][None])
                      * cam["focal_distance"])

    u1, u2 = u_aperture
    disk = uniform_disk(u1, u2) * cam["aperture_radius"]
    aperture = (cam["position"][None]
                + horiz_axis[None] * disk[:, 0:1]
                + vert_axis[None] * disk[:, 1:2])
    use_dof = cam["aperture_radius"] > 1e-5
    origin = jnp.where(use_dof, aperture,
                       jnp.broadcast_to(cam["position"], aperture.shape))
    direction = normalize(point_on_image - origin)
    return origin, direction


def sample_time(u, shutter_open: float = 0.0, shutter_close: float = 1.0):
    """Per-ray time sample -- the reference's dormant motion-blur hook
    (``ray.time = next1D(...)``, kernels/camera.cl:63; nothing consumes it
    there either).  Wire into generate_rays callers when animated scene
    support lands; kept for capability parity."""
    return shutter_open + (shutter_close - shutter_open) * u
