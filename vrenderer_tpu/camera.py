"""Camera: first-person state + scripted flythrough paths.

The reference uses donut's FirstPersonCamera driven by GLFW input
(Renderer.cpp:149-181, initial pose Renderer.cpp:97-98). Headless on TPU,
the camera is a small pytree of arrays so a whole flythrough can be a
jit-scanned array of camera states.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vrenderer_tpu.utils import math3d


class Camera(NamedTuple):
    """Pose + projection parameters. All fields are arrays so a batch of
    cameras (a flythrough) is just a stacked Camera."""

    eye: jnp.ndarray        # (3,)
    target: jnp.ndarray     # (3,)
    up: jnp.ndarray         # (3,)

    @staticmethod
    def default() -> "Camera":
        """Reference initial pose: LookAt((0,205,227.4),(1,1.8,0))
        (Renderer.cpp:97)."""
        return Camera(
            eye=jnp.array([0.0, 205.0, 227.4], jnp.float32),
            target=jnp.array([1.0, 1.8, 0.0], jnp.float32),
            up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
        )

    def world_to_view(self) -> jnp.ndarray:
        return math3d.look_at(self.eye, self.target, self.up)


def make_view_constants(
    camera: Camera, width: int, height: int,
    vfov_degrees: float = 60.0, z_near: float = 0.1, z_far: float = 10000.0,
):
    """Build the PlanarViewConstants-equivalent dict for one view.

    Mirrors donut's FillPlanarViewConstants (used at TerrainPass.cpp:281):
    matWorldToView, matViewToClip, matWorldToClip, matClipToWorld,
    matViewToWorld, plus viewport size. Keys are stable; values f32.
    """
    import math as _m

    w2v = camera.world_to_view()
    proj = math3d.persp_proj_d3d_style(
        _m.radians(float(vfov_degrees)), width / height, z_near, z_far
    )
    vp = math3d.view_proj(w2v, proj)
    return {
        "world_to_view": w2v,
        "view_to_clip": proj,
        "world_to_clip": vp,
        "clip_to_world": math3d.inverse_4x4(vp),
        "view_to_world": math3d.inverse_affine(w2v),
        "camera_pos": camera.eye,
        "viewport": jnp.array([width, height], jnp.float32),
    }


def flythrough(
    num_frames: int,
    world_size: float = 2048.0,
    altitude: float = 205.0,
    radius_frac: float = 0.3,
    heightmap=None,
    max_height: float = 400.0,
    clearance: float = 60.0,
) -> Camera:
    """A deterministic scripted orbit+descent flythrough over the terrain.

    Returns a Camera whose fields have a leading (num_frames,) axis —
    the standard workload for the 1080p flythrough benchmark
    (BASELINE.md config 2). When a heightmap is given, the path stays at
    least ``clearance`` above the terrain (the reference's hand-tuned pose
    assumed its own asset's heights; a procedural field needs this).
    """
    t = jnp.linspace(0.0, 1.0, num_frames, dtype=jnp.float32)
    ang = t * 2.0 * jnp.pi
    r = world_size * radius_frac * (1.0 - 0.5 * t)
    alt = altitude * (1.0 - 0.6 * t) + 40.0
    ex = r * jnp.cos(ang)
    ez = r * jnp.sin(ang)
    if heightmap is not None:
        from vrenderer_tpu.ops import texture

        ground = texture.sample_points(
            heightmap,
            (ex + world_size * 0.5) / world_size,
            (ez + world_size * 0.5) / world_size,
        ) * max_height
        alt = jnp.maximum(alt, ground + clearance)
    eye = jnp.stack([ex, alt, ez], axis=-1)
    look_ang = ang + 0.9
    target = jnp.stack(
        [
            (r * 0.3) * jnp.cos(look_ang),
            jnp.full_like(t, 5.0),
            (r * 0.3) * jnp.sin(look_ang),
        ],
        axis=-1,
    )
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32), eye.shape)
    return Camera(eye=eye, target=target, up=up)
