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


class FirstPersonController:
    """Interactive walk/fly camera — the reference's input surface.

    The reference forwards GLFW keyboard/mouse events to donut's
    FirstPersonCamera and integrates it per frame in Animate
    (KeyboardUpdate/MousePosUpdate/MouseButtonUpdate -> m_Camera,
    Renderer.cpp:149-181; m_Camera.Animate(seconds), Renderer.cpp:185).
    Headless, the same surface is three host-side methods:

    * ``key_event(key, down)`` — WASD planar move, E/Q vertical
      (donut's binding), shift = sprint (3x).
    * ``mouse_move(dx, dy)`` — yaw/pitch look, pitch clamped to +-89 deg.
    * ``animate(dt)`` — velocity integration: the commanded velocity is
      approached exponentially (half-life ``accel_halflife``), so motion
      ramps smoothly on key-down and glides to rest on key-up; then
      ``pos += vel * dt``.

    ``walk=True`` pins the eye to terrain height + ``eye_height`` (the
    heightmap is sampled host-side with numpy bilinear) and commands
    movement in the horizontal plane; ``walk=False`` flies along the look
    direction. State is plain numpy — ``camera()`` snapshots it as a
    traced-arg Camera, so interactive motion never recompiles."""

    def __init__(self, camera: "Camera" = None, move_speed: float = 60.0,
                 look_speed: float = 0.005, accel_halflife: float = 0.15,
                 heightmap=None, world_size: float = 2048.0,
                 max_height: float = 400.0, eye_height: float = 1.8,
                 walk: bool = False):
        import math

        import numpy as np

        cam = camera if camera is not None else Camera.default()
        self.pos = np.asarray(cam.eye, np.float32).copy()
        fwd = np.asarray(cam.target, np.float32) - self.pos
        n = float(np.linalg.norm(fwd))
        fwd = fwd / n if n > 1e-6 else np.array([0, 0, -1], np.float32)
        self.yaw = math.atan2(float(fwd[2]), float(fwd[0]))
        self.pitch = math.asin(float(np.clip(fwd[1], -1.0, 1.0)))
        self.vel = np.zeros(3, np.float32)
        self.move_speed = move_speed
        self.look_speed = look_speed
        self.accel_halflife = accel_halflife
        self.heightmap = (
            None if heightmap is None
            else np.asarray(heightmap, np.float32)
        )
        self.world_size = world_size
        self.max_height = max_height
        self.eye_height = eye_height
        self.walk = walk
        self._keys = set()
        if self.walk:
            self._snap_to_ground()

    # -- input events (KeyboardUpdate / MousePosUpdate analogs) ----------

    def key_event(self, key: str, down: bool):
        key = key.lower()
        if down:
            self._keys.add(key)
        else:
            self._keys.discard(key)

    def mouse_move(self, dx: float, dy: float):
        import math

        self.yaw += dx * self.look_speed
        self.pitch -= dy * self.look_speed
        lim = math.radians(89.0)
        self.pitch = max(-lim, min(lim, self.pitch))

    # -- frame integration (m_Camera.Animate(seconds)) -------------------

    def _basis(self):
        import math

        import numpy as np

        cp, sp = math.cos(self.pitch), math.sin(self.pitch)
        cy, sy = math.cos(self.yaw), math.sin(self.yaw)
        fwd = np.array([cp * cy, sp, cp * sy], np.float32)
        flat = np.array([cy, 0.0, sy], np.float32)
        right = np.array([-sy, 0.0, cy], np.float32)
        return fwd, flat, right

    def _ground(self, x: float, z: float) -> float:
        import numpy as np

        hm = self.heightmap
        if hm is None:
            return 0.0
        res = hm.shape[0]
        u = (x / self.world_size + 0.5) * (res - 1)
        v = (z / self.world_size + 0.5) * (res - 1)
        u = float(np.clip(u, 0.0, res - 1))
        v = float(np.clip(v, 0.0, res - 1))
        u0, v0 = int(u), int(v)
        u1, v1 = min(u0 + 1, res - 1), min(v0 + 1, res - 1)
        fu, fv = u - u0, v - v0
        h = (
            hm[v0, u0] * (1 - fu) * (1 - fv) + hm[v0, u1] * fu * (1 - fv)
            + hm[v1, u0] * (1 - fu) * fv + hm[v1, u1] * fu * fv
        )
        return float(h) * self.max_height

    def _snap_to_ground(self):
        self.pos[1] = (
            self._ground(float(self.pos[0]), float(self.pos[2]))
            + self.eye_height
        )

    def animate(self, dt: float):
        import numpy as np

        fwd, flat, right = self._basis()
        ahead = flat if self.walk else fwd
        cmd = np.zeros(3, np.float32)
        k = self._keys
        cmd += ahead * (("w" in k) - ("s" in k))
        cmd += right * (("d" in k) - ("a" in k))
        if not self.walk:
            cmd += np.array([0, 1, 0], np.float32) * (
                ("e" in k) - ("q" in k)
            )
        n = float(np.linalg.norm(cmd))
        speed = self.move_speed * (3.0 if "shift" in k else 1.0)
        v_cmd = cmd / n * speed if n > 1e-6 else np.zeros(3, np.float32)
        # exponential approach: reaches half the remaining gap every
        # accel_halflife seconds — smooth ramp on press, glide on release
        alpha = 1.0 - 0.5 ** (dt / max(self.accel_halflife, 1e-6))
        self.vel += (v_cmd - self.vel) * alpha
        self.pos = self.pos + self.vel * dt
        if self.walk:
            self._snap_to_ground()
        return self.camera()

    def camera(self) -> "Camera":
        fwd, _, _ = self._basis()
        return Camera(
            eye=jnp.asarray(self.pos, jnp.float32),
            target=jnp.asarray(self.pos + fwd, jnp.float32),
            up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        )


class OrbitController:
    """Orbit camera around a pivot: left-drag orbits (yaw/pitch), wheel
    zooms the dolly distance. The editor's inspection counterpart to the
    first-person camera (the reference gets orbiting via donut's camera
    modes; same Animate-per-frame integration contract)."""

    def __init__(self, pivot=(0.0, 0.0, 0.0), distance: float = 300.0,
                 yaw: float = 0.0, pitch: float = -0.5,
                 look_speed: float = 0.005):
        import numpy as np

        self.pivot = np.asarray(pivot, np.float32)
        self.distance = float(distance)
        self.yaw = float(yaw)
        self.pitch = float(pitch)
        self.look_speed = look_speed

    def drag(self, dx: float, dy: float):
        import math

        self.yaw += dx * self.look_speed
        self.pitch -= dy * self.look_speed
        lim = math.radians(89.0)
        self.pitch = max(-lim, min(lim, self.pitch))

    def zoom(self, factor: float):
        self.distance = max(1e-3, self.distance * factor)

    def camera(self) -> "Camera":
        import math

        import numpy as np

        cp, sp = math.cos(self.pitch), math.sin(self.pitch)
        cy, sy = math.cos(self.yaw), math.sin(self.yaw)
        offset = np.array(
            [cp * cy, sp, cp * sy], np.float32
        ) * self.distance
        return Camera(
            eye=jnp.asarray(self.pivot + offset, jnp.float32),
            target=jnp.asarray(self.pivot, jnp.float32),
            up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        )


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
