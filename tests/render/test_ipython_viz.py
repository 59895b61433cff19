"""Headless tests for the Jupyter visualizers (no widget stack installed):
camera manipulation + rendering driven through _handle_event with synthetic
DOM events. Ref kaolin/visualize/ipython.py:165,446,719."""

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.camera import Camera
from kaolin_tpu.visualize.ipython import (
    IpyFirstPersonVisualizer,
    IpyTurntableVisualizer,
    mulqq,
    mulqv,
    make_quaternion_rotation,
    rotate_around_axis,
)


def _camera():
    return Camera.from_args(eye=jnp.asarray([0.0, 1.0, 3.0]),
                            at=jnp.zeros(3), up=jnp.asarray([0.0, 1.0, 0.0]),
                            fov=np.deg2rad(45.0), width=32, height=32)


def _render(camera):
    # toy render: encodes camera position into a constant image
    pos = np.asarray(camera.cam_pos()).squeeze()
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[..., 0] = np.uint8(abs(pos[0]) * 10 % 255)
    return {"img": img}


def test_quaternion_helpers():
    q = make_quaternion_rotation(np.pi / 2, jnp.asarray([0.0, 0.0, 1.0]))
    v = mulqv(q, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-6)
    ident = mulqq(q, jnp.asarray([-q[0], -q[1], -q[2], q[3]]))
    np.testing.assert_allclose(np.asarray(ident), [0, 0, 0, 1], atol=1e-6)
    r = rotate_around_axis(jnp.asarray([0.0, 1.0, 0.0]), np.pi,
                           jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(r), [0.0, -1.0, 0.0], atol=1e-6)


def test_turntable_orbit_keeps_distance():
    viz = IpyTurntableVisualizer(32, 32, _camera(), _render)
    viz.render_update()
    assert viz.canvas.last_image is not None
    d0 = float(jnp.linalg.norm(viz.camera.cam_pos().squeeze() - viz.focus_at))
    # drag: orbit 90 degrees
    viz._handle_event({"type": "mousedown", "relativeX": 0, "relativeY": 0})
    viz._handle_event({"type": "mousemove", "buttons": 1,
                       "relativeX": 16, "relativeY": 0})
    d1 = float(jnp.linalg.norm(viz.camera.cam_pos().squeeze() - viz.focus_at))
    np.testing.assert_allclose(d0, d1, rtol=1e-4)
    # camera still looks at the focus point (cam_forward follows the
    # reference convention — it points from the target TOWARD the camera,
    # ref extrinsics.py:968; the viewing direction is its negation)
    fwd = np.asarray(viz.camera.cam_forward()).squeeze()
    to_focus = np.array(viz.focus_at - viz.camera.cam_pos().squeeze())
    to_focus = to_focus / np.linalg.norm(to_focus)
    np.testing.assert_allclose(-fwd, to_focus, atol=1e-4)
    # position actually moved
    assert d0 > 0 and not np.allclose(
        np.asarray(viz.camera.cam_pos()).squeeze(),
        np.asarray(_camera().cam_pos()).squeeze(), atol=1e-3)


def test_turntable_zoom_and_forward():
    from kaolin_tpu.render.camera.intrinsics import CameraFOV
    viz = IpyTurntableVisualizer(32, 32, _camera(), _render)
    fov0 = float(viz.camera.intrinsics.fov(CameraFOV.VERTICAL)[0])
    viz._handle_event({"type": "wheel", "deltaY": -300, "ctrlKey": False})
    fov1 = float(viz.camera.intrinsics.fov(CameraFOV.VERTICAL)[0])
    assert fov1 < fov0  # zoomed in
    d0 = float(viz.distance)
    viz._handle_event({"type": "wheel", "deltaY": 300, "ctrlKey": True})
    assert float(viz.distance) > d0  # moved backward (positive deltaY)


def test_turntable_pole_crossing():
    viz = IpyTurntableVisualizer(32, 32, _camera(), _render)
    viz._move_turntable(-np.pi, 0.0)  # push far past the pole
    assert -np.pi / 2 <= viz.elevation <= np.pi / 2
    # camera remains valid (finite view matrix)
    assert np.isfinite(np.asarray(viz.camera.view_matrix())).all()


def test_first_person_moves_and_looks():
    viz = IpyFirstPersonVisualizer(32, 32, _camera(), _render,
                                   world_up=jnp.asarray([0.0, 1.0, 0.0]))
    p0 = np.asarray(viz.camera.cam_pos()).squeeze()
    viz._handle_event({"type": "keydown", "key": "o"})  # forward
    p1 = np.asarray(viz.camera.cam_pos()).squeeze()
    assert np.linalg.norm(p1 - p0) > 1e-4
    # look around: forward direction changes, position does not
    viz._handle_event({"type": "mousedown", "relativeX": 0, "relativeY": 0})
    f0 = np.asarray(viz.camera.cam_forward()).squeeze()
    viz._handle_event({"type": "mousemove", "buttons": 1,
                       "relativeX": 10, "relativeY": 0})
    f1 = np.asarray(viz.camera.cam_forward()).squeeze()
    p2 = np.asarray(viz.camera.cam_pos()).squeeze()
    assert np.linalg.norm(f1 - f0) > 1e-3
    np.testing.assert_allclose(p2, p1, atol=1e-4)
    # elevation clamped when dragging far up
    for _ in range(20):
        viz._handle_event({"type": "mousemove", "buttons": 1,
                           "relativeX": 10, "relativeY": -200})
        viz.position = (10, 0)
    assert -np.pi / 2 < viz.elevation < np.pi / 2
    assert np.isfinite(np.asarray(viz.camera.view_matrix())).all()


def test_get_values_under_cursor():
    viz = IpyTurntableVisualizer(32, 32, _camera(), _render)
    viz.render_update()
    vals = viz.get_values_under_cursor(
        {"relativeX": 16, "relativeY": 16,
         "boundingRectWidth": 32, "boundingRectHeight": 32})
    assert "img" in vals and vals["img"].shape == (3,)


def test_fps_visualizer_look_continuity():
    """Small look-around drags change the view by small angles (regression:
    the cam_forward convention change flipped the FPS view 180 degrees and
    double-applied elevation)."""
    from kaolin_tpu.visualize.ipython import IpyFirstPersonVisualizer

    cam = Camera.from_args(eye=jnp.asarray([0.0, 0.0, 3.0]),
                           at=jnp.zeros(3), up=jnp.asarray([0.0, 1.0, 0.0]),
                           fov=0.7, width=32, height=32)
    viz = IpyFirstPersonVisualizer(32, 32, cam,
                                   lambda c: jnp.zeros((32, 32, 3)))

    def viewdir(c):
        return -np.asarray(c.cam_forward()).squeeze()

    v0 = viewdir(viz.camera)
    viz._rotate(0.01, 0.0)
    v1 = viewdir(viz.camera)
    ang = np.degrees(np.arccos(np.clip(np.dot(v0, v1), -1, 1)))
    np.testing.assert_allclose(ang, np.degrees(0.01), atol=0.05)
    viz._rotate(0.0, 0.01)
    v2 = viewdir(viz.camera)
    ang2 = np.degrees(np.arccos(np.clip(np.dot(v1, v2), -1, 1)))
    np.testing.assert_allclose(ang2, np.degrees(0.01), atol=0.05)
    # looking around never moves the camera; elevation tracks actual pitch
    for _ in range(40):
        viz._rotate(0.02, 0.01)
    assert np.allclose(np.asarray(viz.camera.cam_pos()).squeeze(),
                       [0.0, 0.0, 3.0], atol=1e-4)
    v3 = viewdir(viz.camera)
    np.testing.assert_allclose(float(np.arcsin(np.clip(v3[1], -1, 1))),
                               viz.elevation, atol=1e-3)


def test_fps_visualizer_explicit_world_up_continuity():
    from kaolin_tpu.visualize.ipython import IpyFirstPersonVisualizer

    cam = Camera.from_args(eye=jnp.asarray([0.0, 2.0, 2.0]),
                           at=jnp.zeros(3), up=jnp.asarray([0.0, 1.0, 0.0]),
                           fov=0.7, width=32, height=32)
    viz = IpyFirstPersonVisualizer(32, 32, cam,
                                   lambda c: jnp.zeros((32, 32, 3)),
                                   world_up=jnp.asarray([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(viz.elevation, -np.pi / 4, atol=1e-3)
    v0 = -np.asarray(viz.camera.cam_forward()).squeeze()
    viz._rotate(0.0, 0.001)
    v1 = -np.asarray(viz.camera.cam_forward()).squeeze()
    ang = np.degrees(np.arccos(np.clip(np.dot(v0, v1), -1, 1)))
    assert ang < 0.2  # continuous, no snap to horizontal
