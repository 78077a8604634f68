"""Interactive viewer layer: InputMap, camera/perturbation controllers,
and the web GUI backend (VERDICT r2 item 8).

Reference semantics: dm_control/viewer/user_input.py:146-320 (bindings),
viewer.py:88-530 (controllers).  The web backend is exercised end-to-end
over localhost HTTP — the browser's role is played by urllib.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from dm_control_tpu.viewer import user_input
from dm_control_tpu.viewer.viewer import (
    CameraSelector, FreeCameraController, ManipulationController, Viewer,
    apply_perturbation,
)


class _FakeCamera:
    """Pose-only stand-in for rendering.MovableCamera."""

    def __init__(self):
        from dm_control_tpu.rendering.camera import Pose

        self._pose = Pose(lookat=np.zeros(3), distance=2.0, azimuth=90.0,
                          elevation=-45.0)

    def get_pose(self):
        return self._pose

    def set_pose(self, lookat, distance, azimuth, elevation):
        from dm_control_tpu.rendering.camera import Pose

        self._pose = Pose(np.asarray(lookat, float), float(distance),
                          float(azimuth), float(elevation))


# -- InputMap ---------------------------------------------------------------


def test_input_map_plain_and_range():
    im = user_input.InputMap()
    fired = []
    im.bind(lambda: fired.append("a"), "a")
    im.bind(fired.append, user_input.Range(["1", "2", "3"]))
    im.key_event("a", True)
    im.key_event("2", True)
    im.key_event("2", False)  # releases don't fire plain bindings
    assert fired == ["a", 1]


def test_input_map_exclusive_suppresses_others():
    im = user_input.InputMap()
    log = []
    im.bind(lambda e: log.append(("excl", e)),
            user_input.Exclusive(user_input.MOUSE_LEFT))
    im.bind(lambda: log.append("plain"), "p")
    im.key_event(user_input.MOUSE_LEFT, True)
    im.key_event("p", True)  # suppressed while exclusive held
    im.key_event(user_input.MOUSE_LEFT, False)
    im.key_event("p", True)
    assert log == [("excl", True), ("excl", False), "plain"]


def test_input_map_modifiers_and_double_click():
    im = user_input.InputMap()
    log = []
    im.bind(lambda e: log.append(("shift", e)),
            user_input.Exclusive((user_input.MOD_SHIFT,
                                  user_input.MOUSE_RIGHT)))
    im.bind(lambda: log.append("dbl"),
            user_input.DoubleClick(user_input.MOUSE_LEFT))
    im.key_event(user_input.MOUSE_RIGHT, True)  # no modifier: nothing
    im.key_event(user_input.MOUSE_RIGHT, False)
    im.key_event(user_input.MOUSE_RIGHT, True, user_input.MOD_SHIFT)
    im.key_event(user_input.MOUSE_RIGHT, False, user_input.MOD_SHIFT)
    im.double_click(user_input.MOUSE_LEFT)
    assert log == [("shift", True), ("shift", False), "dbl"]


# -- camera controller --------------------------------------------------------


def test_free_camera_orbit_pan_zoom():
    cam = _FakeCamera()
    ctl = FreeCameraController(cam)
    ctl.set_rotate_mode(True)
    ctl.on_move((0, 0), (10.0, -5.0))
    ctl.set_rotate_mode(False)
    pose = cam.get_pose()
    assert pose.azimuth == pytest.approx(90.0 - 0.4 * 10)
    assert pose.elevation == pytest.approx(-45.0 + 0.4 * 5)

    ctl.set_pan_horizontal_mode(True)
    before = cam.get_pose().lookat.copy()
    ctl.on_move((0, 0), (100.0, 0.0))
    ctl.set_pan_horizontal_mode(False)
    assert np.linalg.norm(cam.get_pose().lookat - before) > 0

    d0 = cam.get_pose().distance
    ctl.zoom(2.0)
    assert cam.get_pose().distance == pytest.approx(d0 * 0.9)

    # elevation clamps at +-89
    cam.set_pose(np.zeros(3), 1.0, 0.0, 88.0)
    ctl.set_rotate_mode(True)
    ctl.on_move((0, 0), (0.0, -100.0))
    assert cam.get_pose().elevation == 89.0


def test_camera_selector_cycles():
    sel = CameraSelector(2)
    assert sel.is_free
    sel.select_next()
    assert sel.camera_id == 0
    sel.select_next()
    assert sel.camera_id == 1
    sel.select_next()
    assert sel.is_free
    sel.select_previous()
    assert sel.camera_id == 1


# -- selection + perturbation over a live env ---------------------------------


@pytest.fixture(scope="module")
def cartpole_env():
    import dm_control_tpu.suite as suite

    env = suite.load("cartpole", "swingup")
    env.reset()
    return env


def test_select_and_perturb(cartpole_env):
    from dm_control_tpu.rendering.camera import MovableCamera

    env = cartpole_env
    cam = MovableCamera(env.physics, height=64, width=64)
    viewer = Viewer(cam, env.physics,
                    n_fixed_cameras=int(env.physics.model.ncam))
    # click the center of the view: should hit some geom -> body
    body = viewer.select_at((32, 32))
    assert viewer.manipulator.selected_body == body
    # drag with ctrl (horizontal move mode) builds a perturbation force
    viewer.manipulator.set_move_horizontal_mode(True)
    viewer.manipulator.on_move((32, 32), (20.0, 0.0))
    if body is not None:
        pert = viewer.manipulator.perturbation_force
        assert pert is not None
        bid, force = pert
        assert bid == body and force[0] != 0
        assert apply_perturbation(env, bid, force)
        xf = np.asarray(env._state.data.xfrc_applied)
        assert np.any(xf[bid] != 0)
        # the perturbed env still steps
        ts = env.step(np.zeros(env.action_spec().shape))
        assert np.isfinite(ts.reward)


@pytest.mark.slow
def test_web_gui_end_to_end(cartpole_env):
    from dm_control_tpu.viewer.web_gui import WebViewerServer

    server = WebViewerServer(cartpole_env, width=64, height=48, port=0)
    thread = threading.Thread(target=server.httpd.serve_forever,
                              daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"viewer" in page
        # run a few display ticks, then fetch a frame
        for _ in range(3):
            server.tick(0.04)
        frame = urllib.request.urlopen(base + "/frame", timeout=10).read()
        assert frame[:8] == b"\x89PNG\r\n\x1a\n"
        # orbit the camera through the event endpoint
        az0 = server.camera.get_pose().azimuth
        for ev in [
            {"type": "key", "key": "MouseLeft", "pressed": True,
             "mods": 0},
            {"type": "move", "pos": [10, 10], "delta": [15, 0]},
            {"type": "key", "key": "MouseLeft", "pressed": False,
             "mods": 0},
            {"type": "key", "key": " ", "pressed": True, "mods": 0},
        ]:
            urllib.request.urlopen(urllib.request.Request(
                base + "/event", data=json.dumps(ev).encode(),
                method="POST"), timeout=10).read()
        assert server.camera.get_pose().azimuth != az0
        assert server.paused  # space toggled pause
        status = json.loads(urllib.request.urlopen(
            base + "/status", timeout=10).read())
        assert status["paused"] is True
        assert status["state"] in ("START", "RUNNING", "STOP", "STOPPED")
        assert "fps" in status and "camera" in status  # status pane rows
        # help pane rows (reference views.py HelpPane)
        rows = json.loads(urllib.request.urlopen(
            base + "/help", timeout=10).read())
        assert any("pause" in desc for _k, desc in rows)
        assert any("orbit" in desc for _k, desc in rows)
        # frame capture: PNG with download semantics
        req = urllib.request.urlopen(base + "/capture", timeout=10)
        assert req.headers["Content-Disposition"].startswith("attachment")
        assert req.read()[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        server.httpd.shutdown()
