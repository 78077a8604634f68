"""Camera pose + render entry points mirroring dm_control's Camera.

Reference surface: dm_control/mujoco/engine.py:593-983 (Camera,
Physics.render) and mj_camlight's camera-mode semantics.  Pose math is
host-side numpy (cheap, once per frame); the pixel loop is the jitted
ray-cast core in rendering/raster.py.
"""

from __future__ import annotations

import collections
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.physics.model import GeomType
from dm_control_tpu.rendering import raster

# mjv defaults (mjVisual.global_): free-camera fovy/azimuth/elevation.
_DEFAULT_FOVY = 45.0
_DEFAULT_AZIMUTH = 90.0
_DEFAULT_ELEVATION = -45.0


def _quat_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _lookat_frame(zaxis):
    """Camera rotation whose -z looks along -zaxis, world-up aligned."""
    z = zaxis / max(np.linalg.norm(zaxis), 1e-12)
    up = np.array([0.0, 0.0, 1.0])
    if abs(z @ up) > 0.9999:
        up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= max(np.linalg.norm(x), 1e-12)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=1)


def camera_pose(physics, camera_id: int):
    """(pos (3,), mat (3,3) world<-cam, fovy) for a model camera or the
    default free camera (camera_id == -1)."""
    m, d = physics.model, physics.data
    if camera_id == -1:
        center = np.asarray(m.stat.center, np.float64)
        extent = float(m.stat.extent)
        az = np.deg2rad(_DEFAULT_AZIMUTH)
        el = np.deg2rad(_DEFAULT_ELEVATION)
        forward = np.array([np.cos(el) * np.cos(az),
                            np.cos(el) * np.sin(az),
                            np.sin(el)])
        pos = center - forward * 1.5 * extent
        return pos, _lookat_frame(-forward), _DEFAULT_FOVY

    if not (0 <= camera_id < m.ncam):
        raise ValueError(f"camera_id {camera_id} out of range "
                         f"(ncam={m.ncam})")
    b = int(m.cam_bodyid[camera_id])
    mode = int(m.cam_mode[camera_id])
    xpos = np.asarray(d.xpos[b], np.float64)
    xmat = np.asarray(d.xmat[b], np.float64)
    off = np.asarray(m.cam_pos[camera_id], np.float64)
    cmat = _quat_to_mat(np.asarray(m.cam_quat[camera_id], np.float64))
    fovy = float(m.cam_fovy[camera_id])

    if mode == 0:  # fixed
        return xpos + xmat @ off, xmat @ cmat, fovy
    if mode == 1:  # track: constant world offset + orientation from qpos0
        return (xpos + np.asarray(m.cam_pos0[camera_id], np.float64),
                np.asarray(m.cam_mat0[camera_id], np.float64), fovy)
    if mode == 2:  # trackcom
        com = np.asarray(d.subtree_com[b], np.float64)
        return (com + np.asarray(m.cam_poscom0[camera_id], np.float64),
                np.asarray(m.cam_mat0[camera_id], np.float64), fovy)
    # targetbody / targetbodycom: fixed position, orientation follows target
    pos = xpos + xmat @ off
    tb = int(m.cam_targetbodyid[camera_id])
    if tb < 0:
        return pos, xmat @ cmat, fovy
    if mode == 4:
        target = np.asarray(d.subtree_com[tb], np.float64)
    else:
        target = np.asarray(d.xpos[tb], np.float64)
    return pos, _lookat_frame(pos - target), fovy


def _ray_directions(mat, fovy, height, width):
    tan_v = np.tan(np.deg2rad(fovy) * 0.5)
    tan_h = tan_v * width / height
    xs = (2.0 * (np.arange(width) + 0.5) / width - 1.0) * tan_h
    ys = (1.0 - 2.0 * (np.arange(height) + 0.5) / height) * tan_v
    xx, yy = np.meshgrid(xs, ys)  # (H, W)
    dirs = np.stack([xx, yy, -np.ones_like(xx)], axis=-1).reshape(-1, 3)
    dirs = dirs @ mat.T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs


def _scene_arrays(physics):
    """Geom pose/size/color arrays with hfield boxes substituted."""
    m, d = physics.model, physics.data
    pos = np.asarray(d.geom_xpos, np.float64).copy()
    mat = np.asarray(d.geom_xmat, np.float64)
    size = np.asarray(m.geom_size, np.float64).copy()
    types = tuple(int(t) for t in m.geom_type)
    if m.nhfield:
        hsize = np.asarray(m.hfield_size, np.float64)
        for g, gt in enumerate(types):
            if gt == int(GeomType.HFIELD) and m.geom_dataid[g] >= 0:
                rx, ry, elev, base = hsize[m.geom_dataid[g]]
                size[g] = [rx, ry, 0.5 * (elev + base)]
                pos[g] = pos[g] + mat[g] @ np.array(
                    [0.0, 0.0, 0.5 * (elev - base)])
    return pos, mat, size, types


class Camera:
    """Ray-cast camera over a Physics, mirroring engine.Camera."""

    def __init__(self, physics, height: int = 240, width: int = 320,
                 camera_id: Union[int, str] = -1, **_unused):
        if isinstance(camera_id, str):
            camera_id = physics.model.names.camera[camera_id]
        self._physics = physics
        self._height = height
        self._width = width
        self._camera_id = int(camera_id)

    @property
    def height(self):
        return self._height

    @property
    def width(self):
        return self._width

    @property
    def matrix(self) -> np.ndarray:
        """3x4 world→pixel projection (engine.py:816 Camera.matrix)."""
        pos, rot, fovy = camera_pose(self._physics, self._camera_id)
        # image plane at focal length f (pixels), principal point centered
        focal = 0.5 * self._height / np.tan(np.deg2rad(fovy) * 0.5)
        image = np.array([[-focal, 0, 0.5 * (self._width - 1)],
                          [0, focal, 0.5 * (self._height - 1)],
                          [0, 0, 1.0]])
        # world→camera: x_cam = R^T (x - pos); camera looks along -z
        ext = np.hstack([rot.T, -(rot.T @ pos)[:, None]])
        return image @ ext

    def _world_pose(self):
        return camera_pose(self._physics, self._camera_id)

    def render(self, depth: bool = False, segmentation: bool = False,
               scene_option=None, render_flag_overrides=None):
        if depth and segmentation:
            raise ValueError("depth and segmentation are exclusive")
        phys = self._physics
        m = phys.model
        pos, rot, fovy = self._world_pose()
        dirs = _ray_directions(rot, fovy, self._height, self._width)
        gpos, gmat, gsize, gtypes = _scene_arrays(phys)
        f32 = jnp.float32
        kdop = None
        if getattr(m, "nmesh", 0):
            sup = np.asarray(m.mesh_kdop, np.float32)
            kdop = np.zeros((len(gtypes), sup.shape[1]), np.float32)
            for g, gt in enumerate(gtypes):
                if gt == int(GeomType.MESH) and m.geom_dataid[g] >= 0:
                    kdop[g] = sup[m.geom_dataid[g]]
            kdop = jnp.asarray(kdop)
        rgb, zdist, segid = raster.render_rays(
            jnp.asarray(pos, f32), jnp.asarray(dirs, f32),
            jnp.asarray(gpos, f32), jnp.asarray(gmat, f32),
            jnp.asarray(gsize, f32),
            jnp.asarray(np.asarray(m.geom_rbound, np.float32)),
            jnp.asarray(np.asarray(m.geom_rgba, np.float32)),
            gtypes, geom_kdop=kdop)
        if segmentation:
            return raster.segmentation_image(segid, self._height, self._width)
        if depth:
            # plane depth: distance along the camera's forward (-z) axis
            forward = -rot[:, 2]
            along = np.asarray(zdist) * (dirs @ forward).astype(np.float32)
            return along.reshape(self._height, self._width)
        return np.asarray(rgb).reshape(self._height, self._width, 3)


class Pose(collections.namedtuple("Pose",
                                  ("lookat", "distance", "azimuth",
                                   "elevation"))):
    """Camera pose (reference engine.py:929 Pose namedtuple)."""
    __slots__ = ()


class MovableCamera(Camera):
    """A camera with an explicit, settable free-camera pose
    (reference engine.py:939 MovableCamera)."""

    def __init__(self, physics, height: int = 240, width: int = 320,
                 **_unused):
        super().__init__(physics, height, width, camera_id=-1)
        m = physics.model
        center = np.asarray(m.stat.center, np.float64)
        extent = float(m.stat.extent)
        self._pose = Pose(lookat=center, distance=1.5 * extent,
                          azimuth=_DEFAULT_AZIMUTH,
                          elevation=_DEFAULT_ELEVATION)

    def get_pose(self) -> Pose:
        return self._pose

    def set_pose(self, lookat, distance, azimuth, elevation):
        self._pose = Pose(lookat=np.asarray(lookat, np.float64),
                          distance=float(distance),
                          azimuth=float(azimuth),
                          elevation=float(elevation))

    def _world_pose(self):
        az = np.deg2rad(self._pose.azimuth)
        el = np.deg2rad(self._pose.elevation)
        forward = np.array([np.cos(el) * np.cos(az),
                            np.cos(el) * np.sin(az),
                            np.sin(el)])
        pos = np.asarray(self._pose.lookat) - forward * self._pose.distance
        return pos, _lookat_frame(-forward), _DEFAULT_FOVY


def render(physics, height: int = 240, width: int = 320,
           camera_id: Union[int, str] = -1, overlays=(), depth: bool = False,
           segmentation: bool = False, scene_option=None,
           render_flag_overrides=None, scene_callback=None):
    """Functional form of Physics.render (engine.py:168-217)."""
    cam = Camera(physics, height, width, camera_id)
    return cam.render(depth=depth, segmentation=segmentation)
