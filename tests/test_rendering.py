"""Rendering subsystem tests.

Mirrors the reference's render smoke coverage (dm_control render tests
check shapes/dtypes and camera math, engine_test.py render cases);
golden-image comparison is replaced by analytic checks since the ray
caster is deterministic.
"""

import numpy as np
import pytest

from dm_control_tpu import mjcf as mjcf_tpu
from dm_control_tpu import rendering, suite
from dm_control_tpu.physics.physics import Physics
from dm_control_tpu.suite.wrappers import pixels

_BALL_XML = """
<mujoco>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 .1" rgba=".5 .5 .5 1"/>
    <body name="ball" pos="0 0 1">
      <freejoint/>
      <geom name="ball" type="sphere" size=".2" rgba=".8 .2 .2 1"/>
    </body>
    <camera name="front" pos="0 -3 1" quat="0.7071068 0.7071068 0 0"/>
  </worldbody>
</mujoco>
"""


@pytest.fixture(scope="module")
def ball_physics():
    phys = Physics(mjcf_tpu.compile_xml_string(_BALL_XML))
    phys.forward()
    return phys


def test_rgb_shape_dtype(ball_physics):
    img = ball_physics.render(48, 64, camera_id=0)
    assert img.shape == (48, 64, 3)
    assert img.dtype == np.uint8
    assert img.std() > 1.0  # not a constant image


def test_center_pixel_hits_ball(ball_physics):
    # camera at (0,-3,1) looking along +y, ball at (0,0,1): dead center
    seg = ball_physics.render(49, 65, camera_id=0, segmentation=True)
    assert seg.shape == (49, 65, 2)
    ball_id = ball_physics.model.names.geom["ball"]
    assert seg[24, 32, 0] == ball_id
    assert seg[24, 32, 1] == 5  # mjOBJ_GEOM
    assert seg[0, 0, 0] == -1  # top corner: sky


def test_depth_matches_geometry(ball_physics):
    depth = ball_physics.render(49, 65, camera_id=0, depth=True)
    assert depth.dtype == np.float32
    # ball front face is 3 - 0.2 = 2.8 m from the camera plane
    np.testing.assert_allclose(depth[24, 32], 2.8, atol=0.02)


def test_camera_matrix_projects(ball_physics):
    cam = rendering.Camera(ball_physics, 48, 64, camera_id=0)
    xyz1 = np.array([0.0, 0.0, 1.0, 1.0])  # ball center, homogeneous
    u, v, w = cam.matrix @ xyz1
    assert abs(u / w - (64 - 1) / 2) < 1.0
    assert abs(v / w - (48 - 1) / 2) < 1.0


def test_named_camera_and_free_camera(ball_physics):
    by_name = rendering.Camera(ball_physics, 24, 32, camera_id="front")
    by_id = rendering.Camera(ball_physics, 24, 32, camera_id=0)
    np.testing.assert_array_equal(by_name.render(), by_id.render())
    free = ball_physics.render(24, 32, camera_id=-1)
    assert free.std() > 1.0


def test_trackcom_camera_follows_body():
    env = suite.load("cheetah", "run", task_kwargs={"random": 7})
    env.reset()
    img0 = env.physics.render(32, 48, camera_id=0)
    assert img0.shape == (32, 48, 3) and img0.std() > 1.0
    # mode must be trackcom (reference cheetah.xml camera 'side')
    assert int(env.physics.model.cam_mode[0]) == 2


def test_pixels_wrapper_returns_images():
    env = suite.load("cartpole", "balance", task_kwargs={"random": 3})
    wrapped = pixels.Wrapper(
        env, pixels_only=True,
        render_kwargs={"height": 24, "width": 32, "camera_id": 0})
    ts = wrapped.reset()
    assert ts.observation["pixels"].shape == (24, 32, 3)
    ts = wrapped.step(np.zeros(env.action_spec().shape))
    assert ts.observation["pixels"].dtype == np.uint8


def test_invisible_geoms_skipped(ball_physics):
    # alpha=0 copy of the scene: recolor ball transparent via model edit
    m = ball_physics.model
    rgba = np.asarray(m.geom_rgba).copy()
    ball_id = m.names.geom["ball"]
    rgba[ball_id, 3] = 0.0
    phys2 = Physics(m.replace(geom_rgba=rgba))
    phys2.forward()
    seg = phys2.render(49, 65, camera_id=0, segmentation=True)
    assert seg[24, 32, 0] != ball_id


def test_mujoco_camera_observable(ball_physics):
    from dm_control_tpu.composer.observation import MujocoCamera, Updater

    cam = MujocoCamera("front", height=24, width=32)
    cam.enabled = True
    depth_cam = MujocoCamera("front", height=24, width=32, depth=True)
    depth_cam.enabled = True
    assert cam.array_spec.shape == (24, 32, 3)
    assert depth_cam.array_spec.shape == (24, 32, 1)

    rng = np.random.RandomState(0)
    updater = Updater({"pixels": cam, "depth": depth_cam},
                      physics_steps_per_control_step=1)
    updater.reset(ball_physics, rng)
    obs = updater.get_observation()
    assert obs["pixels"].shape == (24, 32, 3)
    assert obs["pixels"].dtype == np.uint8
    assert obs["depth"].shape == (24, 32, 1)
    assert obs["depth"].dtype == np.float32


_MESH_XML = """
<mujoco>
  <asset>
    <mesh name="octa" vertex="0.3 0 0  -0.3 0 0  0 0.3 0  0 -0.3 0
                              0 0 0.3  0 0 -0.3"/>
  </asset>
  <worldbody>
    <body name="m" pos="0 0 1">
      <freejoint/>
      <geom name="octa" type="mesh" mesh="octa" rgba=".2 .8 .2 1"
            density="1000"/>
    </body>
    <camera name="front" pos="0 -3 1" quat="0.7071068 0.7071068 0 0"/>
  </worldbody>
</mujoco>
"""


def test_mesh_geom_compiles_with_exact_mass():
    """Inline-vertex mesh: hull mass properties match the analytic
    octahedron (V = 4/3 a^3 with a = 0.3 half-diagonal)."""
    phys = Physics(mjcf_tpu.compile_xml_string(_MESH_XML))
    m = phys.model
    a = 0.3
    vol = 4.0 / 3.0 * a ** 3
    body = m.names.body["m"]
    np.testing.assert_allclose(float(np.asarray(m.body_mass)[body]),
                               1000.0 * vol, rtol=1e-6)
    gid = m.names.geom["octa"]
    # rbound = vertex distance; AABB half extents = a
    np.testing.assert_allclose(float(np.asarray(m.geom_rbound)[gid]), a,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.geom_size)[gid], [a, a, a],
                               rtol=1e-5)
    assert m.nmesh == 1 and m.geom_dataid[gid] == 0


def test_mesh_renders_as_convex_silhouette():
    """Mesh pixels come from the 26-DOP, not the bounding sphere: the
    octahedron's silhouette area is about half the sphere's, and the
    center-pixel depth matches the analytic front vertex."""
    phys = Physics(mjcf_tpu.compile_xml_string(_MESH_XML))
    phys.forward()
    seg = rendering.Camera(phys, 96, 96, camera_id=0).render(
        segmentation=True)
    gid = phys.model.names.geom["octa"]
    mesh_px = int(np.sum(seg[..., 0] == gid))
    assert mesh_px > 40  # the mesh is visible

    # same scene with the sphere fallback: count pixels
    from dm_control_tpu.rendering import camera as cam_mod
    from dm_control_tpu.rendering import raster

    m, cam = phys.model, rendering.Camera(phys, 96, 96, camera_id=0)
    pos, rot, fovy = cam._world_pose()
    dirs = cam_mod._ray_directions(rot, fovy, 96, 96)
    gpos, gmat, gsize, gtypes = cam_mod._scene_arrays(phys)
    import jax.numpy as jnp
    f32 = jnp.float32
    _rgb, _z, seg_sphere = raster.render_rays(
        jnp.asarray(pos, f32), jnp.asarray(dirs, f32),
        jnp.asarray(gpos, f32), jnp.asarray(gmat, f32),
        jnp.asarray(gsize, f32),
        jnp.asarray(np.asarray(m.geom_rbound, np.float32)),
        jnp.asarray(np.asarray(m.geom_rgba, np.float32)),
        gtypes, geom_kdop=None)
    sphere_px = int(np.sum(np.asarray(seg_sphere) == gid))
    # projected area ratio octahedron/sphere = (2 a^2/pi) / a^2 ~ 0.64
    assert mesh_px < 0.8 * sphere_px

    # depth at the image center: front vertex at y = -0.3 from center,
    # camera 3m away on -y (the half-pixel grid offset lands on a 45-deg
    # bevel plane of the DOP, shifting depth by ~0.023)
    depth = rendering.Camera(phys, 96, 96, camera_id=0).render(depth=True)
    np.testing.assert_allclose(depth[48, 48], 3.0 - 0.3, atol=0.05)
