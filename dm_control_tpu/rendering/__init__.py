"""TPU-native rendering: jittable ray-cast rasterizer + Camera facade.

Replaces the reference's OpenGL stack (dm_control/_render/ plus
dm_control/mujoco/engine.py:593-983) with an analytic ray caster that
runs as a jax program — no GL context, works headless on any backend.
"""

from dm_control_tpu.rendering.camera import Camera, camera_pose, render

__all__ = ["Camera", "camera_pose", "render"]
