"""Suite task base and named-access helpers.

Replaces dm_control/suite/base.py:24 (``base.Task``) for the functional
core: tasks are pure functions over (Model, Data) with name lookups
resolved to static indices at trace time (the analogue of the reference's
``physics.named`` views, dm_control/mujoco/index.py:264).
"""

from __future__ import annotations

import jax.numpy as jnp

from dm_control_tpu.rl import control
from dm_control_tpu.physics.model import Data, Model

# Column codes for 3x3 frame access, matching the reference's named xmat
# columns ('xx'..'zz', dm_control/mujoco/index.py:105-115).
_MAT = {c1 + c2: (i, j)
        for i, c1 in enumerate("xyz") for j, c2 in enumerate("xyz")}
_XYZ = {"x": 0, "y": 1, "z": 2}


class Task(control.Task):
    """Suite task: adds the named-access helpers used by all domains."""

    #: Deepest pipeline stage the task reads from Data in observation,
    #: REWARD, and TERMINATION (BatchEnv computes all three from the
    #: same post-step recompute): "vel" = position+velocity fields and
    #: pos/vel-stage sensors only (the suite default — most domains read
    #: xpos/xmat/qvel and at most a subtreelinvel/velocimeter sensor),
    #: "acc" = also needs constraint-dependent values (touch/force/
    #: accelerometer sensordata, contact forces, qacc).  BatchEnv trims
    #: its per-control-step recompute accordingly (rl/batch_env.py
    #: _observe); the host path always runs the full pipeline like the
    #: reference.  Domains reading acc-stage sensors (dog, finger,
    #: hopper, manipulator, quadruped, stacker) override this with
    #: "acc" — a subclass whose reward or termination reads acc-stage
    #: values must do the same or those reads see stale/zero data.
    observation_stages = "vel"

    # -- named model/data accessors (static index resolution) ---------------

    @staticmethod
    def body_id(m: Model, name: str) -> int:
        return m.names.body[name]

    @staticmethod
    def xmat(m: Model, d: Data, body: str, code: str):
        i, j = _MAT[code]
        return d.xmat[m.names.body[body], i, j]

    @staticmethod
    def xpos(m: Model, d: Data, body: str, axis: str = None):
        p = d.xpos[m.names.body[body]]
        return p if axis is None else p[_XYZ[axis]]

    @staticmethod
    def xipos(m: Model, d: Data, body: str, axis: str = None):
        p = d.xipos[m.names.body[body]]
        return p if axis is None else p[_XYZ[axis]]

    @staticmethod
    def geom_xpos(m: Model, d: Data, geom: str):
        return d.geom_xpos[m.names.geom[geom]]

    @staticmethod
    def site_xpos(m: Model, d: Data, site: str):
        return d.site_xpos[m.names.site[site]]

    @staticmethod
    def joint_qpos(m: Model, d: Data, joint: str):
        return d.qpos[m.jnt_qposadr[m.names.joint[joint]]]

    @staticmethod
    def joint_qvel(m: Model, d: Data, joint: str):
        return d.qvel[m.jnt_dofadr[m.names.joint[joint]]]

    @staticmethod
    def sensordata(m: Model, d: Data, sensor: str):
        s = m.names.sensor[sensor]
        adr, dim = m.sensor_adr[s], m.sensor_dim[s]
        return d.sensordata[adr:adr + dim]

    @staticmethod
    def set_joint_qpos(m: Model, qpos, joint: str, value):
        adr = m.jnt_qposadr[m.names.joint[joint]]
        if hasattr(qpos, "at"):
            return qpos.at[adr].set(value)
        qpos[adr] = value
        return qpos
