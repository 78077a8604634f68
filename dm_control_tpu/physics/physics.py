"""Stateful Physics facade: the ergonomic analogue of mujoco.Physics.

Reference: dm_control/mujoco/engine.py:86-592 — step/forward/reset, state
get/set, named indexing.  Internally everything is the functional
(Model, Data) core; this class adds convenience state-holding and
host-side named views (the analogue of dm_control/mujoco/index.py).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.physics import engine
from dm_control_tpu.physics.model import Data, JointType, Model, make_data
from dm_control_tpu.rl import control as rl_control

# Data/Model field → name namespace and address resolution.
_FIELD_NAMESPACES = {
    "qpos": ("joint", "qpos"),
    "qvel": ("joint", "dof"),
    "qfrc_applied": ("joint", "dof"),
    "xpos": ("body", None),
    "xquat": ("body", None),
    "xmat": ("body", None),
    "xipos": ("body", None),
    "subtree_com": ("body", None),
    "geom_xpos": ("geom", None),
    "geom_xmat": ("geom", None),
    "site_xpos": ("site", None),
    "site_xmat": ("site", None),
    "ctrl": ("actuator", None),
    "actuator_force": ("actuator", None),
    "sensordata": ("sensor", "sensor"),
    "ten_length": ("tendon", None),
}


class PhysicsError(RuntimeError):
    """Physics diverged (reference rl/control.py:264)."""


class Physics:
    """Holds (Model, Data) with jitted step/forward."""

    def __init__(self, model: Model, data: Optional[Data] = None):
        self._model = model
        self._data = data if data is not None else make_data(model)
        self._fns = {}
        self._dirty = False

    # -- dirty/lazy-forward protocol (reference mjcf/physics.py:536-545) ----

    @property
    def is_dirty(self) -> bool:
        return self._dirty

    def mark_as_dirty(self) -> None:
        """State or model was written: derived quantities are stale until
        the next forward()."""
        self._dirty = True

    def _ensure_clean(self) -> None:
        if self._dirty:
            self.forward()

    def _invalidate_fns(self) -> None:
        """Model arrays changed identity: drop jit handles keyed on the
        old model object (recompile is avoided by XLA's shape-keyed cache
        when only values changed)."""
        self._fns = {}

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_model(cls, model: Model) -> "Physics":
        return cls(model)

    @classmethod
    def from_xml_string(cls, xml: str, assets=None) -> "Physics":
        from dm_control_tpu import mjcf

        return cls(mjcf.compile_xml_string(xml, assets=assets))

    @classmethod
    def from_mjcf_model(cls, element) -> "Physics":
        from dm_control_tpu.mjcf.compiler import compile_model

        return cls(compile_model(element))

    # -- core ---------------------------------------------------------------

    @property
    def model(self) -> Model:
        return self._model

    @property
    def data(self) -> Data:
        return self._data

    def _fn(self, name, builder):
        key = (name, id(self._model))
        if key not in self._fns:
            self._fns[key] = jax.jit(builder(self._model))
        return self._fns[key]

    def step(self, n_steps: int = 1):
        step = self._fn("step", lambda m: (lambda d: engine.step(m, d)))
        for _ in range(n_steps):
            self._data = step(self._data)
        if bool(engine.check_divergence(self._model, self._data)):
            raise PhysicsError("Physics state is invalid (divergence).")

    def forward(self):
        fwd = self._fn("forward", lambda m: (lambda d: engine.forward(m, d)))
        self._data = fwd(self._data)
        self._dirty = False

    def after_reset(self):
        """Runs the position/velocity stages (the reference's mj_forward
        after a state write, engine.py:268-295)."""
        self.forward()

    def render(self, height: int = 240, width: int = 320, camera_id=-1,
               overlays=(), depth: bool = False, segmentation: bool = False,
               scene_option=None, render_flag_overrides=None,
               scene_callback=None):
        """Ray-cast render (reference Physics.render, engine.py:168-217).

        Returns uint8 (H, W, 3) RGB, float32 (H, W) plane depth in
        meters, or int32 (H, W, 2) [objid, objtype] segmentation."""
        from dm_control_tpu import rendering
        return rendering.render(
            self, height=height, width=width, camera_id=camera_id,
            depth=depth, segmentation=segmentation)

    def reset(self):
        self._data = make_data(self._model)
        self.forward()

    @contextlib.contextmanager
    def reset_context(self):
        """Reference pattern: mutate state inside, forward on exit
        (rl/control.py:226-247)."""
        self._data = make_data(self._model)
        yield self
        self.forward()

    def copy(self, share_model: bool = True):
        del share_model  # models are immutable pytrees; always shared
        return Physics(self._model, self._data)

    # -- state --------------------------------------------------------------

    def time(self) -> float:
        return float(self._data.time)

    def get_state(self) -> np.ndarray:
        """[qpos, qvel, act] (reference engine.py:217-245)."""
        d = self._data
        return np.concatenate([np.asarray(d.qpos), np.asarray(d.qvel),
                               np.asarray(d.act)])

    def set_state(self, physics_state):
        m = self._model
        qpos = physics_state[:m.nq]
        qvel = physics_state[m.nq:m.nq + m.nv]
        act = physics_state[m.nq + m.nv:]
        self._data = self._data.replace(
            qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
            act=jnp.asarray(act))
        self.mark_as_dirty()

    def set_control(self, action):
        self._data = self._data.replace(
            ctrl=jnp.asarray(np.asarray(action),
                             self._data.ctrl.dtype))

    def position(self):
        return np.asarray(self._data.qpos)

    def velocity(self):
        return np.asarray(self._data.qvel)

    def control(self):
        return np.asarray(self._data.ctrl)

    def activation(self):
        return np.asarray(self._data.act)

    def action_spec(self):
        return rl_control.action_spec(self._model)

    # -- named access -------------------------------------------------------

    @property
    def named(self):
        """``physics.named.data.qpos['hinge']``-style FieldIndexer views
        incl. ragged axes and named columns (reference mujoco/index.py)."""
        from dm_control_tpu.physics.index import Named

        return Named(self)

    def named_field(self, kind: str, names):
        """Named view into a Data/Model field (the analogue of
        physics.named.data.<field>[names], dm_control/mujoco/index.py:436).
        """
        m = self._model
        if callable(names):
            return names(self)
        source = self._data if hasattr(self._data, kind) else m
        field = getattr(source, kind)
        namespace, addr = _FIELD_NAMESPACES.get(kind, (None, None))
        if namespace is None:
            raise KeyError(f"No named view for field {kind!r}")
        single = isinstance(names, str)
        name_list = [names] if single else list(names)
        rows = []
        for name in name_list:
            idx = getattr(m.names, namespace)[name]
            if addr == "qpos":
                a = m.jnt_qposadr[idx]
                w = JointType(m.jnt_type[idx]).qpos_width
                rows.append(field[a:a + w] if w > 1 else field[a])
            elif addr == "dof":
                a = m.jnt_dofadr[idx]
                w = JointType(m.jnt_type[idx]).dof_width
                rows.append(field[a:a + w] if w > 1 else field[a])
            elif addr == "sensor":
                a, dim = m.sensor_adr[idx], m.sensor_dim[idx]
                rows.append(field[a:a + dim])
            else:
                rows.append(field[idx])
        if single:
            return np.asarray(rows[0])
        return np.asarray(jnp.stack([jnp.atleast_1d(r) for r in rows])) \
            if all(np.shape(r) == np.shape(rows[0]) for r in rows) \
            else [np.asarray(r) for r in rows]

    # -- body pose helpers (composer entities) ------------------------------

    def body_pose(self, body_name: str):
        self._ensure_clean()
        b = self._model.names.body[body_name]
        return (np.asarray(self._data.xpos[b]),
                np.asarray(self._data.xquat[b]))

    def set_body_pose(self, body_name: str, position=None, quaternion=None):
        """Writes a free body's pose into qpos (body must have a free
        joint)."""
        m = self._model
        b = m.names.body[body_name]
        jadr = m.body_jntadr[b]
        if jadr < 0 or m.jnt_type[jadr] != int(JointType.FREE):
            raise ValueError(
                f"Body {body_name!r} has no free joint; cannot set pose.")
        qadr = m.jnt_qposadr[jadr]
        qpos = self._data.qpos
        if position is not None:
            qpos = qpos.at[qadr:qadr + 3].set(jnp.asarray(position))
        if quaternion is not None:
            qpos = qpos.at[qadr + 3:qadr + 7].set(jnp.asarray(quaternion))
        self._data = self._data.replace(qpos=qpos)
        self.mark_as_dirty()

    def set_body_velocity(self, body_name: str, velocity=None,
                          angular_velocity=None):
        """Writes a free body's linear/angular velocity into qvel
        (reference composer/entity.py set_velocity free-joint branch)."""
        m = self._model
        b = m.names.body[body_name]
        jadr = m.body_jntadr[b]
        if jadr < 0 or m.jnt_type[jadr] != int(JointType.FREE):
            raise ValueError(
                f"Body {body_name!r} has no free joint; cannot set velocity.")
        dadr = m.jnt_dofadr[jadr]
        qvel = self._data.qvel
        if velocity is not None:
            v = jnp.broadcast_to(jnp.asarray(velocity, qvel.dtype), (3,))
            qvel = qvel.at[dadr:dadr + 3].set(v)
        if angular_velocity is not None:
            w = jnp.broadcast_to(
                jnp.asarray(angular_velocity, qvel.dtype), (3,))
            qvel = qvel.at[dadr + 3:dadr + 6].set(w)
        self._data = self._data.replace(qvel=qvel)
        self.mark_as_dirty()

    def bind(self, elements):
        """Returns a read/write attribute Binding for MJCF element(s)
        (reference mjcf/physics.py:560): ``physics.bind(geom).xpos``,
        ``physics.bind(joint).qpos = ...`` with the dirty/lazy-forward
        protocol.  Accepts Elements or (namespace-qualified) name strings
        (treated as bodies)."""
        from dm_control_tpu.mjcf.physics import bind as _bind

        return _bind(self, elements)

    def bind_id(self, element_or_name, kind: str = "body"):
        """The raw id of a named element for array indexing."""
        name = element_or_name if isinstance(element_or_name, str) \
            else element_or_name.get("name")
        return getattr(self._model.names, kind)[name]
