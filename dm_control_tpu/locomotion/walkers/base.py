"""Walker entity base classes.

Reference: dm_control/locomotion/walkers/base.py:68-199 (egocentric-frame
transforms + WalkerObservables) and legacy_base.py:31 (end-effector and
sensor conventions).
"""

from __future__ import annotations

import abc

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.composer.observation.observable import Generic


class Walker(composer.Entity):
    """A locomoting entity with a root body and egocentric transforms."""

    def _build_observables(self):
        return WalkerObservables(self)

    def create_root_joints(self, attachment_frame):
        """Adds root joints to the attachment frame (default: freejoint;
        reference walkers override, e.g. BoxHead's planar slides)."""
        from dm_control_tpu.mjcf.element import Element

        attachment_frame.children.insert(0, Element(
            "freejoint", {"name": attachment_frame.get("name") + "_root"},
            parent=attachment_frame))

    @property
    @abc.abstractmethod
    def root_body_name(self) -> str:
        """Name of the root body *within the walker's own model*."""

    def _prefixed(self, name: str) -> str:
        return f"{self.name}/{name}"

    def root_xmat(self, physics):
        return np.asarray(physics.named_field(
            "xmat", self._prefixed(self.root_body_name)))

    def root_xpos(self, physics):
        return np.asarray(physics.named_field(
            "xpos", self._prefixed(self.root_body_name)))

    @property
    def upright_pose(self):
        """(qpos, xpos, xquat) used by UprightInitializer; None entries
        mean 'keep the model default' (reference walkers/base.py)."""
        from dm_control_tpu.locomotion.walkers.initializers import (
            UprightPose,
        )

        return UprightPose(qpos=None, xpos=None, xquat=None)

    def root_linear_velocity(self, physics):
        """World-frame linear velocity of the root (free joint or
        root_x/y/z slide triplet, e.g. soccer BoxHead)."""
        m = physics.model
        frame = self.attachment_frame.get("name") if \
            self.attachment_frame is not None else self.name
        jname = f"{frame}_root"
        if jname in m.names.joint:
            a = int(m.jnt_dofadr[m.names.joint[jname]])
            return np.asarray(physics.data.qvel[a:a + 3])
        out = np.zeros(3)
        for i, axis in enumerate(("x", "y", "z")):
            nm = f"{self.name}/root_{axis}"
            if nm in m.names.joint:
                a = int(m.jnt_dofadr[m.names.joint[nm]])
                out[i] = float(physics.data.qvel[a])
        return out

    def reinitialize_pose(self, physics, random_state):
        """Restores an upright default orientation (the reference routes
        this through walker initializers, walkers/base.py)."""
        del random_state
        pos, _ = self.get_pose(physics)
        try:
            self.set_pose(physics, np.asarray(pos), [1.0, 0.0, 0.0, 0.0])
        except ValueError:
            self.set_pose(physics, np.asarray(pos))

    def transform_vec_to_egocentric_frame(self, physics, vec_in_world):
        """World vector → walker root frame
        (reference walkers/base.py:77)."""
        return np.asarray(vec_in_world) @ self.root_xmat(physics)

    def transform_xmat_to_egocentric_frame(self, physics, xmat):
        return self.root_xmat(physics).T @ np.asarray(xmat)

    def global_vector_to_local_frame(self, physics, vec_in_world):
        return self.transform_vec_to_egocentric_frame(physics, vec_in_world)

    def apply_action(self, physics, action, random_state):
        """Routes a policy action to the walker's actuators
        (reference legacy_base.py)."""
        del random_state
        physics.set_control(action)

    @property
    def action_spec_shape(self):
        return None  # derived from the compiled model's actuators

    # conventions subclasses may override
    @property
    def end_effector_body_names(self):
        return ()

    @property
    def observable_joint_names(self):
        """Joint names (within the walker model) exposed as proprio."""
        return ()


class WalkerObservables(composer.Observables):
    """Standard proprioceptive observables
    (reference walkers/base.py:155-199)."""

    def _build(self):
        super()._build()
        walker = self._entity

        def joints_pos(physics):
            names = [walker._prefixed(j)
                     for j in walker.observable_joint_names]
            return np.asarray(
                [physics.named_field("qpos", n) for n in names])

        def joints_vel(physics):
            names = [walker._prefixed(j)
                     for j in walker.observable_joint_names]
            return np.asarray(
                [physics.named_field("qvel", n) for n in names])

        def world_zaxis(physics):
            # third row of the root frame: gravity direction egocentrically
            return walker.root_xmat(physics)[2, :]

        def body_height(physics):
            return walker.root_xpos(physics)[2]

        def end_effectors_pos(physics):
            root_pos = walker.root_xpos(physics)
            root_mat = walker.root_xmat(physics)
            out = []
            for name in walker.end_effector_body_names:
                p = np.asarray(physics.named_field(
                    "xpos", walker._prefixed(name)))
                out.append((p - root_pos) @ root_mat)
            return np.hstack(out) if out else np.zeros(0)

        self.add_observable("joints_pos", Generic(joints_pos))
        self.add_observable("joints_vel", Generic(joints_vel))
        self.add_observable("world_zaxis", Generic(world_zaxis))
        self.add_observable("body_height", Generic(body_height))
        self.add_observable("end_effectors_pos", Generic(end_effectors_pos))

    @property
    def proprioception(self):
        return [self["joints_pos"], self["joints_vel"],
                self["body_height"], self["end_effectors_pos"]]

    @property
    def kinematic_sensors(self):
        return [self["world_zaxis"]]

    def enable_proprioception(self):
        for obs in self.proprioception + self.kinematic_sensors:
            obs.enabled = True
