"""Model and Data pytrees: the analogues of mjModel / mjData.

The reference wraps mjModel/mjData C structs via ctypes
(dm_control/mujoco/wrapper/core.py:444,630).  Here the model is an
ahead-of-time-compiled pytree:

- *structural* fields (tree topology, joint/geom types, addresses) are
  **static** python tuples — they drive trace-time code generation, so the
  compiled XLA program is specialized to the model's structure with no
  dynamic indexing on the hot path;
- *numeric* fields (positions, masses, gains, ranges) are array leaves —
  they can be batched, donated, or domain-randomized without retracing.

``Data`` is a pure pytree of arrays for a single environment; batching is
``jax.vmap`` over ``Data`` with a shared ``Model``.

Field names follow mjModel/mjData so parity against the reference can be
checked mechanically.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Enums (values match MuJoCo's mjtJoint/mjtGeom/... so compiled models can be
# diffed against a mujoco oracle in tests).
# ---------------------------------------------------------------------------


class JointType(enum.IntEnum):
    FREE = 0
    BALL = 1
    SLIDE = 2
    HINGE = 3

    @property
    def dof_width(self) -> int:
        return {0: 6, 1: 3, 2: 1, 3: 1}[int(self)]

    @property
    def qpos_width(self) -> int:
        return {0: 7, 1: 4, 2: 1, 3: 1}[int(self)]


class GeomType(enum.IntEnum):
    PLANE = 0
    HFIELD = 1
    SPHERE = 2
    CAPSULE = 3
    ELLIPSOID = 4
    CYLINDER = 5
    BOX = 6
    MESH = 7


class TrnType(enum.IntEnum):
    JOINT = 0
    JOINTINPARENT = 1
    SLIDERCRANK = 2
    TENDON = 3
    SITE = 4
    BODY = 5


class DynType(enum.IntEnum):
    NONE = 0
    INTEGRATOR = 1
    FILTER = 2
    FILTEREXACT = 3
    MUSCLE = 4


class GainType(enum.IntEnum):
    FIXED = 0
    AFFINE = 1
    MUSCLE = 2


class BiasType(enum.IntEnum):
    NONE = 0
    AFFINE = 1
    MUSCLE = 2


class IntegratorType(enum.IntEnum):
    EULER = 0
    RK4 = 1
    IMPLICIT = 2
    IMPLICITFAST = 3


class ConeType(enum.IntEnum):
    PYRAMIDAL = 0
    ELLIPTIC = 1


class SolverType(enum.IntEnum):
    PGS = 0
    CG = 1
    NEWTON = 2


class EqType(enum.IntEnum):
    CONNECT = 0
    WELD = 1
    JOINT = 2
    TENDON = 3
    DISTANCE = 4


class WrapType(enum.IntEnum):
    NONE = 0
    JOINT = 1
    PULLEY = 2
    SITE = 3
    SPHERE = 4
    CYLINDER = 5


class SensorType(enum.IntEnum):
    """Subset of mjtSensor covering the reference suite's needs."""

    TOUCH = 0
    ACCELEROMETER = 1
    VELOCIMETER = 2
    GYRO = 3
    FORCE = 4
    TORQUE = 5
    MAGNETOMETER = 6
    RANGEFINDER = 7
    JOINTPOS = 8
    JOINTVEL = 9
    TENDONPOS = 10
    TENDONVEL = 11
    ACTUATORPOS = 12
    ACTUATORVEL = 13
    ACTUATORFRC = 14
    BALLQUAT = 15
    BALLANGVEL = 16
    FRAMEPOS = 17
    FRAMEQUAT = 18
    FRAMEXAXIS = 19
    FRAMEYAXIS = 20
    FRAMEZAXIS = 21
    FRAMELINVEL = 22
    FRAMEANGVEL = 23
    FRAMELINACC = 24
    FRAMEANGACC = 25
    SUBTREECOM = 26
    SUBTREELINVEL = 27
    SUBTREEANGMOM = 28


class ObjType(enum.IntEnum):
    """mjtObj subset used for sensor attachment / named references."""

    BODY = 1
    XBODY = 2
    JOINT = 3
    GEOM = 5
    SITE = 6
    CAMERA = 7


class DisableBit(enum.IntFlag):
    """mjtDisableBit: option.disableflags."""

    CONSTRAINT = 1 << 0
    EQUALITY = 1 << 1
    FRICTIONLOSS = 1 << 2
    LIMIT = 1 << 3
    CONTACT = 1 << 4
    PASSIVE = 1 << 5
    GRAVITY = 1 << 6
    CLAMPCTRL = 1 << 7
    WARMSTART = 1 << 8
    FILTERPARENT = 1 << 9
    ACTUATION = 1 << 10
    REFSAFE = 1 << 11


# ---------------------------------------------------------------------------
# Pytree dataclass machinery.
# ---------------------------------------------------------------------------


def static_field(**kwargs):
    """A dataclass field stored as pytree *metadata* (static, hashable)."""
    return dataclasses.field(metadata={"static": True}, **kwargs)


def pytree_dataclass(cls):
    """Registers a frozen dataclass as a pytree, honoring ``static_field``."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = replace
    return cls


def _t(x) -> Tuple:
    """Converts array-likes to nested tuples for static storage."""
    if hasattr(x, "tolist"):
        x = x.tolist()
    if isinstance(x, (list, tuple)):
        return tuple(_t(v) for v in x)
    return x


@pytree_dataclass
class Option:
    """Physics options (mjOption analogue, mujoco/mjmodel.h mjOption)."""

    # Array leaves — can differ across a batch / be randomized.
    timestep: jax.Array
    gravity: jax.Array  # (3,)
    wind: jax.Array  # (3,)
    magnetic: jax.Array  # (3,)
    density: jax.Array  # ()
    viscosity: jax.Array  # ()
    impratio: jax.Array  # ()
    tolerance: jax.Array  # () solver early-exit threshold
    o_margin: jax.Array
    o_solref: jax.Array  # (2,)
    o_solimp: jax.Array  # (5,)
    # Static solver configuration.
    integrator: int = static_field(default=int(IntegratorType.EULER))
    cone: int = static_field(default=int(ConeType.PYRAMIDAL))
    solver: int = static_field(default=int(SolverType.NEWTON))
    iterations: int = static_field(default=100)
    ls_iterations: int = static_field(default=50)
    noslip_iterations: int = static_field(default=0)
    disableflags: int = static_field(default=0)
    # Throughput knob (f32 batched path only): keep at most this many
    # contacts per condim group in the constraint system, selected per
    # environment by penetration depth (top-k).  0 = keep every
    # candidate (MuJoCo-faithful; the f64 parity path always does).
    # Models whose broadphase admits hundreds of candidate pairs of
    # which only a handful touch (e.g. the Jaco arm's 156 pairs) spend
    # most of the solver on rows whose force is identically zero; a cap
    # of ~2-4x the realistic simultaneous-contact count recovers that
    # time without changing the dynamics.
    contact_cap: int = static_field(default=0)

    @classmethod
    def default(cls, dtype=jnp.float64) -> "Option":
        z3 = jnp.zeros(3, dtype)
        return cls(
            timestep=jnp.asarray(0.002, dtype),
            gravity=jnp.array([0.0, 0.0, -9.81], dtype),
            wind=z3,
            magnetic=jnp.array([0.0, -0.5, 0.0], dtype),
            density=jnp.asarray(0.0, dtype),
            viscosity=jnp.asarray(0.0, dtype),
            impratio=jnp.asarray(1.0, dtype),
            tolerance=jnp.asarray(1e-8, dtype),
            o_margin=jnp.asarray(0.0, dtype),
            o_solref=jnp.array([0.02, 1.0], dtype),
            o_solimp=jnp.array([0.9, 0.95, 0.001, 0.5, 2.0], dtype),
        )


@pytree_dataclass
class Statistic:
    """Model statistics (mjStatistic): set by the compiler or the XML."""

    meaninertia: jax.Array
    meanmass: jax.Array
    meansize: jax.Array
    extent: jax.Array
    center: jax.Array  # (3,)


@pytree_dataclass
class Model:
    """Static, compiled physics model: the mjModel analogue.

    Structural fields are python tuples (pytree metadata); numeric fields
    are jnp arrays (pytree leaves).  Produced by
    ``dm_control_tpu.mjcf.compiler``.
    """

    # ---- sizes (static ints) ----
    nq: int = static_field()
    nv: int = static_field()
    nu: int = static_field()
    na: int = static_field()
    nbody: int = static_field()
    njnt: int = static_field()
    ngeom: int = static_field()
    nsite: int = static_field()
    ntendon: int = static_field()
    nwrap: int = static_field()
    nsensor: int = static_field()
    nsensordata: int = static_field()
    neq: int = static_field()
    ncam: int = static_field()

    # ---- options / statistics ----
    opt: Option = None
    stat: Statistic = None

    # ---- reference configuration ----
    qpos0: jax.Array = None  # (nq,)
    qpos_spring: jax.Array = None  # (nq,)

    # ---- bodies ----
    body_parentid: Tuple[int, ...] = static_field(default=())
    body_rootid: Tuple[int, ...] = static_field(default=())
    body_weldid: Tuple[int, ...] = static_field(default=())
    body_jntadr: Tuple[int, ...] = static_field(default=())
    body_jntnum: Tuple[int, ...] = static_field(default=())
    body_dofadr: Tuple[int, ...] = static_field(default=())
    body_dofnum: Tuple[int, ...] = static_field(default=())
    body_geomadr: Tuple[int, ...] = static_field(default=())
    body_geomnum: Tuple[int, ...] = static_field(default=())
    body_pos: jax.Array = None  # (nbody, 3)
    body_quat: jax.Array = None  # (nbody, 4)
    body_ipos: jax.Array = None  # (nbody, 3)
    body_iquat: jax.Array = None  # (nbody, 4)
    body_mass: jax.Array = None  # (nbody,)
    body_subtreemass: jax.Array = None  # (nbody,)
    body_inertia: jax.Array = None  # (nbody, 3)
    body_invweight0: jax.Array = None  # (nbody, 2)

    # ---- joints ----
    jnt_type: Tuple[int, ...] = static_field(default=())
    jnt_qposadr: Tuple[int, ...] = static_field(default=())
    jnt_dofadr: Tuple[int, ...] = static_field(default=())
    jnt_bodyid: Tuple[int, ...] = static_field(default=())
    jnt_limited: Tuple[int, ...] = static_field(default=())
    jnt_axis: jax.Array = None  # (njnt, 3)
    jnt_pos: jax.Array = None  # (njnt, 3)
    jnt_range: jax.Array = None  # (njnt, 2)
    jnt_margin: jax.Array = None  # (njnt,)
    jnt_stiffness: jax.Array = None  # (njnt,)
    # springdamper (timeconst, dampratio) per joint; both > 0 means the
    # compiler overrides stiffness/damping from reference inertia
    # (MuJoCo joint/@springdamper, applied in engine.set_const)
    jnt_springdamper: Tuple[Tuple[float, float], ...] = static_field(
        default=())
    jnt_solref: jax.Array = None  # (njnt, 2)
    jnt_solimp: jax.Array = None  # (njnt, 5)

    # ---- dofs ----
    dof_bodyid: Tuple[int, ...] = static_field(default=())
    dof_jntid: Tuple[int, ...] = static_field(default=())
    dof_parentid: Tuple[int, ...] = static_field(default=())
    dof_armature: jax.Array = None  # (nv,)
    dof_damping: jax.Array = None  # (nv,)
    dof_frictionloss: jax.Array = None  # (nv,)
    dof_invweight0: jax.Array = None  # (nv,)
    dof_solref: jax.Array = None  # (nv, 2) friction-loss solref
    dof_solimp: jax.Array = None  # (nv, 5)

    # ---- geoms ----
    geom_type: Tuple[int, ...] = static_field(default=())
    geom_contype: Tuple[int, ...] = static_field(default=())
    geom_conaffinity: Tuple[int, ...] = static_field(default=())
    geom_condim: Tuple[int, ...] = static_field(default=())
    geom_bodyid: Tuple[int, ...] = static_field(default=())
    geom_priority: Tuple[int, ...] = static_field(default=())
    geom_size: jax.Array = None  # (ngeom, 3)
    geom_rbound: jax.Array = None  # (ngeom,)
    geom_pos: jax.Array = None  # (ngeom, 3)
    geom_quat: jax.Array = None  # (ngeom, 4)
    geom_friction: jax.Array = None  # (ngeom, 3)
    geom_margin: jax.Array = None  # (ngeom,)
    geom_gap: jax.Array = None  # (ngeom,)
    geom_solmix: jax.Array = None  # (ngeom,)
    geom_solref: jax.Array = None  # (ngeom, 2)
    geom_solimp: jax.Array = None  # (ngeom, 5)
    geom_rgba: jax.Array = None  # (ngeom, 4)

    # ---- heightfields (at most one; elevation data is a normal array
    # leaf so terrain can be regenerated per episode without retracing) ----
    nhfield: int = static_field(default=0)
    hfield_nrow: int = static_field(default=0)
    hfield_ncol: int = static_field(default=0)
    geom_dataid: Tuple[int, ...] = static_field(default=())
    hfield_size: jax.Array = None  # (nhfield, 4) rx, ry, elevation_z, base_z
    hfield_data: jax.Array = None  # (nrow, ncol) normalized [0, 1]
    nmesh: int = static_field(default=0)
    # 26-DOP support values per mesh asset, geom frame (mjcf/mesh.py
    # KDOP_DIRECTIONS); the rasterizer's convex stand-in for triangles
    mesh_kdop: jax.Array = None  # (nmesh, 26)

    # ---- cameras (reference: dm_control/mujoco/engine.py:593 Camera;
    # modes follow mjCAMLIGHT_*: 0 fixed, 1 track, 2 trackcom,
    # 3 targetbody, 4 targetbodycom) ----
    cam_bodyid: Tuple[int, ...] = static_field(default=())
    cam_mode: Tuple[int, ...] = static_field(default=())
    cam_targetbodyid: Tuple[int, ...] = static_field(default=())
    cam_pos: jax.Array = None  # (ncam, 3) body-frame offset
    cam_quat: jax.Array = None  # (ncam, 4) body-frame orientation
    cam_fovy: jax.Array = None  # (ncam,) vertical field of view, degrees
    cam_pos0: jax.Array = None  # (ncam, 3) world offset from body at qpos0
    cam_poscom0: jax.Array = None  # (ncam, 3) offset from subtree com at qpos0
    cam_mat0: jax.Array = None  # (ncam, 3, 3) world orientation at qpos0

    # ---- sites ----
    site_type: Tuple[int, ...] = static_field(default=())
    site_bodyid: Tuple[int, ...] = static_field(default=())
    site_size: jax.Array = None  # (nsite, 3)
    site_pos: jax.Array = None  # (nsite, 3)
    site_quat: jax.Array = None  # (nsite, 4)

    # ---- tendons ----
    tendon_adr: Tuple[int, ...] = static_field(default=())
    tendon_num: Tuple[int, ...] = static_field(default=())
    tendon_limited: Tuple[int, ...] = static_field(default=())
    tendon_range: jax.Array = None  # (ntendon, 2)
    tendon_margin: jax.Array = None  # (ntendon,)
    tendon_stiffness: jax.Array = None  # (ntendon,)
    tendon_damping: jax.Array = None  # (ntendon,)
    tendon_lengthspring: jax.Array = None  # (ntendon, 2)
    tendon_solref_lim: jax.Array = None  # (ntendon, 2)
    tendon_solimp_lim: jax.Array = None  # (ntendon, 5)
    tendon_length0: jax.Array = None  # (ntendon,) length at qpos0
    tendon_invweight0: jax.Array = None  # (ntendon,)
    wrap_type: Tuple[int, ...] = static_field(default=())
    wrap_objid: Tuple[int, ...] = static_field(default=())
    wrap_prm: jax.Array = None  # (nwrap,)

    # ---- actuators ----
    actuator_trntype: Tuple[int, ...] = static_field(default=())
    actuator_dyntype: Tuple[int, ...] = static_field(default=())
    actuator_gaintype: Tuple[int, ...] = static_field(default=())
    actuator_biastype: Tuple[int, ...] = static_field(default=())
    actuator_trnid: Tuple[Tuple[int, int], ...] = static_field(default=())
    actuator_actadr: Tuple[int, ...] = static_field(default=())
    actuator_actnum: Tuple[int, ...] = static_field(default=())
    actuator_ctrllimited: Tuple[int, ...] = static_field(default=())
    actuator_forcelimited: Tuple[int, ...] = static_field(default=())
    actuator_dynprm: jax.Array = None  # (nu, 10)
    actuator_gainprm: jax.Array = None  # (nu, 10)
    actuator_biasprm: jax.Array = None  # (nu, 10)
    actuator_ctrlrange: jax.Array = None  # (nu, 2)
    actuator_forcerange: jax.Array = None  # (nu, 2)
    actuator_gear: jax.Array = None  # (nu, 6)

    # ---- sensors ----
    sensor_type: Tuple[int, ...] = static_field(default=())
    sensor_objtype: Tuple[int, ...] = static_field(default=())
    sensor_objid: Tuple[int, ...] = static_field(default=())
    sensor_adr: Tuple[int, ...] = static_field(default=())
    sensor_dim: Tuple[int, ...] = static_field(default=())
    sensor_cutoff: jax.Array = None  # (nsensor,)

    # ---- equality constraints ----
    eq_type: Tuple[int, ...] = static_field(default=())
    eq_obj1id: Tuple[int, ...] = static_field(default=())
    eq_obj2id: Tuple[int, ...] = static_field(default=())
    eq_active0: Tuple[int, ...] = static_field(default=())
    eq_solref: jax.Array = None  # (neq, 2)
    eq_solimp: jax.Array = None  # (neq, 5)
    eq_data: jax.Array = None  # (neq, 11)

    # ---- precomputed structure (static) ----
    # Bodies grouped by tree depth (level-parallel FK): ((1,2), (3,4,5), ...)
    body_tree_levels: Tuple[Tuple[int, ...], ...] = static_field(default=())
    # Candidate collision pairs after static filtering: ((g1, g2), ...)
    collision_pairs: Tuple[Tuple[int, int], ...] = static_field(default=())
    # Per-dof ancestor mask is derived (see inertia.py) — kept as an array.
    dof_ancestor_mask: jax.Array = None  # (nv, nv) 0/1
    # body_chain_mask[b, j] = 1 if dof j is on body b's kinematic chain
    # (drives vectorized point jacobians)
    body_chain_mask: jax.Array = None  # (nbody, nv) 0/1

    # ---- names (host-side only; static) ----
    names: Any = static_field(default=None)  # NameMap

    # per-episode task state (pytree): populated by apply_model_diff from
    # "_"-prefixed model_diff keys so batched tasks can carry per-env
    # scalars (e.g. a sampled target height) alongside model overrides
    task_state: Any = None

    @property
    def dtype(self):
        return self.qpos0.dtype


class NameMap:
    """Immutable name→id maps per namespace (hashable, compile-time only)."""

    __slots__ = ("body", "joint", "geom", "site", "actuator", "sensor",
                 "tendon", "camera", "equality", "_key")

    def __init__(self, **ns):
        for slot in self.__slots__:
            if slot != "_key":
                object.__setattr__(self, slot, dict(ns.get(slot, {})))
        object.__setattr__(
            self,
            "_key",
            tuple(
                (s, tuple(sorted(getattr(self, s).items())))
                for s in self.__slots__
                if s != "_key"
            ),
        )

    def __setattr__(self, *_):
        raise AttributeError("NameMap is immutable")

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, NameMap) and self._key == other._key


@pytree_dataclass
class Contact:
    """Fixed-size contact arrays (mjContact analogue), one row per candidate
    pair found by the static broadphase.  ``dist > includemargin`` rows are
    inactive; they remain in the arrays with zero impedance (no dynamic
    shapes on the hot path)."""

    dist: jax.Array  # (ncon,)
    pos: jax.Array  # (ncon, 3)
    frame: jax.Array  # (ncon, 3, 3) rows: normal, tangent1, tangent2
    includemargin: jax.Array  # (ncon,)
    friction: jax.Array  # (ncon, 5)
    solref: jax.Array  # (ncon, 2)
    solimp: jax.Array  # (ncon, 5)
    dim: Tuple[int, ...] = static_field(default=())  # condim per row
    geom1: Tuple[int, ...] = static_field(default=())
    geom2: Tuple[int, ...] = static_field(default=())


@pytree_dataclass
class Data:
    """Per-environment dynamic state + computed quantities (mjData analogue).

    A single environment's state; batch simulation vmaps over this pytree.
    """

    # ---- state ----
    time: jax.Array  # ()
    qpos: jax.Array  # (nq,)
    qvel: jax.Array  # (nv,)
    act: jax.Array  # (na,)
    ctrl: jax.Array  # (nu,)
    qfrc_applied: jax.Array  # (nv,)
    xfrc_applied: jax.Array  # (nbody, 6)
    qacc_warmstart: jax.Array  # (nv,)

    # ---- kinematics ----
    xpos: jax.Array  # (nbody, 3)
    xquat: jax.Array  # (nbody, 4)
    xmat: jax.Array  # (nbody, 3, 3)
    xipos: jax.Array  # (nbody, 3)
    ximat: jax.Array  # (nbody, 3, 3)
    geom_xpos: jax.Array  # (ngeom, 3)
    geom_xmat: jax.Array  # (ngeom, 3, 3)
    site_xpos: jax.Array  # (nsite, 3)
    site_xmat: jax.Array  # (nsite, 3, 3)
    subtree_com: jax.Array  # (nbody, 3)
    jnt_xanchor: jax.Array  # (njnt, 3)
    jnt_xaxis: jax.Array  # (njnt, 3)

    # ---- inertia / motion subspace (CoM-centered frames) ----
    cdof: jax.Array  # (nv, 6)
    cinert: jax.Array  # (nbody, 10)
    qM: jax.Array  # (nv, nv) dense joint-space inertia
    qLD: jax.Array  # (nv, nv) Cholesky factor of qM (+ armature)

    # ---- velocity-dependent ----
    cvel: jax.Array  # (nbody, 6)
    cdof_dot: jax.Array  # (nv, 6)
    qfrc_bias: jax.Array  # (nv,)
    qfrc_passive: jax.Array  # (nv,)

    # ---- actuation ----
    actuator_length: jax.Array  # (nu,)
    actuator_moment: jax.Array  # (nu, nv)
    actuator_velocity: jax.Array  # (nu,)
    actuator_force: jax.Array  # (nu,)
    act_dot: jax.Array  # (na,)
    qfrc_actuator: jax.Array  # (nv,)

    # ---- tendons ----
    ten_length: jax.Array  # (ntendon,)
    ten_moment: jax.Array  # (ntendon, nv)
    ten_velocity: jax.Array  # (ntendon,)

    # ---- contacts / constraints ----
    contact: Contact
    contact_force: jax.Array  # (ncon,) normal force per contact row
    contact_force_vec: jax.Array  # (ncon, 6) contact-frame wrench
    # [f_normal, f_t1, f_t2, trq_n, trq_t1, trq_t2] (mj_contactForce)
    qfrc_constraint: jax.Array  # (nv,)

    # ---- acceleration ----
    qfrc_smooth: jax.Array  # (nv,)
    qacc_smooth: jax.Array  # (nv,)
    qacc: jax.Array  # (nv,)

    # ---- sensors / diagnostics ----
    sensordata: jax.Array  # (nsensordata,)
    energy: jax.Array  # (2,) potential, kinetic
    solver_niter: jax.Array  # () iterations used (diagnostic)


def make_data(m: Model, dtype=None) -> Data:
    """Allocates a zero-initialized Data with qpos = qpos0 (mj_makeData)."""
    dtype = dtype or m.qpos0.dtype

    def z(*shape):
        return jnp.zeros(shape, dtype)

    # Contact arrays carry the model's static row structure from the start
    # so Data's pytree structure is invariant across steps (lax loops).
    from dm_control_tpu.physics import collision  # circular-safe: lazy

    contact = collision.empty_contact(m, dtype)
    ncon = len(contact.dim)
    return Data(
        time=jnp.asarray(0.0, dtype),
        qpos=m.qpos0.astype(dtype),
        qvel=z(m.nv),
        act=z(m.na),
        ctrl=z(m.nu),
        qfrc_applied=z(m.nv),
        xfrc_applied=z(m.nbody, 6),
        qacc_warmstart=z(m.nv),
        xpos=z(m.nbody, 3),
        xquat=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (m.nbody, 1)),
        xmat=jnp.tile(jnp.eye(3, dtype=dtype), (m.nbody, 1, 1)),
        xipos=z(m.nbody, 3),
        ximat=jnp.tile(jnp.eye(3, dtype=dtype), (m.nbody, 1, 1)),
        geom_xpos=z(m.ngeom, 3),
        geom_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (m.ngeom, 1, 1)),
        site_xpos=z(m.nsite, 3),
        site_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (m.nsite, 1, 1)),
        subtree_com=z(m.nbody, 3),
        jnt_xanchor=z(m.njnt, 3),
        jnt_xaxis=z(m.njnt, 3),
        cdof=z(m.nv, 6),
        cinert=z(m.nbody, 10),
        qM=z(m.nv, m.nv),
        qLD=z(m.nv, m.nv),
        cvel=z(m.nbody, 6),
        cdof_dot=z(m.nv, 6),
        qfrc_bias=z(m.nv),
        qfrc_passive=z(m.nv),
        actuator_length=z(m.nu),
        actuator_moment=z(m.nu, m.nv),
        actuator_velocity=z(m.nu),
        actuator_force=z(m.nu),
        act_dot=z(m.na),
        qfrc_actuator=z(m.nv),
        ten_length=z(m.ntendon),
        ten_moment=z(m.ntendon, m.nv),
        ten_velocity=z(m.ntendon),
        contact=contact,
        contact_force=z(ncon),
        contact_force_vec=z(ncon, 6),
        qfrc_constraint=z(m.nv),
        qfrc_smooth=z(m.nv),
        qacc_smooth=z(m.nv),
        qacc=z(m.nv),
        sensordata=z(m.nsensordata),
        energy=z(2),
        solver_niter=jnp.asarray(0, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Static tree masks (TPU fast path: subtree/ancestor accumulations become
# one masked matmul on the MXU instead of a per-level scalar-add chain).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _tree_masks_np(parentid: Tuple[int, ...]):
    """(ancestor, subtree) 0/1 masks for a body tree.

    ancestor[i, j] = 1 iff j is an ancestor-or-self of i;
    subtree[i, j]  = 1 iff j is in the subtree rooted at i (= ancestor.T).
    """
    n = len(parentid)
    anc = np.zeros((n, n))
    for i in range(n):
        k = i
        while True:
            anc[i, k] = 1.0
            if k == 0:
                break
            k = parentid[k]
    return anc, anc.T


def body_ancestor_mask(m: "Model") -> np.ndarray:
    return _tree_masks_np(tuple(m.body_parentid))[0]


def body_subtree_mask(m: "Model") -> np.ndarray:
    return _tree_masks_np(tuple(m.body_parentid))[1]


@functools.lru_cache(maxsize=None)
def _body_dof_mask_np(dof_bodyid: Tuple[int, ...], nbody: int):
    """(nbody, nv) 0/1: mask[b, v] = 1 iff dof v belongs to body b."""
    nv = len(dof_bodyid)
    mask = np.zeros((nbody, nv))
    for v, b in enumerate(dof_bodyid):
        mask[b, v] = 1.0
    return mask


def body_dof_mask(m: "Model") -> np.ndarray:
    return _body_dof_mask_np(tuple(int(b) for b in np.asarray(m.dof_bodyid)),
                             m.nbody)


@functools.lru_cache(maxsize=None)
def _dof_before_mask_np(parentid: Tuple[int, ...],
                        body_jntadr: Tuple[int, ...],
                        body_jntnum: Tuple[int, ...],
                        jnt_type: Tuple[int, ...],
                        jnt_dofadr: Tuple[int, ...], nv: int):
    """(before, rotflag) for the vectorized cdof_dot (mj_comVel semantics).

    before[k, j] = 1 iff dof j's velocity contribution is already applied
    when cdof_dot[k] is evaluated in MuJoCo's per-body joint sweep:
    every dof of a strict-ancestor body, every dof of an earlier joint on
    the same body, and — for a free joint's rotational dofs — the joint's
    own translational dofs.  rotflag[k] = 0 for free-joint translational
    dofs (their cdof is constant, cdof_dot = 0).
    """
    nbody = len(parentid)
    before = np.zeros((nv, nv))
    rotflag = np.ones((nv,))
    # chain[b] = dofs applied once body b's sweep is complete
    chain: list = [[] for _ in range(nbody)]
    for b in range(1, nbody):
        applied = list(chain[parentid[b]])
        for j in range(body_jntadr[b], body_jntadr[b] + body_jntnum[b]):
            dadr = jnt_dofadr[j]
            jt = jnt_type[j]
            if jt == int(JointType.FREE):
                for k in range(3):
                    rotflag[dadr + k] = 0.0
                applied += [dadr, dadr + 1, dadr + 2]
                for k in range(3, 6):
                    before[dadr + k, applied] = 1.0
                applied += [dadr + 3, dadr + 4, dadr + 5]
            elif jt == int(JointType.BALL):
                for k in range(3):
                    before[dadr + k, applied] = 1.0
                applied += [dadr, dadr + 1, dadr + 2]
            else:  # HINGE / SLIDE
                before[dadr, applied] = 1.0
                applied.append(dadr)
        chain[b] = applied
    return before, rotflag


def dof_before_mask(m: "Model") -> Tuple[np.ndarray, np.ndarray]:
    return _dof_before_mask_np(
        tuple(int(x) for x in np.asarray(m.body_parentid)),
        tuple(int(x) for x in np.asarray(m.body_jntadr)),
        tuple(int(x) for x in np.asarray(m.body_jntnum)),
        tuple(int(x) for x in np.asarray(m.jnt_type)),
        tuple(int(x) for x in np.asarray(m.jnt_dofadr)), m.nv)
