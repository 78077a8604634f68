"""Contact compaction (opt.contact_cap): capped constraint assembly must
reproduce the full assembly whenever the cap covers every active contact.

The compacted path (physics/constraints._contact_rows_compact) selects the
cap deepest candidates per condim group with per-env top-k, builds
jacobians through the dynamic-bodyid branch of kin.jac_points, and
scatters recovered forces back through traced indices — so it is a
genuinely different code path from the static `_contact_rows`, and these
tests pin their agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dm_control_tpu.suite as suite
from dm_control_tpu.physics import engine
from dm_control_tpu.physics.model import make_data


def _forward_pair(domain, task, cap, perturb):
    env = suite.load(domain, task)
    m = env._model
    d = make_data(m, jnp.float32)
    d = d.replace(qpos=d.qpos + perturb * 0.01,
                  qvel=0.3 * jnp.ones_like(d.qvel))
    if domain == "humanoid":
        d = d.replace(qpos=d.qpos.at[2].add(-0.35))  # feet into the floor
    d_full = jax.jit(lambda d: engine.forward(m, d))(d)
    m_cap = m.replace(opt=m.opt.replace(contact_cap=cap))
    d_cap = jax.jit(lambda d: engine.forward(m_cap, d))(d)
    return d_full, d_cap


@pytest.mark.parametrize("domain,task", [("humanoid", "run"),
                                         ("quadruped", "walk")])
def test_capped_forward_matches_full(domain, task):
    d_full, d_cap = _forward_pair(domain, task, cap=64, perturb=1.0)
    scale = float(jnp.max(jnp.abs(d_full.qacc))) + 1.0
    dev = float(jnp.max(jnp.abs(d_full.qacc - d_cap.qacc)))
    assert dev / scale < 1e-4, (dev, scale)
    # recovered contact normals agree where contacts are active
    cf_dev = float(jnp.max(jnp.abs(
        d_full.contact_force - d_cap.contact_force)))
    cf_scale = float(jnp.max(jnp.abs(d_full.contact_force))) + 1.0
    assert cf_dev / cf_scale < 1e-4, (cf_dev, cf_scale)


def test_cap_covers_all_is_exact_permutation():
    # cap >= every group: the kk==k (no-selection) branch must be an
    # exact row permutation of the full path.  The public gate refuses
    # this combination (it would be pure overhead), so drive the
    # compact builder directly.
    from dm_control_tpu.physics import constraints

    env = suite.load("humanoid", "run")
    m = env._model
    d = make_data(m, jnp.float32)
    d = d.replace(qpos=d.qpos.at[2].add(-0.35),
                  qvel=0.3 * jnp.ones_like(d.qvel))
    d = jax.jit(lambda d: engine.forward(m, d))(d)

    def compact_qacc(d):
        blocks = constraints._Blocks(m, jnp.float32)
        constraints._limit_rows(m, d, blocks)
        sel_spans, selids = constraints._contact_rows_compact(
            m, d, blocks, cap=4096)
        efc = blocks.build((), (), sel_spans, selids)
        from dm_control_tpu.physics import solver
        return solver.solve(m, d, efc).qacc

    qacc_cap = jax.jit(compact_qacc)(d)
    dev = float(jnp.max(jnp.abs(d.qacc - qacc_cap)))
    scale = float(jnp.max(jnp.abs(d.qacc))) + 1.0
    assert dev / scale < 1e-5, (dev, scale)


def test_batched_cap_steps_and_autoselects():
    # auto heuristic: humanoid (177 candidates) stays uncapped — the cap
    # measured 30% SLOWER there (dynamic-gather jacobians); only
    # huge-candidate models engage (see test_cap_selects_deepest)
    env0 = suite.load_batch("humanoid", "run", dtype=jnp.float32)
    assert env0.model.opt.contact_cap == 0
    env = suite.load_batch("humanoid", "run", dtype=jnp.float32,
                           contact_cap=64)
    assert env.model.opt.contact_cap == 64
    key = jax.random.PRNGKey(0)
    state, ts = env.reset(jax.random.split(key, 4))
    acts = 0.3 * jnp.ones((4, env.model.nu), jnp.float32)
    for _ in range(3):
        state, ts = env.step(state, acts)
    assert bool(jnp.all(jnp.isfinite(ts.reward)))
    assert bool(jnp.all(jnp.isfinite(state.data.qpos)))


def test_cap_selects_deepest():
    # manipulation-scale candidate count: the Jaco reach task admits ~670
    # candidates; with cap 64 the selected set must contain every
    # penetrating contact (fewer than 64 at rest)
    import dm_control_tpu.manipulation as manipulation

    env = manipulation.load_batch("reach_site_features", dtype=jnp.float32)
    m = env.model
    assert m.opt.contact_cap == 64
    key = jax.random.PRNGKey(1)
    state, ts = env.reset(jax.random.split(key, 2))
    # the carried Data is stripped to state fields; rebuild a full Data
    d = env._unstrip(jax.tree.map(lambda x: x[0], state.data))
    from dm_control_tpu.physics import constraints

    d_fwd = jax.jit(lambda d: engine.forward(m, d))(d)
    efc = jax.jit(lambda d: constraints.make_constraint(m, d))(d_fwd)
    assert efc.sel_spans, "compaction should engage on the Jaco model"
    sel = set(np.asarray(efc.contact_selids).tolist())
    pe = np.asarray(d_fwd.contact.dist) - np.asarray(
        d_fwd.contact.includemargin)
    active = set(np.nonzero(pe < 0)[0].tolist())
    assert len(active) <= 64
    assert active <= sel, sorted(active - sel)
