"""Parity-horizon diagnostic: dog / humanoid_CMU vs the MuJoCo oracle.

Round-4 claim (tests/test_suite_parity.py EXACT table): the short dog/CMU
horizons end at the first contact-FORMATION boundary — a ~1e-13 state
difference legitimately flips contact onset there, after which
trajectories diverge discontinuously.  This script produces the
predicted artifact: per-step max |obs| error alongside the oracle's
active contact count; the error must stay flat until the step where
ncon changes, then jump.

Run: JAX_PLATFORM_NAME=cpu python docs/parity_horizon.py dog:stand 25
"""

import os
import sys

os.environ.setdefault("MUJOCO_GL", "disabled")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main():
    domain, task = (sys.argv[1] if len(sys.argv) > 1
                    else "dog:stand").split(":")
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    import dm_control.suite as ref_suite

    import dm_control_tpu.suite as tpu_suite

    seed = 42
    env_r = ref_suite.load(domain, task, task_kwargs={"random": seed})
    env_t = tpu_suite.load(domain, task, task_kwargs={"random": seed})
    env_r.reset()
    env_t.reset()
    rng = np.random.RandomState(0)
    spec = env_r.action_spec()
    prev_ncon = int(env_r.physics.data.ncon)
    print(f"{domain}:{task} f64 parity horizon (seed {seed})")
    print("step  max_obs_err   reward_err   ncon  contact_set_changed")
    for i in range(n_steps):
        act = rng.uniform(np.maximum(spec.minimum, -1),
                          np.minimum(spec.maximum, 1))
        pairs_before = {(int(c[0]), int(c[1])) for c in
                        zip(env_r.physics.data.contact.geom1,
                            env_r.physics.data.contact.geom2)}
        tr = env_r.step(act)
        tt = env_t.step(act)
        ncon = int(env_r.physics.data.ncon)
        pairs_after = {(int(c[0]), int(c[1])) for c in
                       zip(env_r.physics.data.contact.geom1,
                           env_r.physics.data.contact.geom2)}
        err = max(float(np.max(np.abs(np.asarray(tt.observation[k])
                                      - np.asarray(tr.observation[k]))))
                  for k in tr.observation)
        rerr = abs(float(tr.reward) - float(tt.reward))
        changed = "*" if pairs_after != pairs_before else ""
        print(f"{i:4d}  {err:11.3e}  {rerr:11.3e}  {ncon:4d}  {changed}",
              flush=True)
        prev_ncon = ncon


if __name__ == "__main__":
    main()
