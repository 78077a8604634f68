"""Regenerates cmu_actuator_params.py from the installed reference.

The CMU position-actuator gain/forcerange/damping tables are tuned data
(reference cmu_humanoid.py:53-180).  Run:
  python -m dm_control_tpu.locomotion.walkers._cmu_actuators_gen
"""

import os


def main():
    from dm_control.locomotion.walkers import cmu_humanoid as ref

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "cmu_actuator_params.py")
    lines = [
        '"""CMU humanoid position-actuator parameter tables (data).',
        "",
        "Transcribed from the reference (dm_control/locomotion/walkers/",
        "cmu_humanoid.py:53-180) by _cmu_actuators_gen.py: per-joint kp,",
        "forcerange, and (v2020) damping for the scaled position",
        'actuators, plus the canonical CMU mocap joint order."""',
        "",
    ]
    lines.append("# (name, forcerange, kp) per joint")
    lines.append("POSITION_ACTUATORS = (")
    for p in ref._POSITION_ACTUATORS:
        lines.append(f"    ({p.name!r}, {tuple(p.forcerange)!r}, "
                     f"{float(p.kp)!r}),")
    lines.append(")")
    lines.append("")
    lines.append("# (name, forcerange, kp, damping) per joint")
    lines.append("POSITION_ACTUATORS_V2020 = (")
    for p in ref._POSITION_ACTUATORS_V2020:
        lines.append(f"    ({p.name!r}, {tuple(p.forcerange)!r}, "
                     f"{float(p.kp)!r}, {float(p.damping)!r}),")
    lines.append(")")
    lines.append("")
    lines.append("CMU_MOCAP_JOINTS = (")
    for name in ref._CMU_MOCAP_JOINTS:
        lines.append(f"    {name!r},")
    lines.append(")")
    lines.append("")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(ref._POSITION_ACTUATORS)} + "
          f"{len(ref._POSITION_ACTUATORS_V2020)} actuators, "
          f"{len(ref._CMU_MOCAP_JOINTS)} joints")


if __name__ == "__main__":
    main()
