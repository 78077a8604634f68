"""Regenerates cmu_subsets.py from the installed reference package.

The CMU clip ids are opaque database keys ('CMU_139_16'); the named
subsets are curated data, not logic (reference cmu_subsets.py:22-1289).
Run:  python -m dm_control_tpu.locomotion.tasks.reference_pose._cmu_subsets_gen
"""

import os


def main():
    from dm_control.locomotion.tasks.reference_pose import cmu_subsets

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "cmu_subsets.py")
    lines = [
        '"""Curated CMU mocap clip-id subsets (data).',
        "",
        "Transcribed from the reference registry (dm_control/locomotion/",
        "tasks/reference_pose/cmu_subsets.py:22-1289) by _cmu_subsets_gen.py",
        "so walk_tiny/get_up/locomotion_small/... name the EXACT reference",
        'clip sets; ids follow the real CMU database "CMU_###_##" scheme.',
        '"""',
        "",
        "from dm_control_tpu.locomotion.mocap.types import ClipCollection",
        "",
    ]
    for name, coll in cmu_subsets.CMU_SUBSETS_DICT.items():
        lines.append(f"{name.upper()} = ClipCollection(ids=(")
        for cid in coll.ids:
            lines.append(f"    {cid!r},")
        lines.append("))")
        lines.append("")
    lines.append("CMU_SUBSETS_DICT = dict(")
    for name in cmu_subsets.CMU_SUBSETS_DICT:
        lines.append(f"    {name}={name.upper()},")
    lines.append(")")
    lines.append("")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: "
          + ", ".join(f"{k}={len(v.ids)}"
                      for k, v in cmu_subsets.CMU_SUBSETS_DICT.items()))


if __name__ == "__main__":
    main()
