"""mjcf utility layer: export_with_assets, copier, commit_defaults,
debugging (reference export_with_assets.py, copier.py,
traversal_utils.py:81, debugging.py)."""

import os
import zipfile

import numpy as np

import dm_control_tpu.mjcf as mjcf


def _model():
    root = mjcf.Element("mujoco", {"model": "demo"})
    root.add("option", timestep="0.002")
    d = root.add("default")
    dc = d.add("default", **{"class": "thick"})
    dc.add("geom", size="0.2")
    d.add("geom", friction="0.9 0.01 0.001")
    wb = root.add("worldbody")
    b = wb.add("body", name="ball", pos="0 0 1")
    b.add("freejoint")
    b.add("geom", name="ball_geom", type="sphere", **{"class": "thick"})
    return root


def test_export_with_assets_roundtrip(tmp_path):
    root = _model()
    path = mjcf.export_with_assets(root, str(tmp_path))
    assert os.path.basename(path) == "demo.xml"
    reparsed = mjcf.from_path(path)
    assert reparsed.find("geom", "ball_geom") is not None
    # compiles standalone (the exported file is self-contained)
    m = mjcf.compile_model(reparsed)
    assert m.nq == 7


def test_export_with_assets_writes_payloads(tmp_path):
    root = _model()
    asset = root.add("asset")
    h = asset.add("hfield", name="terrain", nrow="4", ncol="4",
                  size="1 1 0.1 0.01", file="terrain.bin")
    h.payload = b"\x00" * 16
    mjcf.export_with_assets(root, str(tmp_path))
    assert (tmp_path / "terrain.bin").read_bytes() == b"\x00" * 16


def test_export_as_zip(tmp_path):
    zp = mjcf.export_with_assets_as_zip(_model(), str(tmp_path))
    with zipfile.ZipFile(zp) as zf:
        assert "demo/demo.xml" in zf.namelist()


def test_commit_defaults_resolves_class_chain():
    root = _model()
    g = root.find("geom", "ball_geom")
    mjcf.commit_defaults(g)
    assert g.get("size") == "0.2"  # from class 'thick'
    assert g.get("friction") == "0.9 0.01 0.001"  # from anonymous default


def test_copier_strips_class_dependence():
    src = _model()
    dst = mjcf.Element("mujoco")
    dwb = dst.add("worldbody")
    g = src.find("geom", "ball_geom")
    clone = mjcf.copy_element(g, dwb)
    assert clone.get("size") == "0.2"
    assert clone.get("class") is None
    assert clone.parent is dwb
    # source unchanged
    assert g.get("size") is None


def test_debugging_records_origins(tmp_path):
    from dm_control_tpu.mjcf import debugging

    debugging.enable_debug_mode(True)
    try:
        root = mjcf.Element("mujoco")
        wb = root.add("worldbody")
        assert debugging.origin_of(wb) is not None
        assert "test_mjcf_utils.py" in debugging.origin_of(wb)
        out = debugging.dump_model(root, str(tmp_path / "dump.xml"))
        text = open(out).read()
        assert "created at" in text

        # per-attribute write tracking (reference stack-trace capture)
        geom = wb.add("geom", type="sphere", size="0.1")
        geom.attrib["size"] = "0.2"
        assert debugging.attribute_origin(geom, "size") is not None
        assert "test_mjcf_utils.py" in debugging.attribute_origin(
            geom, "size")
        msg = debugging.element_debug_message(geom, "size")
        assert "created at" in msg and "last set at" in msg

        # frozen stacks attribute bulk operations to the caller
        with debugging.freeze_current_stack_trace():
            inner = wb.add("body", name="b")
        assert debugging.origin_of(inner) is not None

        # full dump: annotated XML + complete stack traces on disk
        dump_dir = debugging.dump_full_debug_info_to_disk(
            root, str(tmp_path / "full"))
        xml_text = open(f"{dump_dir}/model_annotated.xml").read()
        stacks = open(f"{dump_dir}/stack_traces.txt").read()
        assert "created at" in xml_text
        assert "element <geom>" in stacks
        assert "attribute 'size'" in stacks
        assert "test_mjcf_utils.py" in stacks
    finally:
        debugging.enable_debug_mode(False)


def test_skin_parse_roundtrip():
    """.skn binary parse/serialize vs the shipped rodent skin
    (reference mjcf/skin.py:35-100)."""
    import os

    import numpy as np

    import dm_control.locomotion.walkers as _w
    from dm_control_tpu.mjcf import skin as skn

    path = os.path.join(os.path.dirname(_w.__file__), "assets",
                        "rodent_walker_skin.skn")
    with open(path, "rb") as f:
        contents = f.read()
    skin = skn.parse(contents, body_getter=lambda name: name)
    assert len(skin.vertices) > 100 and skin.vertices.shape[1] == 3
    assert skin.faces.shape[1] == 3
    assert skin.bones and callable(skin.bones[0].body)
    assert isinstance(skin.bones[0].body(), str)
    total_w = sum(float(b.vertex_weights.sum()) for b in skin.bones)
    assert total_w > 0
    # roundtrip is byte-identical
    assert skn.serialize(skin) == contents
    # and the reference parser agrees on the structure
    from dm_control.mjcf import skin as ref_skn

    ref = ref_skn.parse(contents, body_getter=lambda name: name)
    np.testing.assert_array_equal(skin.vertices, ref.vertices)
    np.testing.assert_array_equal(skin.faces, ref.faces)
    assert len(skin.bones) == len(ref.bones)


def test_padded_room_contract():
    """Reference padded_room.py:22-81 grid semantics."""
    import numpy as np

    from dm_control_tpu.locomotion.arenas.padded_room import PaddedRoom

    room = PaddedRoom(room_size=5, num_objects=2,
                      random_state=np.random.RandomState(0))
    assert room.width == room.height == 9
    layer = room.entity_layer
    rows = layer.splitlines()
    assert all(r[0] == "*" and r[-1] == "*" for r in rows)
    assert rows[0] == "*" * 9 and rows[-1] == "*" * 9
    assert layer.count("P") == 1 and layer.count("G") == 2
    room.regenerate()
    assert room.entity_layer.count("G") == 2


# -- element-level attach (PyMJCF mjcf_model.attach / site.attach) ----------


def _arm_model():
    import dm_control_tpu.mjcf as mjcf

    root = mjcf.Element("mujoco", {"model": "arm"})
    wb = root.add("worldbody")
    base = wb.add("body", name="base", pos="0 0 0.1")
    base.add("geom", name="base_geom", type="capsule", size="0.02",
             fromto="0 0 0 0 0 0.2")
    base.add("joint", name="shoulder", type="hinge", axis="0 1 0")
    base.add("site", name="wrist", pos="0 0 0.2")
    act = root.add("actuator")
    act.add("motor", name="shoulder_motor", joint="shoulder")
    return root


def _hand_model():
    import dm_control_tpu.mjcf as mjcf

    root = mjcf.Element("mujoco", {"model": "hand"})
    wb = root.add("worldbody")
    palm = wb.add("body", name="palm")
    palm.add("geom", name="palm_geom", type="sphere", size="0.03")
    palm.add("joint", name="knuckle", type="hinge", axis="1 0 0")
    act = root.add("actuator")
    act.add("motor", name="knuckle_motor", joint="knuckle")
    return root


def test_element_attach_at_site_prefixes_and_compiles():
    import dm_control_tpu.mjcf as mjcf

    arm = _arm_model()
    wrist = arm.first("worldbody").first("body").find("site", "wrist")
    frame = wrist.attach(_hand_model())
    # frame carries the site pose and the prefixed subtree
    assert frame.get("pos") == "0 0 0.2"
    assert arm.find("body", "hand/palm") is not None
    assert arm.find("geom", "hand/palm_geom") is not None
    # actuator merged at top level with rewritten joint reference
    motors = [e for e in arm.iter() if e.tag == "motor"]
    assert {m.get("name") for m in motors} == {
        "shoulder_motor", "hand/knuckle_motor"}
    assert arm.find("motor", "hand/knuckle_motor").get("joint") == \
        "hand/knuckle"
    m = mjcf.compile_model(arm)
    assert m.nu == 2 and m.njnt == 2


def test_element_attach_root_and_collision_rejection():
    arm = _arm_model()
    arm.attach(_hand_model())  # under worldbody, prefix 'hand/'
    assert arm.find("body", "hand/palm") is not None
    try:
        arm.attach(_hand_model())  # same prefix -> name collision
    except ValueError as e:
        assert "duplicate names" in str(e)
    else:
        raise AssertionError("expected a namescope collision error")


def test_attachment_frame_detach_restores_compilable_model():
    import dm_control_tpu.mjcf as mjcf

    arm = _arm_model()
    frame = arm.attach(_hand_model(), prefix="h1/")
    assert arm.find("body", "h1/palm") is not None
    frame.detach()
    assert arm.find("body", "h1/palm") is None
    # the merged namescoped actuator must be swept too, and the model
    # must compile again (a dangling joint reference would fail)
    assert arm.find("motor", "h1/knuckle_motor") is None
    m = mjcf.compile_model(arm)
    assert m.nu == 1 and m.njnt == 1


def test_site_attach_honors_euler_orientation():
    import dm_control_tpu.mjcf as mjcf

    arm = _arm_model()
    base = arm.first("worldbody").first("body")
    tilted = base.add("site", name="tilted", pos="0 0.1 0", euler="0 0 90")
    frame = tilted.attach(_hand_model())
    assert frame.get("pos") == "0 0.1 0"
    # attach canonicalizes the tree to radians (mjcf/units.py), so the
    # degree-authored euler carries over converted, same orientation
    import numpy as np
    euler = [float(x) for x in str(frame.get("euler")).split()]
    np.testing.assert_allclose(euler, [0, 0, np.pi / 2], atol=1e-12)
    m = mjcf.compile_model(arm)
    assert m.nu == 2
