"""MJCF schema validation (reference mjcf/schema.py + attribute.py
semantics: typos fail at construction, keywords are checked)."""

import importlib
import pkgutil

import pytest

import dm_control_tpu.mjcf as mjcf
from dm_control_tpu.mjcf import schema
from dm_control_tpu.mjcf.schema import MJCFSchemaError


def test_all_suite_models_validate():
    from dm_control_tpu.suite import _modelgen
    import dm_control_tpu.suite.models as sm
    import dm_control_tpu.locomotion.models as lm

    for pkg in (sm, lm):
        for mod in pkgutil.iter_modules(pkg.__path__):
            m = importlib.import_module(f"{pkg.__name__}.{mod.name}")
            if hasattr(m, "MODEL"):
                errors = schema.validate(_modelgen.to_element(m.MODEL))
                assert not errors, (mod.name, errors[:3])


def test_entity_trees_validate():
    from dm_control_tpu.manipulation.reach import Reach
    from dm_control_tpu.locomotion.walkers.rodent import Rat

    assert not schema.validate(Reach(use_site=True).root_entity.mjcf_model)
    assert not schema.validate(Rat().mjcf_model)


def test_typo_attribute_rejected_with_suggestion():
    root = mjcf.Element("mujoco")
    wb = root.add("worldbody")
    wb.add("geom", type="sphere", sixe="0.1")  # typo: sixe
    errors = schema.validate(root)
    assert errors and "sixe" in errors[0] and "size" in errors[0]
    with pytest.raises(MJCFSchemaError):
        mjcf.compile_model(root)


def test_typo_tag_rejected():
    root = mjcf.Element("mujoco")
    wb = root.add("worldbody")
    wb.add("boyd", pos="0 0 1")  # typo: boyd
    errors = schema.validate(root)
    assert errors and "boyd" in errors[0]


def test_bad_keyword_rejected():
    # typed attribute values fail EAGERLY at construction (reference
    # attribute.py semantics), with the element path in the message
    import pytest

    from dm_control_tpu.mjcf.attribute import MJCFAttributeError

    root = mjcf.Element("mujoco")
    with pytest.raises(MJCFAttributeError, match="RK5"):
        root.add("option", integrator="RK5")


def test_bad_value_rejected_at_assignment():
    import pytest

    from dm_control_tpu.mjcf.attribute import MJCFAttributeError

    root = mjcf.Element("mujoco")
    body = root.add("worldbody").add("body", name="b")
    with pytest.raises(MJCFAttributeError, match=r"body\[b\]@pos"):
        body.attrib["pos"] = "1 2"  # needs 3 components
    with pytest.raises(MJCFAttributeError, match="not a number"):
        body.add("joint", damping="soft")
    with pytest.raises(MJCFAttributeError, match="expected 1 value"):
        body.add("geom", type="sphere", size="0.1", mass="1 2 3")


def test_misplaced_child_rejected():
    root = mjcf.Element("mujoco")
    root.add("worldbody").add("motor", joint="j")
    errors = schema.validate(root)
    assert errors and "motor" in errors[0]


def test_validate_false_bypasses():
    root = mjcf.Element("mujoco")
    root.add("option", timestep="0.002")
    wb = root.add("worldbody")
    b = wb.add("body", pos="0 0 1", madeup="1")
    b.add("freejoint")
    b.add("geom", type="sphere", size="0.1")
    with pytest.raises(MJCFSchemaError):
        mjcf.compile_model(root)
    m = mjcf.compile_model(root, validate=False)
    assert m.nq == 7
