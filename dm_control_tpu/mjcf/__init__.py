"""MJCF object model and ahead-of-time model compiler.

Replaces the reference's PyMJCF (dm_control/mjcf/) + MuJoCo's native XML
compiler with:

- ``element``: a typed MJCF element tree (DOM) that can be parsed from XML
  or built programmatically (models-as-code);
- ``parser``: XML string/file → element tree, with <include> resolution;
- ``compiler``: element tree → ``physics.Model`` pytree (host-side numpy),
  the TPU-native analogue of mj_loadXML + mj_compile.
"""

from dm_control_tpu.mjcf.element import Element  # noqa: F401
from dm_control_tpu.mjcf.parser import from_path, from_xml_string  # noqa: F401
from dm_control_tpu.mjcf.compiler import compile_model  # noqa: F401
from dm_control_tpu.mjcf.copier import copy_element  # noqa: F401
from dm_control_tpu.mjcf.export_with_assets import (  # noqa: F401
    export_with_assets, export_with_assets_as_zip,
)
from dm_control_tpu.mjcf.physics import Binding, bind  # noqa: F401
from dm_control_tpu.mjcf.schema import (  # noqa: F401
    MJCFSchemaError, validate,
)
from dm_control_tpu.mjcf.traversal_utils import commit_defaults  # noqa: F401


def compile_xml_string(xml: str, assets=None, dtype=None):
    """Convenience: XML string → compiled Model."""
    root = from_xml_string(xml, assets=assets)
    return compile_model(root, dtype=dtype)
