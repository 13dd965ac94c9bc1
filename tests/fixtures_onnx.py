"""Test shim: the ONNX encoder lives in ``birda_tpu.onnx.encode``.

Kept as a module so existing tests importing ``fixtures_onnx`` keep working.
"""

from birda_tpu.onnx.encode import *  # noqa: F401,F403
from birda_tpu.onnx.encode import (  # noqa: F401
    _field,
    _float,
    _int,
    _msg,
    _str,
    _varint,
)
