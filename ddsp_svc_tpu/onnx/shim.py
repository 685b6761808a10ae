"""torch.onnx export without the ``onnx`` wheel.

The legacy TorchScript exporter serializes the ModelProto in C++; the only
place it imports the python ``onnx`` package on the default path is
``onnx_proto_utils._add_onnxscript_fn``, which re-parses the serialized
bytes to collect onnxscript custom functions.  Our graphs contain none
(standard opset ops only), so when the wheel is absent we patch that scan
to the identity for the duration of the export call.
"""
from __future__ import annotations

import contextlib
import importlib.util


def _onnx_wheel_available() -> bool:
    return importlib.util.find_spec("onnx") is not None


@contextlib.contextmanager
def onnx_export_context():
    """Context manager under which torch.onnx.export(dynamo=False) works
    with or without the ``onnx`` python package installed."""
    if _onnx_wheel_available():
        yield
        return
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: (
        model_bytes
    )
    try:
        yield
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def torch_onnx_export(module, args, path, **kwargs):
    """torch.onnx.export via the TorchScript exporter, wheel-optional."""
    import warnings

    import torch

    with onnx_export_context(), warnings.catch_warnings():
        warnings.simplefilter("ignore")
        torch.onnx.export(module, args, path, dynamo=False, **kwargs)
