"""ONNX export for the external-app ecosystem (MoeVoiceStudio etc.).

The reference ships diffusion/onnx_export.py + diffusion_onnx.py, which
emit four ONNX graphs from a trained Unit2Mel ('Diffusion') checkpoint:
encoder / denoise / pred / after.  This package reproduces that export
surface from OUR checkpoints:

- ``mirrors``:  torch modules mirroring our flax math in the NCW layout the
  external apps expect (torch is CPU-only in this image — export only).
- ``reverse``:  flax params -> torch state dicts (inverse of convert/).
- ``shim``:     makes torch's C++ ONNX serializer usable without the
  ``onnx`` wheel (it is only imported for an onnxscript scan we don't need).
- ``export``:   the driver emitting the reference's four graphs.
- ``reader``:   pure-python ONNX protobuf parser (no onnx wheel).
- ``runtime``:  numpy evaluator for the exported op subset.
- ``validate``: drives the four graphs through the external app's PNDM
  loop and compares against the JAX model end-to-end.
"""

from .export import export_onnx  # noqa: F401
