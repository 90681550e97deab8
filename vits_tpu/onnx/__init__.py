"""ONNX interchange export (dependency-free writer + jaxpr converter +
numpy evaluator). See export_model.export_onnx."""

from .export_model import export_onnx, export_p1, export_p2  # noqa: F401
