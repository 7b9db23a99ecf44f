from .builder import BuildError, GnnModel, build

__all__ = ["BuildError", "GnnModel", "build"]
