from .registry import Model, ModelRegistry, RunResult

__all__ = ["Model", "ModelRegistry", "RunResult"]
