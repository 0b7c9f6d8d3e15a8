from ondine_spark.orchestration.registry import RunRegistry, RunState

__all__ = ["RunRegistry", "RunState"]
