from spydrpick_tpu.engine.solver import EngineConfig, MIEngine, EdgeSet

__all__ = ["EngineConfig", "MIEngine", "EdgeSet"]
