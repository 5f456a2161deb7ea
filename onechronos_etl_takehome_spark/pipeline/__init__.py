from .etl import ReconciliationPipeline, default_config

__all__ = ["ReconciliationPipeline", "default_config"]
