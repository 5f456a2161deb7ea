from .catalog import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
