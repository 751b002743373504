from .registry import REGISTRY, QueryDef, register

__all__ = ["REGISTRY", "QueryDef", "register"]
