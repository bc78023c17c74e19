from .registry import QUERIES, ORACLES  # noqa: F401
