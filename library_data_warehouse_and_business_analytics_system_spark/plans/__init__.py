from .registry import QUERIES, QuerySpec, register

# Importing the plan modules populates the registry.
from . import core_sql  # noqa: E402,F401
from . import core_sql2  # noqa: E402,F401
from . import core_sql3  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import streaming_ops  # noqa: E402,F401
from . import multimodal_ops  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "register"]
