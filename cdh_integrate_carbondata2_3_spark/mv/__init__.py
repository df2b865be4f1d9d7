from .manager import AggSpec, MVManager, QuerySpec  # noqa: F401
