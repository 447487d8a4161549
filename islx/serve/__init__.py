"""Production serving: dynamic micro-batching + HTTP endpoint."""
from islx.serve.batcher import MicroBatcher, PoseResult  # noqa: F401
from islx.serve.http import PoseServer  # noqa: F401
