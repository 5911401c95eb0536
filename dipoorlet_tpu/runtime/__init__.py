from .executor import Executor  # noqa: F401
