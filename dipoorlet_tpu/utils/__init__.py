from .logging import logger, setup_logger  # noqa: F401
from .dispatch import Registry  # noqa: F401
