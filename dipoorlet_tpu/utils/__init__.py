from .logging import logger, setup_logger  # noqa: F401
from .dispatch import dispatch_functool  # noqa: F401
