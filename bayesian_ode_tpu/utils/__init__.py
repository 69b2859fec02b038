from . import pytree  # noqa: F401
from .compile_cache import enable_persistent_cache  # noqa: F401
