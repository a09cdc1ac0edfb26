from .system import System, SystemConfig  # noqa: F401
from .map_store import MapStore  # noqa: F401
