from .manifest import Manifest, SegmentStatus  # noqa: F401
from .table import Table  # noqa: F401
