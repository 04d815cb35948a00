from .detector import VoxelNet  # noqa: F401
from .pillars import PointPillars  # noqa: F401
