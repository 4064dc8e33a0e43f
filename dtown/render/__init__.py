"""On-device rendering package (replaces reference layer 4/5, SURVEY §2.13)."""
from dtown.render.raster import render_frame, camera_rays  # noqa: F401
