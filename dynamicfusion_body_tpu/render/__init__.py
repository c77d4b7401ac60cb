from . import glmath
from .raster import render_depth, render_id
