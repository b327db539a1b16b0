"""utils: host-side I/O and support code (PLY, config, metrics reporting)."""
from .plyio import PlyData, read_ply, write_ply
