from mg_ic_code_tpu.grid.boxes import Box
from mg_ic_code_tpu.grid.geometry import BCSpec, HierarchyGeom

__all__ = ["Box", "BCSpec", "HierarchyGeom"]
