from .pipeline import MapperConfig, make_map_step

__all__ = ["MapperConfig", "make_map_step"]
