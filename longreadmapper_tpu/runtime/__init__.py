from .reads import load_read_batches
from .accidx import build_index
from .accaln import run_mapping

__all__ = ["load_read_batches", "build_index", "run_mapping"]
