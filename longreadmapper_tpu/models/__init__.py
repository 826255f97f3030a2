from .mapper import TPUMapper, MapRecord

__all__ = ["TPUMapper", "MapRecord"]
