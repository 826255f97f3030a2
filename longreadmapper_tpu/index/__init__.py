from .sa import sa_build
from .fmi import FMIndex
from .lchash import lc_build_host, lc_build_device
from .device import DeviceIndex, IndexMeta, build_device_index

__all__ = [
    "sa_build", "FMIndex",
    "lc_build_host", "lc_build_device",
    "DeviceIndex", "IndexMeta", "build_device_index",
]
