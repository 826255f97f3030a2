from .fastx import read_fastx, FastxRecord
from .ui40 import write_sa5, read_sa5
from .catmeta import create_meta, load_mta, MtaEntry
from .mfi import write_mfi, read_mfi, MfiData
from .lch import write_lch, read_lch
from .sam import sam_header, sam_record, cigar_string

__all__ = [
    "read_fastx", "FastxRecord",
    "write_sa5", "read_sa5",
    "create_meta", "load_mta", "MtaEntry",
    "write_mfi", "read_mfi", "MfiData",
    "write_lch", "read_lch",
    "sam_header", "sam_record", "cigar_string",
]
